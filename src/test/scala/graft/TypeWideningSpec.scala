package graft

import graft.schema.TypeWidening
import graft.schema.TypeWidening.WidenError
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Truth table ported from the reference's lattice tests
  * (`/root/reference/src/schema.rs:199-213`) + the property tests its
  * Cargo.toml declared intent for (proptest dep) but never wrote — done
  * EXHAUSTIVELY over the full 12×12 type grid rather than sampled.
  */
class TypeWideningSpec extends AnyFunSuite {
  private def w(l: DataType, r: DataType, s: Boolean = false) = TypeWidening.widen(l, r, s)

  test("null identity (schema.rs:137-142)") {
    assert(w(NullType, LongType) == Right(LongType))
    assert(w(StringType, NullType) == Right(StringType))
    assert(w(NullType, NullType) == Right(NullType))
  }

  test("same type is identity") {
    for (t <- Seq(BooleanType, ByteType, IntegerType, LongType, FloatType, DoubleType,
        StringType, DateType, TimestampNTZType, BinaryType))
      assert(w(t, t) == Right(t))
  }

  test("bool + numeric -> numeric (schema.rs:152-157)") {
    assert(w(BooleanType, IntegerType) == Right(IntegerType))
    assert(w(LongType, BooleanType) == Right(LongType))
    assert(w(BooleanType, DoubleType) == Right(DoubleType))
    assert(w(FloatType, BooleanType) == Right(FloatType))
  }

  test("int widening chain I8<I16<I32<I64 (schema.rs:160-165)") {
    assert(w(ByteType, ShortType) == Right(ShortType))
    assert(w(ShortType, IntegerType) == Right(IntegerType))
    assert(w(IntegerType, LongType) == Right(LongType))
    assert(w(ByteType, LongType) == Right(LongType))
  }

  test("int + float; I64+F32 -> F64 precision exception (schema.rs:168-175)") {
    assert(w(IntegerType, FloatType) == Right(FloatType))
    assert(w(LongType, FloatType) == Right(DoubleType)) // the :174 note
    assert(w(LongType, DoubleType) == Right(DoubleType))
    assert(w(ShortType, DoubleType) == Right(DoubleType))
  }

  test("float widening (schema.rs:178)") {
    assert(w(FloatType, DoubleType) == Right(DoubleType))
  }

  test("date + datetime -> datetime (schema.rs:181)") {
    assert(w(DateType, TimestampNTZType) == Right(TimestampNTZType))
    assert(w(TimestampNTZType, DateType) == Right(TimestampNTZType))
  }

  test("mixed timestamp flavors widen to ntz (naive-ms policy, schema.rs:54)") {
    assert(w(TimestampType, TimestampNTZType) == Right(TimestampNTZType))
    assert(w(TimestampNTZType, TimestampType) == Right(TimestampNTZType))
    assert(w(DateType, TimestampType) == Right(TimestampType))
  }

  test("conflicts: stringify flag coerces, else hard error (schema.rs:184-191)") {
    assert(w(IntegerType, StringType, s = true) == Right(StringType))
    assert(w(StringType, DateType, s = true) == Right(StringType))
    assert(w(IntegerType, StringType).isLeft)
    assert(w(DateType, LongType).isLeft)   // cross-family, no stringify
    assert(w(BooleanType, StringType).isLeft)
    w(IntegerType, StringType) match {
      case Left(WidenError(l, r)) => assert(l == IntegerType && r == StringType)
      case other                  => fail(s"expected WidenError, got $other")
    }
  }

  test("binary + binary stays binary; binary + other follows conflict rule") {
    assert(w(BinaryType, BinaryType) == Right(BinaryType))
    assert(w(BinaryType, IntegerType, s = true) == Right(StringType))
    assert(w(BinaryType, IntegerType).isLeft)
  }

  private val allTypes: Seq[DataType] = Seq(
    NullType, BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, DateType, TimestampNTZType, BinaryType)

  test("property (exhaustive): commutative") {
    for (a <- allTypes; b <- allTypes; s <- Seq(true, false)) {
      val (ab, ba) = (TypeWidening.widen(a, b, s), TypeWidening.widen(b, a, s))
      assert(ab.toOption == ba.toOption && ab.isLeft == ba.isLeft,
        s"widen($a,$b,$s) not commutative")
    }
  }

  test("property (exhaustive): idempotent and absorbs null") {
    for (a <- allTypes) {
      assert(TypeWidening.widen(a, a, false) == Right(a))
      assert(TypeWidening.widen(NullType, a, false) == Right(a))
    }
  }

  test("property (exhaustive): widened result absorbs both inputs; stringify never errors") {
    for (a <- allTypes; b <- allTypes) {
      TypeWidening.widen(a, b, true) match {
        case Right(t) =>
          assert(TypeWidening.widen(t, a, true).isRight, s"$t cannot absorb $a")
          assert(TypeWidening.widen(t, b, true).isRight, s"$t cannot absorb $b")
        case Left(_) => fail(s"stringify mode errored on ($a,$b)")
      }
    }
  }
}
