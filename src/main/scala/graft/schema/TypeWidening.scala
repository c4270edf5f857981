package graft.schema

import org.apache.spark.sql.types._

/** Deterministic type-widening lattice for multi-source schema unification.
  *
  * Re-expresses the reference lattice (`/root/reference/src/schema.rs:129-193`,
  * truth table `schema.rs:199-213`) over Spark SQL `DataType`s:
  *
  *   - Null + T            -> T                      (schema.rs:137-142)
  *   - T + T               -> T
  *   - Bool + intN         -> intN                   (schema.rs:152-157)
  *   - Bool + float        -> float
  *   - I8 < I16 < I32 < I64 (widest wins)            (schema.rs:160-165)
  *   - intN + F32          -> F32, EXCEPT I64 + F32 -> F64 (precision;
  *     schema.rs:168-175, note at :174)
  *   - intN + F64          -> F64
  *   - F32 + F64           -> F64                    (schema.rs:178)
  *   - Date + Datetime     -> Datetime               (schema.rs:181)
  *   - anything + Utf8/Binary -> Utf8 ONLY under `stringifyConflicts`,
  *     otherwise a hard error                        (schema.rs:184-191)
  *
  * Spark's built-in union coercion differs (it rejects Bool+Int and
  * Int+String outright), so this lattice is applied explicitly via casts
  * BEFORE any union — never rely on implicit coercion.
  */
object TypeWidening {

  /** Error carrying the two un-widenable types (schema.rs:188-191). */
  final case class WidenError(left: DataType, right: DataType)
      extends Exception(
        s"Cannot unify types $left and $right (pass stringifyConflicts=true to coerce to string)")

  /** Timestamp family: the reference's Datetime is timezone-naive ms
    * (schema.rs:54) -> TimestampNTZType; accept TimestampType too since
    * Spark may surface either depending on reader config.
    */
  private def isTimestamp(t: DataType): Boolean =
    t == TimestampNTZType || t == TimestampType

  private def intRank(t: DataType): Option[Int] = t match {
    case ByteType    => Some(0)
    case ShortType   => Some(1)
    case IntegerType => Some(2)
    case LongType    => Some(3)
    case _           => None
  }

  private def isFloat(t: DataType): Boolean = t == FloatType || t == DoubleType

  private def isStringy(t: DataType): Boolean = t == StringType || t == BinaryType

  /** Widen two types per the lattice. Commutative. */
  def widen(l: DataType, r: DataType, stringifyConflicts: Boolean): Either[WidenError, DataType] = {
    def conflict: Either[WidenError, DataType] =
      if (stringifyConflicts) Right(StringType) else Left(WidenError(l, r))

    (l, r) match {
      case (a, b) if a == b                 => Right(a)
      case (NullType, t)                    => Right(t)
      case (t, NullType)                    => Right(t)
      // Bool + numeric -> numeric (schema.rs:152-157)
      case (BooleanType, t) if intRank(t).isDefined || isFloat(t) => Right(t)
      case (t, BooleanType) if intRank(t).isDefined || isFloat(t) => Right(t)
      // int widening (schema.rs:160-165)
      case (a, b) if intRank(a).isDefined && intRank(b).isDefined =>
        Right(if (intRank(a).get >= intRank(b).get) a else b)
      // int + float (schema.rs:168-175): I64+F32 -> F64 for precision
      case (a, FloatType) if intRank(a).isDefined =>
        Right(if (a == LongType) DoubleType else FloatType)
      case (FloatType, a) if intRank(a).isDefined =>
        Right(if (a == LongType) DoubleType else FloatType)
      case (a, DoubleType) if intRank(a).isDefined => Right(DoubleType)
      case (DoubleType, a) if intRank(a).isDefined => Right(DoubleType)
      // float widening (schema.rs:178)
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Right(DoubleType)
      // temporal (schema.rs:181)
      case (DateType, t) if isTimestamp(t) => Right(t)
      case (t, DateType) if isTimestamp(t) => Right(t)
      case (a, b) if isTimestamp(a) && isTimestamp(b) => Right(TimestampNTZType)
      // string/binary absorb everything only when allowed (schema.rs:184-191)
      case (a, b) if isStringy(a) || isStringy(b) =>
        if (a == BinaryType && b == BinaryType) Right(BinaryType) else conflict
      case _ => conflict
    }
  }

  /** Widen a whole list (fold; Null identity). */
  def widenAll(ts: Seq[DataType], stringifyConflicts: Boolean): Either[WidenError, DataType] =
    ts.foldLeft[Either[WidenError, DataType]](Right(NullType)) {
      case (Right(acc), t) => widen(acc, t, stringifyConflicts)
      case (err, _)        => err
    }
}
