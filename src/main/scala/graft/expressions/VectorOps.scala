package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop vector math over `array<float>` / `array<double>` embedding
  * columns, replacing the `aggregate(zip_with(...))` higher-order-function
  * formulations: HOFs are CodegenFallback and evaluate their lambdas per
  * element with boxing, which makes a 64-dim dot product ~100x slower than
  * one JVM loop per row (same trap as the text-signature expressions —
  * see [[TextSignatures]]).
  *
  * Numeric contract: accumulation is double, strictly left-to-right — the
  * exact fold order of the HOF versions — so switching implementations
  * changes NOTHING in query results (the similarity queries' oracle hashes
  * stay identical).
  */
object VectorOps {

  /** Element accessor that works for both float and double arrays. */
  @inline def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** sum_i a(i)*b(i), double accumulation, left-to-right. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private lazy val lf = VectorOps.isFloatArray(left.dataType)
  private lazy val rf = VectorOps.isFloatArray(right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += VectorOps.get(a, lf, i) * VectorOps.get(b, rf, i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))); 0.0 when either norm is 0
  * — one pass over both arrays, formula identical to the HOF version.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private lazy val lf = VectorOps.isFloatArray(left.dataType)
  private lazy val rf = VectorOps.isFloatArray(right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = VectorOps.get(a, lf, i); val y = VectorOps.get(b, rf, i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val d = math.sqrt(daa) * math.sqrt(dbb)
    if (d == 0.0) 0.0 else dab / d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** sqrt(sum_i (a(i)-b(i))^2), double accumulation, left-to-right. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private lazy val lf = VectorOps.isFloatArray(left.dataType)
  private lazy val rf = VectorOps.isFloatArray(right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = VectorOps.get(a, lf, i) - VectorOps.get(b, rf, i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2"
}

/** Symmetric int8 scalar quantization of an embedding vector: one pass
  * finds max|x|, a second maps each element to floor(x * 127/max|x| + 0.5).
  * floor(x+0.5) (not rint) so any engine reproduces the values exactly;
  * the all-zero vector quantizes to zeros. 4x storage reduction for a
  * 100 TB embedding corpus; max quantization error 0.5/127 of the range.
  */
case class QuantizeI8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // array<tinyint>, not array<int>: int8 elements are the POINT — at corpus
  // scale the 4x storage/shuffle reduction only exists if the stored type is
  // actually one byte ([-127, 127] always fits)
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  private lazy val cf = VectorOps.isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) { val a = math.abs(VectorOps.get(v, cf, i)); if (a > ma) ma = a; i += 1 }
    val out = new Array[Byte](n)
    if (ma > 0.0) {
      val scale = 127.0 / ma
      i = 0
      while (i < n) {
        out(i) = math.floor(VectorOps.get(v, cf, i) * scale + 0.5).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): QuantizeI8 = copy(child = c)
  override def prettyName: String = "quantize_i8"
}

/** The `nprobe` nearest IVF centroids of a vector, as an array of cell ids
  * sorted by (L2 distance, cell id) ascending — ONE expression node holding
  * the centroid matrix as a plain field (the [[LshBucket]] pattern). The
  * k=8 original formulation built k `struct(l2, id)` literal branches under
  * `least`/`array_sort`, which is a per-row k-wide expression tree: fine at
  * k=8, but an IVF at corpus scale wants k ~ 10^4..10^5 cells, where that
  * tree blows up analysis, codegen and plan size. Here the plan carries one
  * node regardless of k; the matrix ships to executors inside the
  * (torrent-broadcast) task binary, and each row pays one O(k*dim) JVM
  * loop — the same arithmetic FAISS's IVF coarse quantizer does.
  *
  * Numeric contract: per-centroid distance is sqrt of a left-to-right
  * double sum over min(|v|,|c|) elements — bit-identical to
  * `L2Distance(v, typedlit(c))` — and ties keep the lowest cell id, the
  * order `least(struct(d, id))`/`array_sort` imposed. Results are therefore
  * unchanged vs the literal-tree formulation at any k.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  require(nprobe > 0, "nprobe must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val cf = VectorOps.isFloatArray(child.dataType)
  /** Spark's total order for doubles (the one array_sort/least use): NaN is
    * greater than +Infinity and equal to itself. A plain `<` would make a
    * NaN distance un-insertable AND un-displaceable, leaving default-0 cell
    * ids in the result — this keeps NaN-distance centroids sorting last with
    * their real ids, exactly as the array_sort formulation did.
    */
  @inline private def lt(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) < 0

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = math.min(nprobe, centroids.length)
    // top-m selection by insertion over the filled prefix: centroids are
    // visited in cell-id order, so a strict compare keeps the lowest id on
    // distance ties (incumbents at the same distance always have a lower id)
    val bestD = new Array[Double](m)
    val bestC = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = VectorOps.get(v, cf, i) - cen(i); acc += d * d; i += 1 }
      val dist = math.sqrt(acc)
      if (filled < m) {
        var j = filled
        while (j > 0 && lt(dist, bestD(j - 1))) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = dist; bestC(j) = c
        filled += 1
      } else if (lt(dist, bestD(m - 1))) {
        var j = m - 1
        while (j > 0 && lt(dist, bestD(j - 1))) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = dist; bestC(j) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestC)
  }
  override protected def withNewChildInternal(c: Expression): NearestCells = copy(child = c)
  override def prettyName: String = "ivf_nearest_cells"
  // never render the matrix into plan strings
  override def toString: String =
    s"ivf_nearest_cells($child, k=${centroids.length}, nprobe=$nprobe)"
}

/** Sign-LSH bucket id over literal hyperplanes: bit i = (v . plane_i) > 0,
  * packed into a long. ALL planes in one pass over the vector — the HOF
  * version evaluated numPlanes separate array folds per row.
  */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  require(planes.length <= 64,
    s"LshBucket packs plane signs into one long; ${planes.length} planes > 64 " +
      "would silently wrap (1L << 64 == 1L << 0) and collide unrelated buckets")
  override def dataType: DataType = LongType
  private lazy val cf = VectorOps.isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += VectorOps.get(v, cf, i) * plane(i); i += 1 }
      if (acc > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** Product-quantization encoder: L2-normalizes the vector ONCE, then for
  * each of the `m` codebooks (one per contiguous subvector) emits the id of
  * the nearest centroid (squared L2, lowest-id tie-break — the exact
  * assignment rule the driver-side Lloyd training applies, so encode and
  * train can never disagree). One expression node for the whole code word:
  * norm + m argmins in a single pass, no per-subspace slice/normalize
  * churn.
  *
  * Normalization makes inner product == cosine, so ADC scores rank like
  * the exact cosine pipeline ([[PqAdcScore]]).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private lazy val cf = VectorOps.isFloatArray(child.dataType)
  private val subDim = codebooks.head.head.length
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = VectorOps.get(v, cf, i); ss += x * x; i += 1 }
    val inv = if (ss > 0.0) 1.0 / math.sqrt(ss) else 0.0
    val codes = new Array[Int](codebooks.length)
    var m = 0
    while (m < codebooks.length) {
      val base = m * subDim
      val book = codebooks(m)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val idx = base + j
          val x = (if (idx < n) VectorOps.get(v, cf, idx) * inv else 0.0) - cen(j)
          d += x * x
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
  // never render the codebooks into plan strings
  override def toString: String =
    s"pq_encode($child, m=${codebooks.length}, k=${codebooks.head.length})"
}

/** Asymmetric-distance (ADC) score: sum over subspaces of the query's
  * precomputed lookup table at the stored code — `luts` is the per-query
  * array<array<double>> of inner products between the (normalized) query
  * subvector and every codebook centroid, so one add + one array index per
  * subspace replaces a full float dot product (the 16-64x memory-bandwidth
  * win PQ serving exists for).
  */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  // SQL-registered, so arbitrary columns reach this expression: with
  // UnsafeArrayData inputs, codes.getInt on an array<bigint> (or luts
  // getDouble on array<array<float>>) would read the wrong element width
  // and return garbage scores that corrupt the ranking invisibly — the
  // exact failure the m-mismatch guard below exists to prevent. Reject
  // the TYPE at analysis time instead (AbstractDataType is private[sql],
  // so this checks directly rather than via ExpectsInputTypes — same
  // discipline as QuantileBucket).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val lutsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_score expects (ARRAY<INT> codes, ARRAY<ARRAY<DOUBLE>> luts), got (" +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(codesAny: Any, lutsAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val luts = lutsAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // subspace-count skew (codes encoded with one model, LUTs built from
    // another) must FAIL, not silently sum a prefix into a half-magnitude
    // score that corrupts the ranking invisibly
    if (m != luts.numElements()) throw new IllegalArgumentException(
      s"pq_adc_score: $m codes vs ${luts.numElements()} lookup tables — " +
        "codes table and query LUTs come from different PQ models")
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc += luts.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}
