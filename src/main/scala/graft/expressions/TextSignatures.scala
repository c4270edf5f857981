package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop signature expressions for the dedup family.
  *
  * The same signatures are expressible with `transform`/`aggregate`
  * higher-order functions, but HOFs are CodegenFallback and evaluate their
  * lambda per element with boxing — a 64-hash MinHash over ~500 shingles/doc
  * costs ~32M interpreted evaluations per 1000 docs (measured ~25s). These
  * expressions do the same math in one JVM loop per row (~100x faster) and
  * keep the operator usable at 100 TB. Deterministic: pure functions of the
  * input string (fixed seeds), identical on every executor/run.
  */
object Hash64 {
  /** splitmix64 finalizer — strong, cheap 64-bit mixing (public domain). */
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of a byte range: FNV-1a style polynomial + splitmix. */
  def bytes(b: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ (b(i) & 0xffL)) * 0x100000001B3L; i += 1 }
    mix(h)
  }

  /** THE whitespace contract for every oracle-checked tokenizer: exactly
    * RE2's `\s` = `[\t\n\f\r ]`, because the DuckDB oracles split on
    * `regexp_split_to_array(..., '\s+')`. Deliberately NOT
    * `Character.isWhitespace` (adds `\x0B`, `\x1C`-`\x1F`, U+2028...) and
    * NOT Java regex `\s` (adds `\x0B`) — either superset would tokenize a
    * document containing those characters differently from the oracle and
    * break the hash-match gate.
    */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Whitespace-token hashes of a UTF8 string (matches the semantics of
    * `regexp_split_to_array(trim(text), '\\s+')`: empty tokens dropped).
    */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val b = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0
    var start = -1
    while (i <= b.length) {
      val ws = i == b.length || b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
        b(i) == '\r' || b(i) == '\f'
      if (ws) {
        if (start >= 0) { out += bytes(b, start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** Hashes of the n-gram shingles over token hashes; shorter-than-n docs
    * produce one whole-doc shingle. Deduplicated and SORTED ascending —
    * the set is order-free semantically, and sorting once per document
    * lets pairwise set operations ([[JaccardSorted]]) run as linear merges
    * instead of per-pair hash-set builds.
    */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val toks = tokenHashes(s)
    val set = new java.util.HashSet[java.lang.Long]()
    if (toks.length < n) {
      var c = 0x9E3779B97F4A7C15L
      var j = 0
      while (j < toks.length) { c = mix(c ^ toks(j)); j += 1 }
      set.add(c)
    } else {
      var i = 0
      while (i + n <= toks.length) {
        var c = 0x9E3779B97F4A7C15L
        var j = i
        while (j < i + n) { c = mix(c ^ toks(j)); j += 1 }
        set.add(c)
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** array<string>: word n-gram shingles as strings (NOT deduplicated —
  * callers counting frequencies need the multiset). Same tight-loop
  * tokenizer as the hash-based signatures. Documents with fewer than n
  * tokens yield an EMPTY array (matching the ordinality-self-join
  * formulation of n-grams, which emits nothing for short docs) — unlike
  * [[Hash64.shingleHashes]], which keeps a whole-doc fallback shingle so
  * MinHash signatures never degenerate to empty.
  */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    var start = -1
    while (i <= s.length) {
      val ws = i == s.length || Hash64.isWs(s.charAt(i))
      if (ws) {
        if (start >= 0) { toks += s.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val out =
      if (toks.length < n) Array.empty[UTF8String]
      else Array.tabulate(toks.length - n + 1) { j =>
        UTF8String.fromString(toks.slice(j, j + n).mkString(" "))
      }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): ShingleStrings = copy(child = c)
  override def prettyName: String = "shingle_strings"
}

/** array<long>: deduplicated 64-bit hashes of word n-gram shingles. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Hash64.shingleHashes(input.asInstanceOf[UTF8String], n))
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** array<long> length k: MinHash signature over word n-gram shingles.
  * Family i re-mixes each shingle hash with seed_i; position i is the min.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => Hash64.mix(0x5851F42D4C957F2DL * (i + 1)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val sh = Hash64.shingleHashes(input.asInstanceOf[UTF8String], n)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val seed = seeds(i)
      var best = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val h = Hash64.mix(sh(j) ^ seed)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** double: exact Jaccard similarity |A∩B| / |A∪B| of two SORTED distinct
  * long arrays (the [[ShingleHashes]] contract) via a single linear merge —
  * no per-pair hash sets, no materialized intersection/union arrays. The
  * `array_intersect`/`array_union` formulation builds two scratch sets and
  * an output array per candidate pair; this is the same math at merge-join
  * cost, which matters because the verify stage runs once per candidate
  * pair (quadratic-ish volume), not once per document.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSorted =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sorted"
}

/** Engine-portable md5-derived hashing: the one hash family BOTH Spark and
  * DuckDB can compute bit-for-bit, which is what lets the minhash/simhash
  * query surface carry a real DuckDB oracle instead of a rows-only check.
  *
  *   x(g)   = unsigned(first 8 md5 digest bytes, little-endian) mod P
  *            (DuckDB: `md5_number_upper(g) % 2147483647`)
  *   h_i(x) = (a_i * x + b_i) mod P        with P = 2^31 - 1 and
  *   a_i    = 1 + (2654435761 * (i+1)) mod (P-1)
  *   b_i    = (2246822519 * (i+1)) mod P
  *
  * Every product stays under 2^62, so the arithmetic is exact in 64-bit
  * integers on both engines — no wrap-around semantics to disagree on.
  * (xxhash64/splitmix64 are faster but DuckDB cannot evaluate them, and a
  * 64-bit multiplicative mix would overflow DuckDB's checked BIGINT.)
  */
object PortableHash {
  val P = 2147483647L // Mersenne prime 2^31 - 1

  def a(i: Int): Long = 1L + ((2654435761L * (i + 1)) % (P - 1))
  def b(i: Int): Long = (2246822519L * (i + 1)) % P

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 digest bytes, little-endian — the exact value of DuckDB's
    * `md5_number_upper(s)` (as a signed Long carrying the unsigned bits).
    */
  def md5Upper(s: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var x = 0L
    var i = 7
    while (i >= 0) { x = (x << 8) | (d(i) & 0xffL); i -= 1 }
    x
  }

  /** Shingle/token base hash in [0, P). */
  def baseHash(s: String): Long = java.lang.Long.remainderUnsigned(md5Upper(s), P)

  /** Whitespace tokens of a string (empty tokens dropped) — the string-level
    * twin of [[Hash64.tokenHashes]], matching `regexp_split_to_array(trim(t),
    * '\\s+')` + length filter on the DuckDB side.
    */
  def tokenize(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    var start = -1
    while (i <= s.length) {
      val ws = i == s.length || Hash64.isWs(s.charAt(i))
      if (ws) {
        if (start >= 0) { out += s.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    out.toArray
  }

  /** Distinct word n-gram shingle strings; shorter-than-n docs produce the
    * whole-doc join (possibly "" for an empty doc) — same contract as
    * [[Hash64.shingleHashes]] and the d05 oracle's CASE.
    */
  def shingleStrings(s: String, n: Int): Array[String] = {
    val toks = tokenize(s)
    val set = new java.util.LinkedHashSet[String]()
    if (toks.length < n) set.add(toks.mkString(" "))
    else {
      var i = 0
      while (i + n <= toks.length) {
        val sb = new java.lang.StringBuilder()
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        set.add(sb.toString)
        i += 1
      }
    }
    set.toArray(new Array[String](set.size))
  }
}

/** array<long> length k: MinHash signature over word n-gram shingles using
  * the [[PortableHash]] md5 family — bit-identical to the DuckDB
  * formulation, so queries built on it hash-match a DuckDB oracle.
  * Same tight-loop shape as [[MinHashSig]] (md5 once per shingle, cheap
  * modular permutations per family).
  */
case class MinHashSigMd5(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  import PortableHash.P
  private lazy val as: Array[Long] = Array.tabulate(k)(PortableHash.a)
  private lazy val bs: Array[Long] = Array.tabulate(k)(PortableHash.b)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val shingles = PortableHash.shingleStrings(input.asInstanceOf[UTF8String].toString, n)
    val xs = new Array[Long](shingles.length)
    var j = 0
    while (j < shingles.length) { xs(j) = PortableHash.baseHash(shingles(j)); j += 1 }
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i); val b = bs(i)
      var best = Long.MaxValue
      var jj = 0
      while (jj < xs.length) {
        val h = (a * xs(jj) + b) % P
        if (h < best) best = h
        jj += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigMd5 = copy(child = c)
  override def prettyName: String = "minhash_sig_md5"
}

/** long: 60-bit SimHash over distinct whitespace tokens using the
  * [[PortableHash]] md5 token hash — per-bit votes over bits 0..59 of
  * `md5_number_upper(token)`, sign -> bit. 60 bits (not 64) keeps the
  * signature positive in a signed BIGINT so Spark and DuckDB agree without
  * unsigned-integer gymnastics; the pigeonhole banding math only needs
  * bands | bits.
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val toks = PortableHash.tokenize(input.asInstanceOf[UTF8String].toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = PortableHash.md5Upper(toks(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
  // must match the SQL registration name (GraftExtensions) so a name
  // copied out of a plan or error message resolves when called back
  override def prettyName: String = "simhash60"
}

/** long: 64-bit SimHash over distinct whitespace tokens (per-bit votes of
  * each token hash, sign -> bit).
  */
case class SimHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val toks = Hash64.tokenHashes(input.asInstanceOf[UTF8String])
    val seen = new java.util.HashSet[java.lang.Long]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = toks(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  override def prettyName: String = "simhash64"
}
