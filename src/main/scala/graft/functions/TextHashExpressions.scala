package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing expressions for the dedup pipeline.
  *
  * The portable column-composition forms in [[graft.operators.TextOps]]
  * (`transform`/`aggregate` lambdas) are semantically definitive — and
  * mirrored by the DuckDB oracles — but Spark's higher-order functions are
  * interpreted per element: hashing every character of every shingle of
  * every document through boxed lambdas dominated the bench (16s for LSH
  * candidates at sf0.1). These expressions compute the same values in one
  * compiled JVM loop per document; equality with the portable forms is
  * asserted in TextHashSpec, so the oracles stay valid unchanged.
  *
  * At 100 TB the difference compounds: these run at JVM-loop speed inside
  * the scan stage, keep no per-element allocations, and stay embarrassingly
  * partition-parallel.
  */
object TextHash {

  val P: Long = 1000000007L

  /** Polynomial char hash — same fold as [[graft.operators.TextOps.charHash]]. */
  def hashChars(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Spark-semantics normalization: `trim` strips SPACE (0x20) only (Java
    * String.trim would also strip tabs/newlines and diverge from the
    * portable form and the oracle), and lowercasing is locale-independent
    * (default-locale toLowerCase would hash differently on e.g. tr-TR).
    */
  private def normalize(text: String): String = {
    var from = 0
    var until = text.length
    while (from < until && text.charAt(from) == ' ') from += 1
    while (until > from && text.charAt(until - 1) == ' ') until -= 1
    text.substring(from, until).toLowerCase(java.util.Locale.ROOT)
  }

  /** tokens(lower(trim(text))) -> n-shingles -> charHash each -> distinct,
    * preserving first occurrence order (array_distinct semantics).
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val norm = normalize(text)
    val toks = norm.split("\\s+", -1)
    if (toks.length < n) return Array.emptyLongArray
    val seen = mutable.LinkedHashSet.empty[Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val sh = sb.toString
      seen += hashChars(sh, 0, sh.length)
      i += 1
    }
    seen.toArray
  }

  /** All LSH band hashes in one pass — same affine permutations and band
    * combining as [[graft.operators.TextOps.bandHash]]. Empty feature set
    * -> null (the portable form's array_min over empty is null, which the
    * band combine propagates; returning anything else would make every
    * short document a mutual LSH candidate).
    */
  def minhashBands(features: Array[Long], bands: Int, rows: Int): Array[Long] = {
    if (features.isEmpty) return null
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) {
        val j = b * rows + r
        val a = 2L * j + 1
        val bb = 7919L * j + 13
        var mn = Long.MaxValue
        var i = 0
        while (i < features.length) {
          val h = (features(i) * a + bb) % P
          if (h < mn) mn = h
          i += 1
        }
        acc = if (r == 0) mn else (acc * 31 + mn) % P
        r += 1
      }
      out(b) = acc
      b += 1
    }
    out
  }

  /** Distinct character-n-gram hashes of the normalized text (first
    * occurrence order) — the char-level feature set for n-gram Jaccard
    * dedup, robust to tokenization differences (word shingles miss e.g.
    * concatenation edits). Codepoint-aware so the Java loop, the portable
    * split("")-based form, and DuckDB's substr all see the same windows.
    */
  def charNgramHashes(text: String, n: Int): Array[Long] = {
    val norm = normalize(text)
    val cps = norm.codePoints().toArray
    if (cps.length < n) return Array.emptyLongArray
    val seen = mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i <= cps.length - n) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = (acc * 31 + cps(i + j)) % P
        j += 1
      }
      seen += acc
      i += 1
    }
    seen.toArray
  }

  /** 32-bit SimHash of a feature-hash set — same per-bit majority vote as
    * [[graft.operators.TextOps.simhash32]]: bit b of the result is set when
    * more features have bit b set than clear. The portable form walks 32
    * interpreted lambda folds over the feature array (~64 boxed evals per
    * feature); this is one compiled two-level loop. Feature hashes are
    * nonnegative (mod P), so `(h >> b) & 1` equals the portable
    * `floor(h / 2^b) % 2` exactly. Empty feature set -> 0, like the
    * portable empty-fold.
    */
  def simhash32(features: Array[Long]): Long = {
    var acc = 0L
    var b = 0
    while (b < 32) {
      var vote = 0L
      var i = 0
      while (i < features.length) {
        if (((features(i) >> b) & 1L) == 1L) vote += 1 else vote -= 1
        i += 1
      }
      if (vote > 0) acc += (1L << b)
      b += 1
    }
    acc
  }

  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  def simhash32(features: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(features)))

  def charNgramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramHashes(ColumnBridge.expression(text), n))

  def minhashBands(features: Column, bands: Int, rows: Int): Column =
    ColumnBridge.column(
      MinhashBands(ColumnBridge.expression(features), bands, rows))
}

/** text -> array<long> of distinct n-gram shingle hashes (compiled). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.shingleHashes(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text -> array<long> of distinct char-n-gram hashes (compiled). */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHash.charNgramHashes(input.asInstanceOf[UTF8String].toString, n))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> feature hashes -> 32-bit simhash fingerprint (compiled). */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash32(input.asInstanceOf[ArrayData].toLongArray())

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> features -> array<long> of `bands` LSH band hashes (compiled). */
case class MinhashBands(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullable: Boolean = true // empty feature set -> null bands

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    val bs = TextHash.minhashBands(arr, bands, rows)
    if (bs == null) null else new GenericArrayData(bs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
