package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting,
  * shingling and MinHash/SimHash signatures.
  *
  * Everything here is a pure, codegen-friendly column expression built from
  * Spark's higher-order array functions — no UDFs, no driver-side work, so
  * every operator scales embarrassingly with partitions.
  *
  * Determinism note: all hashes are explicit polynomial/affine arithmetic
  * (not murmur/xxhash) so an independent engine (the DuckDB oracle) can
  * reproduce them bit-for-bit. P = 1e9+7 keeps every intermediate < 2^35,
  * far inside exact long/double range.
  */
object TextOps {

  val P: Long = 1000000007L

  /** Polynomial rolling hash over a string's characters:
    * fold(acc = 0; acc = (acc*31 + ascii(ch)) mod P). Portable: DuckDB
    * spelling is list_reduce(list_prepend(0, codes), ...).
    */
  def charHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P)

  /** Second, independent polynomial hash — different base AND modulus
    * (131 mod 998244353 vs charHash's 31 mod 1e9+7), so a pair of strings
    * colliding under BOTH behaves like a single ~2^59 hash. Substring
    * dedup (t17) requires both to agree before a span counts as
    * duplicated: one 64-bit-range hash false-positives at ~n²/2^30-per-
    * bucket rates on a 100 TB corpus's ~10^13 spans, marking unique text
    * as duplicate and trimming it; the pair drives the rate to harmless.
    */
  val P2: Long = 998244353L
  def charHash2(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 131 + ascii(ch)) % P2)

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** n-token shingles joined with single spaces; empty array when the text
    * has fewer than n tokens.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle-hash set — the document's feature set for MinHash /
    * Jaccard near-dup detection.
    */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), sh => charHash(sh)))

  /** MinHash element j: min over the feature set of the affine permutation
    * h -> (a_j*h + b_j) mod P. Null/empty set -> null element.
    */
  def minhashAt(hashes: Column, j: Int): Column = {
    val a = 2 * j + 1
    val b = 7919 * j + 13
    array_min(transform(hashes, h => (h * a + b) % P))
  }

  /** LSH band hash combining `rows` consecutive MinHash elements starting at
    * `band*rows` — documents sharing any band hash are near-dup candidates.
    */
  def bandHash(hashes: Column, band: Int, rows: Int): Column =
    (0 until rows).map(r => minhashAt(hashes, band * rows + r))
      .reduce((acc, m) => (acc * 31 + m) % P)

  /** 32-bit SimHash over the feature set: per-bit majority vote of feature
    * hashes, expressed with exact double pow/floor (portable; every value
    * < 2^32 is exact in a double).
    */
  def simhash32(hashes: Column): Column =
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
      val bit = (h: Column) => floor(h / pow(lit(2.0), b)).cast("long") % 2
      val vote = aggregate(hashes, lit(0L),
        (vacc, h) => vacc + when(bit(h) === 1, 1L).otherwise(-1L))
      acc + when(vote > 0, floor(pow(lit(2.0), b)).cast("long")).otherwise(0L)
    })

  /** Distinct char-n-gram hashes (portable form; semantic twin of the
    * compiled [[graft.functions.TextHash.charNgramHashes]], asserted equal
    * in TextHashSpec). Windows are codepoint-based: Spark's length/substr
    * count characters, matching DuckDB substr and Java codePointAt.
    */
  def charNgramHashes(text: Column, n: Int): Column = {
    val t = lower(trim(text))
    when(length(t) >= n,
      array_distinct(transform(sequence(lit(1), length(t) - (n - 1)),
        i => aggregate(split(t.substr(i, lit(n)), ""), lit(0L),
          (acc, ch) => (acc * 31 + ascii(ch)) % P))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Stopword hit count against a fixed small lexicon. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => array_contains(array(words.map(lit): _*), w)))

  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop = Seq("el", "la", "de", "y", "que", "en", "los")
  val FrStop = Seq("le", "la", "les", "de", "et", "un", "une")
  val DeStop = Seq("der", "die", "das", "und", "ist", "ein", "nicht")

  /** CJK codepoint count (language-ID signal for zh). */
  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
}
