package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the round-6 operators that the hash oracles
  * can't express directly.
  */
class Round6Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d11: at most 50 docs kept per source, and kept == rank <= cap") {
    val out = q("d11_source_cap").cache()
    val perSource = out.filter(col("kept"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).first.getLong(0)
    assert(perSource <= 50)
    val mismatch = out.filter(col("kept") =!= (col("rank_in_source") <= 50)).count()
    assert(mismatch == 0)
    out.unpersist()
  }

  test("d12: identical text always lands in the same split, and splits partition the corpus") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val withSplit = q("d12_hash_split").join(docs, "doc_id")
    // same content -> same bucket (the leak-proof property)
    val leaky = withSplit.groupBy(col("text"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(leaky == 0)
    // every doc gets exactly one split label from the expected set
    val labels = withSplit.select(col("split")).distinct().as[String].collect().toSet
    assert(labels.subsetOf(Set("train", "validation", "test")))
    assert(withSplit.count() == docs.count())
  }

  test("s08: recall is in [0,1] and equals n_hits/k; brute-force self-recall is 1") {
    val out = q("s08_recall_eval").cache()
    val bad = out.filter(col("recall_at_k") < 0 || col("recall_at_k") > 1 ||
      col("n_hits") > 5 || col("n_hits") < 0).count()
    assert(bad == 0)
    // recall_at_k must be exactly n_hits/k, not an independent computation
    val inconsistent = out.filter(
      abs(col("recall_at_k") - col("n_hits").cast("double") / 5) > 1e-6).count()
    assert(inconsistent == 0)
    out.unpersist()
    // The exact scan measured against itself recovers every neighbor: two
    // independent evaluations of the brute-force top-k joined on
    // (query_id, vec_id) must agree on all k rows for every query — the
    // self-recall-is-1 property the oracle can't see (it only checks the
    // LSH-vs-exact numbers), and a determinism pin on tie-breaking.
    val exact = q("s01_knn_brute").select(col("query_id"), col("vec_id"))
    val again = q("s01_knn_brute")
      .select(col("query_id").as("qb"), col("vec_id").as("vb"))
    val selfHits = exact.join(again,
        col("query_id") === col("qb") && col("vec_id") === col("vb"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
    val nQueries = exact.select(col("query_id")).distinct().count()
    assert(nQueries > 0)
    assert(selfHits.filter(col("n") === 5).count() == nQueries)
  }

  test("t10: per-head continuation probabilities never exceed 1 and ranks are dense from 1") {
    val out = q("t10_bigram_lm").cache()
    assert(out.filter(col("cond_p") <= 0 || col("cond_p") > 1).count() == 0)
    assert(out.filter(col("cnt") > col("w1_total")).count() == 0)
    val badRanks = out.groupBy(col("w1"))
      .agg(min(col("rank")).as("lo"), max(col("rank")).as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(badRanks == 0)
    out.unpersist()
  }

  test("d13: every pair within hamming 1 is found (banding guarantee is lossless at radius 1)") {
    import graft.operators.TextOps
    val sims = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        TextOps.simhash32(graft.functions.TextHash.shingleHashes(col("text"), 2)).as("sim"))
      .cache()
    // ground truth: all pairs with hamming <= 1 via a (tiny at this SF)
    // cross join of the 500-row fingerprint table
    val a = sims.select(col("id").as("doc_a"), col("sim").as("sa"))
    val b = sims.select(col("id").as("doc_b"), col("sim").as("sb"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 1)
      .select(col("doc_a"), col("doc_b"))
    val found = q("d13_simhash_neardup").filter(col("is_dup"))
      .select(col("doc_a"), col("doc_b"))
    assert(truth.exceptAll(found).count() == 0,
      "banding missed a pair within its guaranteed radius")
    sims.unpersist()
  }

  test("q58: merged view has old-batch rows with null price and new-batch rows priced") {
    val out = q("q58_schema_evolution")
    val row = out.agg(sum(col("n_rows")).as("n"), sum(col("n_priced")).as("p")).first
    val total = graft.sources.Tables.load(spark, dir, "part").count()
    assert(row.getLong(0) == total)
    assert(row.getLong(1) > 0 && row.getLong(1) < total)
  }
}
