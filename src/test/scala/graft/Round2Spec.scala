package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the round-2 operators (q36–q47, d08, t06, e06, m02).
  * The DuckDB oracle is the primary gate; these pin plan shapes and the
  * semantic invariants the oracle can't express (e.g. "the spine has no
  * gaps", "round trips are deterministic").
  */
class Round2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q36 band join broadcasts the ranges side (no shuffle of the fact)") {
    val plan = run("q36_band_join").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q37 gap fill: spine is complete and zero-filled months exist") {
    val rows = run("q37_gap_fill").collect()
    val byNation = rows.groupBy(_.getInt(0))
    assert(byNation.size == 25)
    val monthsPerNation = byNation.values.map(_.length).toSet
    assert(monthsPerNation.size == 1) // every nation has the full spine
    // consecutive months, no gaps
    val months = rows.filter(_.getInt(0) == 0).map(_.getDate(1).toLocalDate).sorted
    months.sliding(2).foreach { w =>
      assert(w(1) == w(0).plusMonths(1), s"gap between ${w(0)} and ${w(1)}")
    }
    assert(rows.exists(_.getLong(2) == 0L)) // zero-filled rows present
  }

  test("q38 window suite: percent_rank endpoints and ntile coverage") {
    val rows = run("q38_window_suite").collect()
    val byNation = rows.groupBy(_.getInt(1))
    byNation.values.foreach { g =>
      val prs = g.map(_.getDouble(6))
      assert(prs.min == 0.0)
      if (g.length > 1) assert(prs.max == 1.0)
      val quartiles = g.map(_.getInt(5)).toSet
      assert(quartiles.subsetOf(Set(1, 2, 3, 4)))
    }
  }

  test("q39 unpivot emits exactly 3 metric rows per key") {
    val rows = run("q39_unpivot").collect()
    assert(rows.length == 25 * 3)
    assert(rows.map(_.getString(1)).toSet == Set("avg_bal", "n_cust", "max_bal"))
  }

  test("q45 array funcs: element_at(-1) is the max supplier") {
    val bad = run("q45_array_funcs")
      .filter(col("max_supp") < col("min_supp")).count()
    assert(bad == 0)
  }

  test("q46/q47 round trips are deterministic across runs") {
    val a = run("q46_csv_roundtrip").collect().toSeq
    val b = run("q46_csv_roundtrip").collect().toSeq
    assert(a == b)
    val c = run("q47_json_roundtrip").collect().toSeq
    val d = run("q47_json_roundtrip").collect().toSeq
    assert(c == d)
  }

  test("m02 frame sample: frame geometry is consistent") {
    val rows = run("m02_frame_sample").collect()
    rows.foreach { r =>
      val (idx, n, chars) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(idx % 3 == 0 && idx < n)
      assert(chars > 0 && chars <= 64)
      if (idx < n - 1) assert(chars == 64) // only the tail frame may be short
    }
  }

  test("e06 retention: offset-0 user count equals cohort size") {
    val rows = run("e06_retention_cohorts").collect()
    val cohortSizes = rows.filter(_.getInt(1) == 0)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    // every cohort present at offset 0, and no offset row exceeds it
    rows.foreach { r =>
      val size0 = cohortSizes(r.getDate(0).toString)
      assert(r.getLong(2) <= size0)
    }
    assert(rows.forall(_.getInt(1) >= 0))
  }

  test("d08 keeps exactly one doc per cluster") {
    val rows = run("d08_cluster_keep_best").collect()
    val kept = rows.filter(_.getBoolean(3)).map(_.getLong(1))
    assert(kept.length == kept.distinct.length) // one keeper per cluster
    assert(kept.toSet == rows.map(_.getLong(1)).toSet) // every cluster has one
  }

  test("t06 corpus stats cover every document exactly once") {
    val total = run("t06_corpus_stats").agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == 500)
  }
}
