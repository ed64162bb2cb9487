package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the round-2 additions (q48–q53, t07). The DuckDB oracle
  * is the primary gate; these pin the plan shapes (decorrelation, no
  * per-row subquery loops) and invariants the value-hash can't express.
  */
class Round3Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q48 correlated EXISTS decorrelates to semi + anti joins") {
    val plan = run("q48_correlated_exists").queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS should become a left-semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS should become a left-anti join")
    assert(!plan.toLowerCase.contains("subquery"),
      "no residual per-row subquery after decorrelation")
  }

  test("q49 correlated scalar subquery becomes one aggregate + join") {
    val qe = run("q49_correlated_scalar").queryExecution
    val plan = qe.optimizedPlan.toString
    assert(plan.contains("Aggregate"), "inner avg should be a grouped aggregate")
    assert(plan.contains("Join"), "decorrelated join back on the key")
  }

  test("q50 SCD2: intervals chain per key — each effective_to equals the next effective_from") {
    val rows = run("q50_scd2_intervals").collect()
    rows.groupBy(_.getLong(0)).values.foreach { hist =>
      val sorted = hist.sortBy(r => (r.getDate(2).toString, r.getLong(3)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(4) == b.getDate(2),
            s"interval gap: ${a.getDate(4)} != ${b.getDate(2)}")
          assert(!a.getBoolean(5), "non-last rows must not be current")
        case _ =>
      }
      assert(sorted.last.isNullAt(4) && sorted.last.getBoolean(5),
        "last interval must be open and current")
      // consecutive states actually differ (the SCD2 collapse worked)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
  }

  test("q51 incremental merge equals the one-shot aggregate exactly") {
    val incremental = run("q51_incremental_agg").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val oneShot = {
      val s = spark
      val o = graft.sources.Tables.load(s, sf, "orders")
        .join(graft.sources.Tables.load(s, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
      o.groupBy(col("c_nationkey").as("nk"))
        .agg(count(col("o_totalprice")).as("n"),
          graft.operators.Agg.roundAt(
            graft.operators.Agg.decAvg(col("o_totalprice")), 2).as("avg"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    }
    assert(incremental.toSeq == oneShot.toSeq)
  }

  test("q52 struct collect keeps at most 3 members per group, smallest keys first") {
    val rows = run("q52_struct_collect").collect()
    rows.groupBy(_.getInt(0)).values.foreach(g => assert(g.length <= 3))
    // slice(sort_array, 1, 3) == the 3 smallest custkeys per nation
    val perNation = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    val cust = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_custkey")).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(1)).sorted.take(3))
    perNation.foreach { case (nk, ks) => assert(ks.toSeq == cust(nk).toSeq) }
  }

  test("q53 merge upsert: op counts reconcile with the changeset definition") {
    val rows = run("q53_merge_upsert").collect()
    val cust = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val ops = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(ops.getOrElse("insert", 0) == cust.count(_ % 17 == 0))
    assert(ops.getOrElse("update", 0) == cust.count(_ % 10 == 0))
    assert(ops.getOrElse("keep", 0) == cust.count(k => k % 10 != 0))
    // updates actually moved the balance
    val updated = rows.filter(_.getString(3) == "update")
    assert(updated.nonEmpty)
  }

  test("t07 redaction removes every planted email and phone") {
    val rows = run("t07_pii_redaction").collect()
    rows.foreach { r =>
      assert(r.getInt(1) >= 1, "planted email must be found")
      assert(r.getInt(2) >= 1, "planted phone must be found")
      assert(!r.getString(5).contains("@example.com"))
      assert(r.getString(5).contains("<PHONE>") || r.getString(5).length < 40)
    }
  }
}
