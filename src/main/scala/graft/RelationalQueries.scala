package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Agg, Enrich, JoinOps, Score, Snapshot, SummaryOps}
import graft.sources.Tables

/** One registered query per operator row of SURVEY.md §2 (Q1-Q13, D1-D14),
  * plus the relational capabilities the reference lacks (§2.4) re-expressed
  * as first-class operators: top-k per group, distinct aggregation,
  * semi/anti joins, set ops, rollup, pivot, running windows.
  *
  * Conventions (FIXTURES.md determinism): fixed as-of date instead of
  * wall-clock; canonical ORDER BY on a unique key; `Agg.roundAt(_, 2)` on every
  * floating aggregate so last-ulp summation-order noise cannot flip the
  * driver's hash compare; aliases identical to the oracle SQL.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: surrogate-key decode join (App.scala:33-34) — fact x dim inner equi-join.
    "q01_dim_decode_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("o_orderdate")).as("order_date"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q2+Q5: latest-snapshot-per-key via groupBy-MAX + join-back (App.scala:27-48).
    "q02_latest_per_key_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_returnflag"), col("l_extendedprice"),
          year(col("l_shipdate")).as("snap_year"))
      Snapshot.latestPerKeyJoin(li, Seq("l_suppkey", "l_returnflag"), "snap_year")
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          Agg.roundAt(Agg.decAvg(col("l_extendedprice")), 2).as("avg_price"))
        .orderBy(col("l_suppkey"), col("l_returnflag"))
    }),

    // Window-form argmax (SURVEY §2 Q2 mapping): exactly one row per key.
    "q03_latest_per_key_window" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Snapshot.latestPerKeyWindow(li, Seq("l_suppkey"),
          Seq(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("last_ship_date"))
        .orderBy(col("l_suppkey"))
    }),

    // Q3: left outer join with null misses (App.scala:161-162).
    "q04_left_join_null" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val removals = t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 7)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("removed_ts"))
      o.join(removals, o("o_orderkey") === removals("l_orderkey"), "left")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"),
          to_date(col("removed_ts")).as("removed_date"))
        .orderBy(col("o_orderkey"))
    }),

    // Q4: same dimension joined twice under aliases (App.scala:157-162).
    "q05_self_alias_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val custNation = nation.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      val suppNation = nation.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
        .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
        .groupBy(col("cust_nation"), col("supp_nation"))
        .agg(count(lit(1)).as("n_items"),
          Agg.roundAt(Agg.decSum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("cust_nation"), col("supp_nation"))
    }),

    // Q6 + D3: global (ungrouped) MIN/MAX/COUNT — 1-row aggregate (App.scala:57-62, 175-179).
    "q06_global_minmax" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
        to_date(max(col("l_shipdate"))).as("max_ship_date"),
        to_date(min(col("l_shipdate"))).as("min_ship_date"),
        Agg.roundAt(min(col("l_extendedprice")), 2).as("min_price"),
        Agg.roundAt(max(col("l_extendedprice")), 2).as("max_price"),
        count(lit(1)).as("n_rows"))),

    // Q7: uncorrelated scalar subquery in WHERE, kept lazy (App.scala:70).
    "q07_scalar_subquery_filter" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("snap_year", year(col("o_orderdate")))
      Snapshot.filterLatestGlobal(o, "snap_year")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Q8: conjunctive equality predicates (App.scala:71-73).
    "q08_conjunctive_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "N" && col("l_linestatus") === "O" &&
          col("l_quantity") === 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Q9 + D1: string-equality dimension filter + USING join (App.scala:106, 171).
    "q09_dim_filter" -> ((s, dir) =>
      Tables.dimLocation(s, dir)
        .filter(col("state") === "EUROPE")
        .orderBy(col("location_id"))),

    // Q10: projection + filter pushed into the parquet scan (App.scala:100-106).
    "q10_projection_pushdown" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_size") < 20)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))),

    // D2: programmatic multi-column AVG in one hash aggregate (App.scala:212-214).
    "q11_multi_avg" -> ((s, dir) => {
      val res = SummaryOps.multiAvg(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      res.select(col("l_returnflag"), col("l_linestatus"),
          Agg.roundAt(col("avg_l_quantity"), 2).as("avg_qty"),
          Agg.roundAt(col("avg_l_extendedprice"), 2).as("avg_price"),
          Agg.roundAt(col("avg_l_discount"), 4).as("avg_disc"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // D3+D5: min-max 0-100 normalization over a grouped aggregate (App.scala:172-185).
    "q12_minmax_normalize" -> ((s, dir) => {
      val avgBal = t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(Agg.decAvg(col("s_acctbal")).as("avg_bal"))
      Score.minMaxScore(avgBal, "avg_bal", "score")
        .select(col("s_nationkey"), Agg.roundAt(col("avg_bal"), 2).as("avg_bal"),
          Agg.roundAt(col("score"), 2).as("score"))
        .orderBy(col("s_nationkey"))
    }),

    // D6+D7+D8: derived scalar/date/conditional columns (App.scala:166-169, 204-205).
    "q13_derived_columns" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val removals = t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 7)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("removed_ts"))
      o.join(removals, o("o_orderkey") === removals("l_orderkey"), "left")
        .select(
          col("o_orderkey"),
          Agg.roundAt(col("o_totalprice") / 1000 * 40 * 52, 2).as("annualized"),
          (lit(1950) + col("o_orderkey") % 70).as("year_built"),
          (year(lit(Enrich.DefaultAsOf)) - (lit(1950) + col("o_orderkey") % 70))
            .as("age_in_years"),
          Enrich.daysOnMarket(to_date(col("o_orderdate")), to_date(col("removed_ts")))
            .as("days_on_market"))
        .orderBy(col("o_orderkey"))
    }),

    // D11+D12: ratio of aggregates + rounding (App.scala:233-236, 254-261).
    "q14_ratio_round" -> ((s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(Agg.roundAt(Agg.decAvg(col("p_retailprice")), 2).as("avg_price"),
          Agg.roundAt(Agg.decAvg(col("p_retailprice")) / Agg.decAvg(col("p_size")), 2).as("price_per_size"))
        .orderBy(col("p_brand"))),

    // D10+D14: case-insensitive resolution into a renamed reporting projection
    // (App.scala:239-253) — selects via UPPERCASE names against lowercase attrs.
    "q15_report_projection" -> ((s, dir) =>
      t(s, dir, "nation")
        .select(col("N_NATIONKEY").as("NATION_KEY"), col("N_NAME").as("NATION_NAME"))
        .orderBy(col("NATION_KEY"))),

    // ---- beyond-reference relational operators (SURVEY §2.4) ----

    // Top-k per group: window rank with total-order tiebreak.
    "q16_topk_per_group" -> ((s, dir) => {
      val o = t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_nationkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_nationkey"), col("rk"))
    }),

    // Distinct aggregation.
    "q17_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // Semi + anti joins: customers with / without orders.
    "q18_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),
    "q19_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // Set operations: union / intersect / except on key sets.
    "q20_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
      val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_nationkey"))
      val union = building.union(machinery).distinct().withColumn("op", lit("union"))
      val intersect = building.intersect(machinery).withColumn("op", lit("intersect"))
      val except = building.except(machinery).withColumn("op", lit("except"))
      union.union(intersect).union(except)
        .orderBy(col("op"), col("c_nationkey"))
    }),

    // Grouping sets / rollup with explicit null-safe ordering.
    "q21_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), Agg.roundAt(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // Pivot with explicit value list (stable output schema).
    "q22_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(Agg.roundAt(sum(col("l_quantity")), 2))
        .orderBy(col("l_linestatus"))),

    // Running/cumulative window over an explicit ROWS frame and total order.
    "q23_running_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend",
          Agg.roundAt(sum(col("o_totalprice").cast("decimal(30,6)")).over(w).cast("double"), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Sort + limit (top-k global): deterministic via unique tiebreak.
    "q24_order_limit" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Sampling made deterministic: arithmetic hash-mod predicate, not rand().
    "q25_deterministic_sample" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Skew-salted join: same result as the plain join (the oracle IS the
    // plain join), but hot keys spread over 8 reducer sub-keys.
    "q26_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
      val sup = t(s, dir, "supplier").withColumnRenamed("s_suppkey", "suppkey")
      JoinOps.saltedJoin(li, sup, Seq("suppkey"),
          saltFrom = col("l_orderkey") * 8 + col("l_linenumber"), factor = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          Agg.roundAt(Agg.decSum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("s_nationkey"))
    }),

    // As-of join (union + ordered-window form) vs DuckDB's native ASOF JOIN:
    // for each purchase, the latest view by the same user at or before it.
    "q27_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = Snapshot.latestPerKeyWindow(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("view_event_id"),
            col("value").as("view_value")),
        Seq("user_id", "ts"), Seq(col("view_event_id").desc))
      JoinOps.asofJoin(purchases, views, Seq("user_id"), "ts",
          Seq("view_event_id", "view_value"))
        .select(col("event_id"), col("user_id"), col("view_event_id"), col("view_value"))
        .orderBy(col("event_id"))
    }),

    // Exact interpolated percentiles (distribution stats for data QA).
    // Spark's percentile == DuckDB's quantile_cont bit-for-bit on the same
    // doubles (both sort + linearly interpolate).
    "q28_percentiles" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"),
          expr("percentile(l_extendedprice, 0.99)").as("p99"))
        .orderBy(col("l_returnflag"))),

    // CUBE grouping sets (rollup's big sibling).
    "q29_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // String-function surface (absent from the reference, SURVEY §2.4).
    "q30_string_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("upper_name"),
          substring(col("p_brand"), 7, 2).as("brand_num"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"),
          regexp_replace(col("p_type"), "\\s+", "_").as("type_slug"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))),

    // Exact profile twin of the sketch query: every column is DuckDB-
    // expressible, so the driver hash-gates it. The sketch variant (HLL++
    // distinct, approximate quantiles) lives in [[sketchProfile]] — sketch
    // implementations differ across engines by design, so its error bounds
    // vs these exact values are pinned in SketchSpec instead of the oracle.
    "q31_profile_exact" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          expr("percentile(l_partkey, 0.5)").as("p50_partkey"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // Data-profiling audit: per-column null/distinct counts (the first
    // thing any 100 TB ingestion pipeline runs). Integer-only output.
    "q32_data_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      // ONE scan: a single aggregate computes nulls+distinct for every
      // column (multi-distinct plans via Expand), then a 1-row explode
      // unpivots — profiling a 100 TB fact must not read it once per column
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"dist_$c"))) :+ count(lit(1)).as("n_rows")
      val one = o.agg(aggs.head, aggs.tail: _*)
      val entries = array(cols.map(c => struct(
        lit(c).as("column"), col("n_rows"),
        col(s"nulls_$c").as("n_nulls"), col(s"dist_$c").as("n_distinct"))): _*)
      one.select(explode(entries).as("r"))
        .select(col("r.column"), col("r.n_rows"), col("r.n_nulls"), col("r.n_distinct"))
        .orderBy(col("column"))
    }),

    // Deterministic z-score standardization (exact-decimal mean/stddev;
    // built-in stddev is summation-order dependent and not reproducible).
    "q33_zscore" -> ((s, dir) => {
      val avgBal = t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(Agg.decAvg(col("s_acctbal")).as("avg_bal"))
      graft.operators.Stats.zScore(avgBal, "avg_bal", "z")
        .select(col("s_nationkey"), Agg.roundAt(col("avg_bal"), 2).as("avg_bal"),
          Agg.roundAt(col("z"), 4).as("z"))
        .orderBy(col("s_nationkey"))
    }),

    // Fixed-width histogram (integer-exact buckets).
    "q34_histogram" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(graft.operators.Stats.bucket(col("o_totalprice"), 25000.0).as("bucket"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("bucket"))),

    // Deterministic Pearson correlation per group from exact decimal sums.
    "q35_correlation" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(Agg.roundAt(
          graft.operators.Stats.decCorr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag")))
  )

  /** Sketch sibling of q31_profile_exact: HLL++ distinct and approximate
    * quantiles over the same grouping. Deliberately NOT in [[all]] — sketch
    * internals are engine-specific, so a DuckDB hash oracle is impossible by
    * design; instead SketchSpec pins its error bounds against the exact twin
    * (|approx_parts - n_parts|/n_parts < 5%, |approx_p50 - exact p50|/p50 < 2%).
    * At 100 TB these are the only affordable forms of the profile: HLL++ is a
    * fixed-size mergeable sketch (one map-side partial per partition, no
    * distinct shuffle of the full key set) and approx_percentile is a bounded
    * GK summary, vs the exact twin's Expand + full sort per group.
    */
  def sketchProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_p50"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val oracles: Map[String, String] = Map(
    "q01_dim_decode_join" -> """
      SELECT l_orderkey, l_linenumber, CAST(o_orderdate AS DATE) AS order_date,
             l_extendedprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber""",

    "q02_latest_per_key_join" -> """
      WITH li AS (
        SELECT l_suppkey, l_returnflag, l_extendedprice,
               year(l_shipdate) AS snap_year
        FROM lineitem
      ),
      latest AS (
        SELECT l_suppkey, l_returnflag, max(snap_year) AS mx
        FROM li GROUP BY 1, 2
      )
      SELECT li.l_suppkey, li.l_returnflag, count(*) AS n_rows,
             floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price
      FROM li JOIN latest
        ON li.l_suppkey = latest.l_suppkey
       AND li.l_returnflag = latest.l_returnflag
       AND li.snap_year = latest.mx
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    "q03_latest_per_key_window" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_shipdate AS DATE) AS last_ship_date
      FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey
              ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
            FROM lineitem) t
      WHERE rn = 1
      ORDER BY l_suppkey""",

    "q04_left_join_null" -> """
      WITH removals AS (
        SELECT l_orderkey, max(l_shipdate) AS removed_ts
        FROM lineitem WHERE l_linenumber = 7 GROUP BY 1
      )
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             CAST(removed_ts AS DATE) AS removed_date
      FROM orders LEFT JOIN removals ON o_orderkey = l_orderkey
      ORDER BY o_orderkey""",

    "q05_self_alias_join" -> """
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             count(*) AS n_items, floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    "q06_global_minmax" -> """
      SELECT CAST(max(l_shipdate) AS DATE) AS max_ship_date,
             CAST(min(l_shipdate) AS DATE) AS min_ship_date,
             floor((min(l_extendedprice)) * 100 + 0.5) / 100 AS min_price,
             floor((max(l_extendedprice)) * 100 + 0.5) / 100 AS max_price,
             count(*) AS n_rows
      FROM lineitem""",

    "q07_scalar_subquery_filter" -> """
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE year(o_orderdate) = (SELECT max(year(o_orderdate)) FROM orders)
      ORDER BY o_orderkey""",

    "q08_conjunctive_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_returnflag = 'N' AND l_linestatus = 'O' AND l_quantity = 25
      ORDER BY l_orderkey, l_linenumber""",

    "q09_dim_filter" -> """
      SELECT n_nationkey AS location_id, n_name AS zip_code, r_name AS state,
             'C' || n_regionkey AS county
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      ORDER BY location_id""",

    "q10_projection_pushdown" -> """
      SELECT p_partkey, p_name, p_retailprice
      FROM part WHERE p_size < 20
      ORDER BY p_partkey""",

    "q11_multi_avg" -> """
      SELECT l_returnflag, l_linestatus,
             floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
             floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
             floor((CAST(sum(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / count(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc
      FROM lineitem
      GROUP BY 1, 2
      ORDER BY 1, 2""",

    "q12_minmax_normalize" -> """
      WITH avg_bal AS (
        SELECT s_nationkey, CAST(sum(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(s_acctbal) AS avg_bal
        FROM supplier GROUP BY 1
      )
      SELECT s_nationkey, floor((avg_bal) * 100 + 0.5) / 100 AS avg_bal,
             floor(((avg_bal - min(avg_bal) OVER ())
               / (max(avg_bal) OVER () - min(avg_bal) OVER ()) * 100) * 100 + 0.5) / 100 AS score
      FROM avg_bal
      ORDER BY s_nationkey""",

    "q13_derived_columns" -> """
      WITH removals AS (
        SELECT l_orderkey, max(l_shipdate) AS removed_ts
        FROM lineitem WHERE l_linenumber = 7 GROUP BY 1
      )
      SELECT o_orderkey,
             floor((o_totalprice / 1000 * 40 * 52) * 100 + 0.5) / 100 AS annualized,
             1950 + o_orderkey % 70 AS year_built,
             2002 - (1950 + o_orderkey % 70) AS age_in_years,
             CAST(CASE WHEN removed_ts IS NULL
                  THEN date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                  ELSE date_diff('day', CAST(o_orderdate AS DATE), CAST(removed_ts AS DATE))
                  END AS INTEGER) AS days_on_market
      FROM orders LEFT JOIN removals ON o_orderkey = l_orderkey
      ORDER BY o_orderkey""",

    "q14_ratio_round" -> """
      SELECT p_brand, floor((CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE) / count(p_retailprice)) * 100 + 0.5) / 100 AS avg_price,
             floor((CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE) / count(p_retailprice) / (CAST(sum(CAST(p_size AS DECIMAL(30,6))) AS DOUBLE) / count(p_size))) * 100 + 0.5) / 100 AS price_per_size
      FROM part
      GROUP BY 1
      ORDER BY 1""",

    "q15_report_projection" -> """
      SELECT n_nationkey AS "NATION_KEY", n_name AS "NATION_NAME"
      FROM nation
      ORDER BY 1""",

    "q16_topk_per_group" -> """
      SELECT c_nationkey, rk, o_orderkey, o_totalprice
      FROM (SELECT c_nationkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_nationkey
                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rk <= 3
      ORDER BY c_nationkey, rk""",

    "q17_distinct_agg" -> """
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      FROM lineitem
      GROUP BY 1
      ORDER BY 1""",

    "q18_semi_join" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q19_anti_join" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q20_set_ops" -> """
      WITH building AS (
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      ),
      machinery AS (
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      ),
      combined AS (
        SELECT c_nationkey, 'union' AS op FROM
          (SELECT c_nationkey FROM building UNION SELECT c_nationkey FROM machinery) u
        UNION ALL
        SELECT c_nationkey, 'intersect' AS op FROM
          (SELECT c_nationkey FROM building INTERSECT SELECT c_nationkey FROM machinery) i
        UNION ALL
        SELECT c_nationkey, 'except' AS op FROM
          (SELECT c_nationkey FROM building EXCEPT SELECT c_nationkey FROM machinery) e
      )
      SELECT c_nationkey, op FROM combined
      ORDER BY op, c_nationkey""",

    "q21_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q22_pivot" -> """
      SELECT l_linestatus,
             floor((sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END)) * 100 + 0.5) / 100 AS "A",
             floor((sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END)) * 100 + 0.5) / 100 AS "N",
             floor((sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END)) * 100 + 0.5) / 100 AS "R"
      FROM lineitem
      GROUP BY 1
      ORDER BY 1""",

    "q23_running_window" -> """
      SELECT o_custkey, o_orderkey,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * 100 + 0.5) / 100 AS running_spend
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    "q24_order_limit" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100""",

    "q25_deterministic_sample" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
      ORDER BY o_orderkey""",

    "q26_salted_join" -> """
      SELECT s_nationkey, count(*) AS n_items,
             floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS revenue
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1 ORDER BY 1""",

    "q27_asof_join" -> """
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        FROM events
      ),
      purchases AS (
        SELECT user_id, event_id, ts FROM ev WHERE event_type = 'purchase'
      ),
      views AS (
        SELECT user_id, ts, view_event_id, view_value
        FROM (SELECT user_id, ts, event_id AS view_event_id, value AS view_value,
                     row_number() OVER (PARTITION BY user_id, ts
                                        ORDER BY event_id DESC) AS rn
              FROM ev WHERE event_type = 'view') t
        WHERE rn = 1
      )
      SELECT p.event_id, p.user_id, v.view_event_id, v.view_value
      FROM purchases p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY p.event_id""",

    "q28_percentiles" -> """
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS p50,
             quantile_cont(l_extendedprice, 0.95) AS p95,
             quantile_cont(l_extendedprice, 0.99) AS p99
      FROM lineitem
      GROUP BY 1 ORDER BY 1""",

    "q29_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q30_string_funcs" -> """
      SELECT p_partkey,
             upper(p_name) AS upper_name,
             substr(p_brand, 7, 2) AS brand_num,
             concat_ws('/', p_brand, p_type) AS brand_type,
             lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
             regexp_replace(p_type, '\s+', '_', 'g') AS type_slug,
             CAST(length(p_name) AS INTEGER) AS name_len
      FROM part ORDER BY p_partkey""",

    "q31_profile_exact" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             quantile_cont(l_partkey, 0.5) AS p50_partkey,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q33_zscore" -> """
      WITH avg_bal AS (
        SELECT s_nationkey,
               CAST(sum(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(s_acctbal) AS avg_bal
        FROM supplier GROUP BY 1
      ),
      mm AS (
        SELECT CAST(sum(CAST(avg_bal AS DECIMAL(30,6))) AS DOUBLE) / count(avg_bal) AS m,
               CASE WHEN count(avg_bal) > 1
                    THEN sqrt(greatest((CAST(sum(CAST(avg_bal * avg_bal AS DECIMAL(30,6))) AS DOUBLE)
                           - CAST(sum(CAST(avg_bal AS DECIMAL(30,6))) AS DOUBLE) * CAST(sum(CAST(avg_bal AS DECIMAL(30,6))) AS DOUBLE) / CAST(count(avg_bal) AS DOUBLE))
                           / (CAST(count(avg_bal) AS DOUBLE) - 1), 0.0))
                    ELSE NULL END AS sd
        FROM avg_bal
      )
      SELECT s_nationkey,
             floor((avg_bal) * 100 + 0.5) / 100 AS avg_bal,
             floor((CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                         ELSE (avg_bal - m) / sd END) * 10000 + 0.5) / 10000 AS z
      FROM avg_bal CROSS JOIN mm
      ORDER BY s_nationkey""",

    "q34_histogram" -> """
      SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
             count(*) AS n_orders
      FROM orders GROUP BY 1 ORDER BY 1""",

    "q35_correlation" -> """
      WITH li AS (
        SELECT l_returnflag, l_quantity AS x, l_extendedprice AS y FROM lineitem
      ),
      agg AS (
        SELECT l_returnflag,
               CAST(count(x) AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) AS sx, CAST(sum(CAST(y AS DECIMAL(30,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x * x AS DECIMAL(30,6))) AS DOUBLE) AS sxx, CAST(sum(CAST(y * y AS DECIMAL(30,6))) AS DOUBLE) AS syy,
               CAST(sum(CAST(x * y AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
               count(*) AS n_rows
        FROM li GROUP BY 1
      )
      SELECT l_returnflag,
             floor((CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                         THEN (n * sxy - sx * sy)
                              / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                         ELSE NULL END) * 1000000 + 0.5) / 1000000 AS corr_qty_price,
             n_rows
      FROM agg ORDER BY 1""",

    "q32_data_profile" -> """
      SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_orderkey) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_custkey' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_custkey) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_orderstatus) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_totalprice' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_totalprice) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_orderdate' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_orderdate) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority' AS "column", count(*) AS n_rows,
             CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             count(DISTINCT o_orderpriority) AS n_distinct
      FROM orders
      ORDER BY "column" """
  )
}
