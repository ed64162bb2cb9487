package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Agg
import graft.sources.Tables

/** Round-2 operator coverage: band/range joins, time-series gap filling,
  * the full analytic-window function suite, unpivot/melt, ordered string
  * aggregation, string parsing, FILTER-style conditional aggregation,
  * GROUPING SETS, date/array function breadth, and CSV/JSON source-sink
  * round trips.
  *
  * Same contract as [[RelationalQueries]]: every query deterministic
  * (canonical ORDER BY on a unique key, fixed literals, [[Agg]] decimal
  * aggregation for any double that reaches output) with a DuckDB oracle.
  */
object RelationalQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Account-balance bands for q36 — the classic tiny-dimension range join.
    * Kept as data (not a CASE expression) because the operator under test is
    * the non-equi join itself.
    */
  private val bands = Seq((0, -1000.0, 0.0), (1, 0.0, 2500.0),
    (2, 2500.0, 5000.0), (3, 5000.0, 10000.0))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Band (range) join: non-equi theta join against a bounded-small ranges
    // dimension. Scale shape: the ranges side is broadcast, so the fact side
    // streams through a BroadcastNestedLoopJoin with zero shuffle; never
    // range-join two fact tables without bucketing first.
    "q36_band_join" -> ((s, dir) => {
      import s.implicits._
      val ranges = bands.toDF("bucket_id", "lo", "hi")
      t(s, dir, "customer")
        .join(broadcast(ranges),
          col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
        .groupBy(col("bucket_id"))
        .agg(count(lit(1)).as("n_customers"),
          Agg.roundAt(Agg.decAvg(col("c_acctbal")), 2).as("avg_bal"))
        .orderBy(col("bucket_id"))
    }),

    // Time-series gap fill: month spine (sequence + explode) cross-joined
    // with the key dimension, left join actuals, zero-fill. The spine is
    // bounded (keys x months), so the cross join is broadcast-cheap even at
    // 100 TB of facts; the facts see exactly one aggregation shuffle.
    "q37_gap_fill" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          trunc(col("o_orderdate").cast("date"), "month").as("mon"),
          col("o_totalprice"))
      val months = o.agg(min(col("mon")).as("lo"), max(col("mon")).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("mon"))
      val spine = t(s, dir, "nation").select(col("n_nationkey").as("nk"))
        .crossJoin(broadcast(months))
      val agg = o.groupBy(col("nk"), col("mon"))
        .agg(count(lit(1)).as("n_orders"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("sum_price"))
      spine.join(agg, Seq("nk", "mon"), "left")
        .select(col("nk"), col("mon"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
        .orderBy(col("nk"), col("mon"))
    }),

    // Analytic window suite: lag/lead/ntile/percent_rank/cume_dist over one
    // partitioned sort — all six functions share a single Window spec, so
    // the plan sorts each partition once (one Exchange + one Sort).
    "q38_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer").select(
          col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          lag(col("c_acctbal"), 1).over(w).as("prev_bal"),
          lead(col("c_acctbal"), 1).over(w).as("next_bal"),
          ntile(4).over(w).as("quartile"),
          Agg.roundAt(percent_rank().over(w), 6).as("pct_rank"),
          Agg.roundAt(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_custkey"))
    }),

    // Unpivot (melt): wide per-key metrics to long (key, metric, value) via
    // the Dataset.unpivot API — shuffle-free (row-local generator).
    "q39_unpivot" -> ((s, dir) => {
      val m = t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(Agg.roundAt(Agg.decAvg(col("c_acctbal")), 2).as("avg_bal"),
          count(lit(1)).cast("double").as("n_cust"),
          max(col("c_acctbal")).as("max_bal"))
      m.unpivot(Array(col("c_nationkey")),
          Array(col("avg_bal"), col("n_cust"), col("max_bal")),
          "metric", "value")
        .orderBy(col("c_nationkey"), col("metric"))
    }),

    // Ordered string aggregation (listagg): deterministic via sort-then-
    // concat (collect_list order is partition-dependent; array_sort fixes
    // it). Bounded output per group — safe as long as groups are bounded.
    "q40_string_agg" -> ((s, dir) =>
      t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names_csv"),
          concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments_csv"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))),

    // String parsing breadth: regexp group extraction, casing, padding,
    // substring/right, length — all codegen'd built-ins (no UDFs).
    "q41_string_parse" -> ((s, dir) =>
      t(s, dir, "customer").select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("bigint").as("cust_num"),
          lower(col("c_mktsegment")).as("seg_lower"),
          lpad(col("c_nationkey").cast("string"), 3, "0").as("nk_padded"),
          expr("right(c_name, 4)").as("name_tail"),
          substring(col("c_name"), 1, 8).as("name_head"),
          length(col("c_name")).as("name_len"))
        .orderBy(col("c_custkey"))),

    // Conditional aggregation (SQL FILTER clause form): count/sum over
    // predicated subsets in ONE aggregation pass — the scale-correct
    // alternative to N filtered self-joins.
    "q42_conditional_agg" -> ((s, dir) => {
      val f = col("o_orderstatus") === "F"
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(f, lit(1))).as("n_f"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("n_o"),
          Agg.roundAt(Agg.decSum(when(f, col("o_totalprice"))), 2).as("f_revenue"),
          Agg.roundAt(count(when(f, lit(1))).cast("double") / count(lit(1)), 4).as("f_share"))
        .orderBy(col("c_nationkey"))
    }),

    // GROUPING SETS with grouping() flags — the general form of q21's
    // rollup / q29's cube, through the engine's SQL surface.
    "q43_grouping_sets" -> ((s, dir) => {
      Tables.createTempViews(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
      """)
    }),

    // Date/time function breadth over one pass (all codegen'd; dialect
    // mappings pinned against DuckDB: dayofweek off-by-one, interval month
    // clamping, ISO weeks).
    "q44_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
        .select(col("o_orderkey"), col("od"),
          trunc(col("od"), "month").as("month_start"),
          quarter(col("od")).as("qtr"),
          dayofweek(col("od")).as("dow"),
          last_day(col("od")).as("month_end"),
          add_months(col("od"), 3).as("plus3m"),
          weekofyear(col("od")).as("iso_week"))
        .orderBy(col("o_orderkey"))),

    // Array function breadth: collect_set/sort/contains/element_at and a
    // left-fold (higher-order `aggregate`) — all per-group local after one
    // aggregation shuffle.
    "q45_array_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_returnflag"))).as("flags"),
          array_sort(collect_set(col("l_suppkey"))).as("supps"))
        .select(col("l_orderkey"),
          size(col("flags")).as("n_flags"),
          concat_ws("", col("flags")).as("flags_str"),
          array_contains(col("flags"), "R").as("has_return"),
          size(col("supps")).as("n_suppliers"),
          element_at(col("supps"), 1).as("min_supp"),
          element_at(col("supps"), -1).as("max_supp"),
          aggregate(col("supps"), lit(0L), (a, x) => a + x).as("supp_sum"))
        .orderBy(col("l_orderkey"))),

    // CSV sink + source round trip (integer/string/date columns only — CSV
    // is not a lossless double format). Proves the engine's delimited-text
    // surface end-to-end; the oracle reads the ORIGINAL parquet, so any
    // round-trip loss fails the hash.
    "q46_csv_roundtrip" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"csv_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"), col("l_returnflag"),
          col("l_shipdate").cast("date").as("ship"))
        // the fixture is one parquet file -> one scan partition; spread the
        // text encode+write across the cluster (downstream re-aggregates,
        // so file layout never affects the result)
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("l_orderkey BIGINT, l_linenumber INT, qty BIGINT, l_returnflag STRING, ship DATE")
        .option("header", "true").csv(tmp)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
          min(col("ship")).as("first_ship"), max(col("ship")).as("last_ship"))
        .orderBy(col("l_returnflag"))
    }),

    // JSON-lines sink + source round trip (doubles survive: Spark writes
    // shortest-round-trip representations). Same oracle-reads-parquet trick.
    "q47_json_roundtrip" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"json_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("date").as("od"))
        // same single-scan-partition spread as q46
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").json(tmp)
      s.read.schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, od DATE")
        .json(tmp)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("revenue"),
          min(col("od")).as("first_order"), max(col("od")).as("last_order"))
        .orderBy(col("o_orderstatus"))
    }),

    // ORC sink + source round trip — the remaining mainstream Spark-native
    // columnar format (q46/q47 prove CSV/JSON; parquet is every other
    // query's scan path and q56's sink). Oracle reads the ORIGINAL parquet,
    // so any round-trip loss fails the hash.
    "q57_orc_roundtrip" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"orc_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("p_size")).as("sum_size"),
          Agg.roundAt(Agg.decSum(col("p_retailprice")), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // Schema evolution — the lakehouse reality every long-lived table hits:
    // an early batch written WITHOUT a column, a later batch WITH it, one
    // mergeSchema read over both. Old rows surface the added column as
    // null; per-group counts and null-skipping sums prove the merge didn't
    // drop or fabricate values. (At scale mergeSchema footer-merging costs
    // a driver-side listing pass; production tables pin the schema in a
    // catalog — this exercises the raw-path semantics.)
    "q58_schema_evolution" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"evo_${graft.sources.Scratch.dirTag(dir)}")
      val part = t(s, dir, "part")
      part.filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey"), col("p_brand"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("append").parquet(tmp)
      part.filter(col("p_partkey") % 2 === 1)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("append").parquet(tmp)
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("p_retailprice")).as("n_priced"),
          Agg.roundAt(Agg.decSum(col("p_retailprice")), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // The reference's ACTUAL sink semantics end-to-end: append-mode writes to
    // a warehouse table (App.scala:265-270 `mode("append")` into
    // summary_zip_code). The flagship is appended TWICE into a fresh
    // directory, read back, and aggregated — the oracle doubles the flagship
    // oracle, so a sink that overwrote, dropped, or duplicated-beyond-append
    // rows fails the hash. (q46/q47 prove CSV/JSON; this is the parquet
    // append path used by writeSummary.)
    "q56_append_sink_roundtrip" -> ((s, dir) => {
      // sink dir via Scratch (clean slate each run; shared storage on a
      // cluster). persist() so the 6-table flagship pipeline runs ONCE:
      // the first append materializes the ~500-row summary, the second
      // reads it from cache instead of re-running the joins.
      val sink = graft.sources.Scratch.fresh(s, s"append_${graft.sources.Scratch.dirTag(dir)}")
      val summary = graft.pipeline.LocationSummary.build(s, dir).persist()
      try {
        graft.pipeline.LocationSummary.writeSummary(summary, sink)
        graft.pipeline.LocationSummary.writeSummary(summary, sink)
      } finally summary.unpersist()
      s.read.parquet(sink)
        .groupBy(col("STATE"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("ZIP_CODE")).as("n_zips"),
          Agg.roundAt(Agg.decSum(col("RECOMMENDED_ANNUAL_SALARY")), 2).as("total_rec_salary"),
          Agg.roundAt(Agg.decSum(col("AVERAGE_ANNUAL_SALARY")), 2).as("total_avg_salary"))
        .orderBy(col("STATE"))
    })
  )

  private val decSumPrice =
    "CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q36_band_join" -> s"""
      WITH ranges(bucket_id, lo, hi) AS (VALUES
        ${bands.map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")})
      SELECT bucket_id, count(*) AS n_customers,
             floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(c_acctbal)) * 100 + 0.5) / 100 AS avg_bal
      FROM customer JOIN ranges ON c_acctbal >= lo AND c_acctbal < hi
      GROUP BY 1 ORDER BY 1""",

    "q37_gap_fill" -> """
      WITH o AS (
        SELECT c_nationkey AS nk, date_trunc('month', CAST(o_orderdate AS DATE)) AS mon, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
      ),
      b AS (SELECT min(mon) AS lo, max(mon) AS hi FROM o),
      months AS (
        SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS mon
        FROM b
      ),
      spine AS (SELECT n_nationkey AS nk, mon FROM nation CROSS JOIN months),
      agg AS (
        SELECT nk, mon, count(*) AS n_orders,
               floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price
        FROM o GROUP BY 1, 2
      )
      SELECT spine.nk, spine.mon,
             coalesce(agg.n_orders, 0) AS n_orders,
             coalesce(agg.sum_price, 0.0) AS sum_price
      FROM spine LEFT JOIN agg ON spine.nk = agg.nk AND spine.mon = agg.mon
      ORDER BY 1, 2""",

    "q38_window_suite" -> """
      SELECT c_custkey, c_nationkey, c_acctbal,
             lag(c_acctbal, 1) OVER w AS prev_bal,
             lead(c_acctbal, 1) OVER w AS next_bal,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pct_rank,
             floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
      ORDER BY c_custkey""",

    "q39_unpivot" -> """
      WITH m AS (
        SELECT c_nationkey,
               floor((CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(c_acctbal)) * 100 + 0.5) / 100 AS avg_bal,
               CAST(count(*) AS DOUBLE) AS n_cust,
               max(c_acctbal) AS max_bal
        FROM customer GROUP BY 1
      )
      SELECT c_nationkey, 'avg_bal' AS metric, avg_bal AS value FROM m
      UNION ALL SELECT c_nationkey, 'max_bal', max_bal FROM m
      UNION ALL SELECT c_nationkey, 'n_cust', n_cust FROM m
      ORDER BY c_nationkey, metric""",

    "q40_string_agg" -> """
      SELECT c_nationkey,
             string_agg(c_name, ',' ORDER BY c_name) AS names_csv,
             string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments_csv,
             count(*) AS n_customers
      FROM customer GROUP BY 1 ORDER BY 1""",

    "q41_string_parse" -> """
      SELECT c_custkey,
             CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
             lower(c_mktsegment) AS seg_lower,
             lpad(CAST(c_nationkey AS VARCHAR), 3, '0') AS nk_padded,
             right(c_name, 4) AS name_tail,
             substring(c_name, 1, 8) AS name_head,
             CAST(length(c_name) AS INTEGER) AS name_len
      FROM customer ORDER BY c_custkey""",

    "q42_conditional_agg" -> s"""
      SELECT c_nationkey, count(*) AS n_orders,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)) * 100 + 0.5) / 100 AS f_revenue,
             floor((CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS f_share
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""",

    "q43_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
             CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q44_date_funcs" -> """
      WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
      SELECT o_orderkey, od,
             CAST(date_trunc('month', od) AS DATE) AS month_start,
             CAST(quarter(od) AS INTEGER) AS qtr,
             CAST(dayofweek(od) + 1 AS INTEGER) AS dow,
             last_day(od) AS month_end,
             CAST(od + INTERVAL 3 MONTH AS DATE) AS plus3m,
             CAST(weekofyear(od) AS INTEGER) AS iso_week
      FROM o ORDER BY o_orderkey""",

    "q45_array_funcs" -> """
      WITH g AS (
        SELECT l_orderkey,
               list_sort(list_distinct(list(l_returnflag))) AS flags,
               list_sort(list_distinct(list(l_suppkey))) AS supps
        FROM lineitem GROUP BY 1
      )
      SELECT l_orderkey,
             CAST(len(flags) AS INTEGER) AS n_flags,
             array_to_string(flags, '') AS flags_str,
             list_contains(flags, 'R') AS has_return,
             CAST(len(supps) AS INTEGER) AS n_suppliers,
             supps[1] AS min_supp,
             supps[-1] AS max_supp,
             list_reduce(list_prepend(CAST(0 AS BIGINT), supps), (a, x) -> a + x) AS supp_sum
      FROM g ORDER BY l_orderkey""",

    // oracle reads the ORIGINAL parquet: round-trip loss = hash mismatch
    "q46_csv_roundtrip" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             min(CAST(l_shipdate AS DATE)) AS first_ship,
             max(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q47_json_roundtrip" -> s"""
      SELECT o_orderstatus, count(*) AS n,
             floor(($decSumPrice) * 100 + 0.5) / 100 AS revenue,
             min(CAST(o_orderdate AS DATE)) AS first_order,
             max(CAST(o_orderdate AS DATE)) AS last_order
      FROM orders GROUP BY 1 ORDER BY 1""",

    // Old-batch rows (even keys) have no price column; the merged view
    // surfaces them as NULL -> count skips them, sum is null-safe.
    "q58_schema_evolution" -> """
      WITH merged AS (
        SELECT p_brand, NULL AS p_retailprice FROM part WHERE p_partkey % 2 = 0
        UNION ALL
        SELECT p_brand, p_retailprice FROM part WHERE p_partkey % 2 = 1
      )
      SELECT p_brand, count(*) AS n_rows,
             count(p_retailprice) AS n_priced,
             floor((CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_price
      FROM merged GROUP BY 1 ORDER BY 1""",

    "q57_orc_roundtrip" -> """
      SELECT p_brand, count(*) AS n,
             CAST(sum(p_size) AS BIGINT) AS sum_size,
             floor((CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS sum_price
      FROM part GROUP BY 1 ORDER BY 1""",

    // Two appends == the flagship result twice: replay the flagship oracle
    // and duplicate each row before aggregating.
    "q56_append_sink_roundtrip" -> s"""
      WITH doubled AS (
        SELECT f.* FROM (${FlagshipOracle.sql}) f CROSS JOIN range(0, 2) t(i)
      )
      SELECT "STATE", count(*) AS n_rows,
             count(DISTINCT "ZIP_CODE") AS n_zips,
             floor((CAST(sum(CAST("RECOMMENDED_ANNUAL_SALARY" AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS total_rec_salary,
             floor((CAST(sum(CAST("AVERAGE_ANNUAL_SALARY" AS DECIMAL(30,6))) AS DOUBLE)) * 100 + 0.5) / 100 AS total_avg_salary
      FROM doubled GROUP BY 1 ORDER BY 1"""
  )
}
