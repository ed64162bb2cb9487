package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Agg
import graft.sources.Tables

/** Round-2 additions: correlated subqueries (EXISTS / NOT EXISTS / scalar),
  * SCD Type-2 dimension builds, incremental partial-aggregate merges,
  * array-of-struct construction + flattening, CDC-style merge/upsert, and
  * PII redaction for training-data pipelines.
  *
  * The correlated-subquery queries are registered as PURE Spark SQL over the
  * temp-view catalog and share their literal SQL text with the DuckDB
  * oracle — the strongest parity proof available (one string, two engines,
  * one hash). Everything else follows the house determinism rules:
  * canonical ORDER BY on a unique key, [[Agg]] decimal aggregation for any
  * double that is computed (not just carried) into output, fixed literals.
  */
object RelationalQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Correlated EXISTS + NOT EXISTS — Catalyst decorrelates into a left-semi
    * and a left-anti join against the same fact (no per-row re-execution;
    * see Round3Spec's plan assertion). Shared verbatim with DuckDB.
    */
  val CorrelatedExistsSql: String = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
ORDER BY c_custkey
"""

  /** Correlated scalar aggregate subquery — decorrelated to one grouped
    * aggregate + one equi-join. The inner average uses the exact-decimal
    * form so both engines compute bit-identical doubles.
    */
  val CorrelatedScalarSql: String = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) / count(*)
  FROM orders i WHERE i.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""

  /** Recursive-CTE hierarchy rollup (Spark 4's WITH RECURSIVE — before it,
    * hierarchy walks needed driver-side DataFrame loops). A synthetic but
    * deterministic management chain over customers (parent = custkey/10,
    * roots are custkeys 1-9) is walked to the root, then descendants are
    * aggregated per root with the root's own attributes — the org-chart /
    * category-tree / BOM shape. One SQL template, two engines: the ONLY
    * divergence is the integer-division token (Spark `DIV`, DuckDB `//`).
    * The recursion is acyclic by construction (anc strictly shrinks), so
    * UNION ALL terminates; Spark's recursion-level limit (100) is far
    * above the log10 depth. Each step is one keyed join over the frontier
    * — shuffle-parallel at any scale.
    */
  def recursiveHierarchySql(idiv: String): String = s"""
WITH RECURSIVE chain(id, anc, depth) AS (
  SELECT c_custkey AS id, c_custkey AS anc, 0 AS depth FROM customer
  UNION ALL
  SELECT id, anc $idiv 10 AS anc, depth + 1 AS depth FROM chain WHERE anc >= 10
),
final AS (
  -- exactly one row per id: the first ancestor below 10 (self for roots)
  SELECT id, anc AS root_key, depth FROM chain WHERE anc < 10
),
agg AS (
  SELECT f.root_key, count(*) AS n_members, max(f.depth) AS max_depth,
         CAST(sum(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal
  FROM final f JOIN customer c ON c.c_custkey = f.id
  GROUP BY f.root_key
)
SELECT a.root_key, r.c_mktsegment AS root_segment, a.n_members,
       CAST(a.max_depth AS INTEGER) AS max_depth,
       floor(a.sum_bal * 100 + 0.5) / 100 AS sum_bal
FROM agg a JOIN customer r ON r.c_custkey = a.root_key
ORDER BY a.root_key
"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q59_recursive_hierarchy" -> ((s, dir) => {
      Tables.createTempViews(s, dir)
      // Spark's recursive-CTE safety valve defaults to 1M TOTAL rows —
      // a per-query guard, not a scale ceiling. The chain here is
      // |customer|·log10(maxkey) rows (exact, known a priori), which
      // crosses 1M at the 10× scale-up fixture; raise the valve so the
      // row bound is the DATA's, with the level limit (100 ≫ log10 depth)
      // still guarding runaway recursion. The override must NOT leak to
      // the shared session (it would disable the valve for every later
      // recursive query), and the conf is read at EXECUTION time, so the
      // query is materialized eagerly (localCheckpoint) inside the
      // save/restore window — the result is bounded (|customer|·depth
      // rows), and the checkpoint also truncates the recursion lineage.
      val key = "spark.sql.cteRecursionRowLimit"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "2000000000")
      try s.sql(recursiveHierarchySql("DIV")).localCheckpoint()
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),

    // SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): the engine's
    // domain transforms (the reference's wage->salary annualization,
    // App.scala:204-206, plus a tier classifier) declared ONCE as catalog
    // functions and reused by plain SQL — how a library ships domain logic
    // to SQL-only users. SQL UDFs are inlined into the plan at resolution
    // (no black-box row boundary, unlike Scala UDFs), so codegen and
    // pushdown still apply. The oracle inlines the same bodies textually —
    // a wrong inlining or type coercion fails the hash.
    "q60_sql_udf" -> ((s, dir) => {
      Tables.createTempViews(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_annualize(hourly DOUBLE)
               RETURNS DOUBLE RETURN hourly * 40 * 52""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(bal DOUBLE)
               RETURNS STRING RETURN
                 CASE WHEN bal < 0 THEN 'neg'
                      WHEN bal < 5000 THEN 'mid'
                      ELSE 'high' END""")
      s.sql("""
        SELECT graft_tier(c_acctbal) AS tier, count(*) AS n,
               floor(CAST(sum(CAST(graft_annualize(c_acctbal / 100) AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_annual
        FROM customer GROUP BY 1 ORDER BY 1""")
    }),

    // Correlated EXISTS / NOT EXISTS (SQL surface; text shared with the
    // oracle verbatim). Plan: two joins (semi + anti), both shuffle-free at
    // this scale via AQE broadcast; at 100 TB both degrade to hash joins
    // partitioned on the correlation key — never a per-row subquery loop.
    "q48_correlated_exists" -> ((s, dir) => {
      Tables.createTempViews(s, dir)
      s.sql(CorrelatedExistsSql)
    }),

    // Correlated scalar aggregate subquery (SQL surface, shared text).
    // Decorrelation turns "for each row, the subquery" into ONE aggregate
    // over orders + a join back on o_custkey — the fact table is scanned
    // twice but shuffled on the same key, and never row-at-a-time.
    "q49_correlated_scalar" -> ((s, dir) => {
      Tables.createTempViews(s, dir)
      s.sql(CorrelatedScalarSql)
    }),

    // SCD Type-2 dimension build from an event stream: collapse each
    // customer's order-priority history into change rows with
    // [effective_from, effective_to) validity and an is_current flag.
    // Two window passes over the SAME (custkey)-partitioned sort — one
    // Exchange + one Sort total, change detection via lag, interval close
    // via lead. Fully key-partitionable at any scale.
    "q50_scd2_intervals" -> ((s, dir) => {
      val byKey = Window.partitionBy(col("o_custkey"))
        .orderBy(col("eff_date").asc, col("o_orderkey").asc)
      val seq = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("eff_date"), col("o_orderpriority"))
        .withColumn("prev", lag(col("o_orderpriority"), 1).over(byKey))
      val changes = seq
        .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
        .select(col("o_custkey").as("custkey"),
          col("o_orderpriority").as("state"),
          col("eff_date").as("effective_from"),
          col("o_orderkey").as("change_key"))
      val byKey2 = Window.partitionBy(col("custkey"))
        .orderBy(col("effective_from").asc, col("change_key").asc)
      changes
        .withColumn("effective_to", lead(col("effective_from"), 1).over(byKey2))
        .withColumn("is_current", col("effective_to").isNull)
        .orderBy(col("custkey"), col("effective_from"), col("change_key"))
    }),

    // Incremental aggregation: daily partial states (exact decimal sum +
    // count) merged into per-nation totals. sum-of-partial-sums equals the
    // one-shot aggregate EXACTLY (decimal addition is associative), which is
    // what makes incremental view maintenance safe — the oracle IS the
    // one-shot form. At 100 TB the daily partials are the materialized
    // state; each new day merges |keys|-sized rows, not the full history.
    "q51_incremental_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val daily = o.groupBy(col("nk"), col("day"))
        .agg(Agg.decPartialSum(col("o_totalprice")).as("s"),
          count(col("o_totalprice")).as("c"))
      daily.groupBy(col("nk"))
        .agg(sum(col("s")).as("s"), sum(col("c")).as("c"))
        .select(col("nk"), col("c").as("n_orders"),
          Agg.roundAt(col("s").cast("double") / col("c"), 2).as("avg_price"))
        .orderBy(col("nk"))
    }),

    // Nested data: per-group array-of-struct construction (collect_list of
    // struct, canonicalized by sort_array so the unordered collect is
    // deterministic), slice to top-3, then inline back to flat rows. The
    // generator is row-local — the only shuffle is the groupBy.
    "q52_struct_collect" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sort_array(collect_list(
          struct(col("c_custkey"), col("c_acctbal")))).as("members"))
        .select(col("nk"), inline(slice(col("members"), 1, 3)))
        .orderBy(col("nk"), col("c_custkey"))
    }),

    // CDC-style MERGE/upsert without a table format: base FULL OUTER JOIN
    // changeset on the key, coalesce per column, op classification
    // (insert/update/keep). One shuffle on the key for each side; at scale
    // this is exactly the shuffle MERGE INTO performs under Delta/Iceberg.
    "q53_merge_upsert" -> ((s, dir) => {
      val base = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("b_name"),
          col("c_acctbal").as("b_bal"))
      val updates = t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("key"), col("c_name").as("u_name"),
          (col("c_acctbal") + 100.0).as("u_bal"))
      val inserts = t(s, dir, "customer").filter(col("c_custkey") % 17 === 0)
        .select((col("c_custkey") + 10000000L).as("key"),
          concat(col("c_name"), lit("_new")).as("u_name"),
          lit(0.0).as("u_bal"))
      base.join(updates.union(inserts), Seq("key"), "full_outer")
        .select(col("key"),
          coalesce(col("u_name"), col("b_name")).as("name"),
          coalesce(col("u_bal"), col("b_bal")).as("bal"),
          when(col("b_name").isNull, "insert")
            .when(col("u_name").isNull, "keep")
            .otherwise("update").as("op"))
        .orderBy(col("key"))
    }),

    // Data-quality constraint audit: each constraint is one scan-side
    // aggregate (or an anti-join for referential integrity), unioned into a
    // violations report. This is the batch "expectations" pattern — every
    // check is shuffle-light (counts only; the FK anti-join shuffles on the
    // key) and the report stays |constraints|-sized at any data scale.
    "q54_constraint_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      def check(name: String, df: DataFrame): DataFrame =
        df.select(lit(name).as("constraint_name"),
          col("n_violations"), col("n_checked"))
      val fk = check("lineitem_orderkey_fk",
        li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(li.agg(count(lit(1)).as("n_checked"))))
      val bal = check("customer_acctbal_range",
        c.agg(count(when(col("c_acctbal") < -1000 || col("c_acctbal") > 10000,
            lit(1))).as("n_violations"),
          count(lit(1)).as("n_checked")))
      val status = check("orders_status_domain",
        o.agg(count(when(!col("o_orderstatus").isin("F", "P", "O"), lit(1)))
            .as("n_violations"),
          count(lit(1)).as("n_checked")))
      val qty = check("lineitem_qty_positive",
        li.agg(count(when(col("l_quantity") <= 0, lit(1))).as("n_violations"),
          count(lit(1)).as("n_checked")))
      val nn = check("customer_name_nonnull",
        c.agg(count(when(col("c_name").isNull, lit(1))).as("n_violations"),
          count(lit(1)).as("n_checked")))
      fk.union(bal).union(status).union(qty).union(nn)
        .withColumn("passed", col("n_violations") === 0)
        .orderBy(col("constraint_name"))
    }),

    // Deterministic stratified sampling: per-stratum (region) rates via an
    // explicit affine hash threshold — reproducible across engines, runs
    // and partitionings (rand()-based sampling is none of those). Purely
    // row-local apart from the bounded dim join; at 100 TB the sample
    // decision runs inside the scan stage.
    "q55_stratified_sample" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      // modular form, value-identical to (key * 2654435761) % 1000003 but
      // overflow-free for 64-bit keys (Kmeans.seedCentroids has the story)
      val h = ((col("c_custkey") % 1000003L) * 427799L) % 1000003L
      val rate = when(col("n_regionkey") <= 1, 100000L).otherwise(50000L)
      c.filter(h < rate)
        .select(col("c_custkey"), col("c_nationkey"), col("n_regionkey"),
          col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // PII redaction for training corpora: plant a deterministic synthetic
    // email + phone per document, then strip both with regex and count the
    // matches. Patterns use only explicit character classes so the Java
    // (Spark) and RE2 (DuckDB) dialects agree. Row-local — zero shuffles
    // before the canonical sort.
    "t07_pii_redaction" -> ((s, dir) => {
      val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phonePat = "555-[0-9]{4}"
      val withPii = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      withPii.select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(phonePat), lit(0))).as("n_phones"),
          length(col("text")).as("raw_chars"),
          length(regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("redacted_chars"),
          substring(regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>"), -40, 40).as("redacted_tail"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q59_recursive_hierarchy" -> recursiveHierarchySql("//"),

    // the UDF bodies inlined textually
    "q60_sql_udf" -> """
      SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS tier,
             count(*) AS n,
             floor(CAST(sum(CAST((c_acctbal / 100) * 40 * 52 AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_annual
      FROM customer GROUP BY 1 ORDER BY 1""",
    "q48_correlated_exists" -> CorrelatedExistsSql,
    "q49_correlated_scalar" -> CorrelatedScalarSql,

    "q50_scd2_intervals" -> """
      WITH seq AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS eff_date,
               o_orderpriority,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC) AS prev
        FROM orders
      ),
      changes AS (
        SELECT o_custkey AS custkey, o_orderpriority AS state,
               eff_date AS effective_from, o_orderkey AS change_key
        FROM seq WHERE prev IS NULL OR prev <> o_orderpriority
      )
      SELECT custkey, state, effective_from, change_key,
             lead(effective_from) OVER (PARTITION BY custkey
               ORDER BY effective_from ASC, change_key ASC) AS effective_to,
             lead(effective_from) OVER (PARTITION BY custkey
               ORDER BY effective_from ASC, change_key ASC) IS NULL AS is_current
      FROM changes
      ORDER BY custkey, effective_from, change_key""",

    "q51_incremental_agg" -> """
      SELECT c_nationkey AS nk, count(o_totalprice) AS n_orders,
             floor((CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                    / count(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""",

    "q52_struct_collect" -> """
      SELECT c_nationkey AS nk, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_custkey) AS rn
        FROM customer) t
      WHERE rn <= 3 ORDER BY nk, c_custkey""",

    "q53_merge_upsert" -> """
      WITH base AS (
        SELECT c_custkey AS key, c_name AS b_name, c_acctbal AS b_bal
        FROM customer
      ),
      changeset AS (
        SELECT c_custkey AS key, c_name AS u_name, c_acctbal + 100.0 AS u_bal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 10000000, c_name || '_new', 0.0
        FROM customer WHERE c_custkey % 17 = 0
      )
      SELECT coalesce(base.key, changeset.key) AS key,
             coalesce(u_name, b_name) AS name,
             coalesce(u_bal, b_bal) AS bal,
             CASE WHEN b_name IS NULL THEN 'insert'
                  WHEN u_name IS NULL THEN 'keep'
                  ELSE 'update' END AS op
      FROM base FULL OUTER JOIN changeset ON base.key = changeset.key
      ORDER BY key""",

    "q54_constraint_audit" -> """
      WITH t AS (
        SELECT 'lineitem_orderkey_fk' AS constraint_name,
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_violations,
               (SELECT count(*) FROM lineitem) AS n_checked
        UNION ALL
        SELECT 'customer_acctbal_range',
               count(CASE WHEN c_acctbal < -1000 OR c_acctbal > 10000 THEN 1 END),
               count(*)
        FROM customer
        UNION ALL
        SELECT 'orders_status_domain',
               count(CASE WHEN o_orderstatus NOT IN ('F','P','O') THEN 1 END),
               count(*)
        FROM orders
        UNION ALL
        SELECT 'lineitem_qty_positive',
               count(CASE WHEN l_quantity <= 0 THEN 1 END), count(*)
        FROM lineitem
        UNION ALL
        SELECT 'customer_name_nonnull',
               count(CASE WHEN c_name IS NULL THEN 1 END), count(*)
        FROM customer
      )
      SELECT constraint_name, n_violations, n_checked,
             n_violations = 0 AS passed
      FROM t ORDER BY constraint_name""",

    "q55_stratified_sample" -> """
      SELECT c_custkey, c_nationkey, n_regionkey, c_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE ((c_custkey % 1000003) * 427799) % 1000003 <
            CASE WHEN n_regionkey <= 1 THEN 100000 ELSE 50000 END
      ORDER BY c_custkey""",

    "t07_pii_redaction" -> """
      WITH withpii AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
      ),
      red AS (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(text,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        FROM withpii
      )
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
             CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS INTEGER) AS n_phones,
             CAST(length(text) AS INTEGER) AS raw_chars,
             CAST(length(redacted) AS INTEGER) AS redacted_chars,
             CASE WHEN length(redacted) <= 40 THEN redacted
                  ELSE substr(redacted, length(redacted) - 39, 40) END AS redacted_tail
      FROM red
      ORDER BY doc_id"""
  )
}
