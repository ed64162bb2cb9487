package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.sources.Tables

/** Round-7 LLM-pipeline extensions (continues [[ExtensionQueries]], split
  * for file hygiene): mergeable-sketch aggregation. Same contract — every
  * query deterministic with a DuckDB oracle.
  */
object ExtensionQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Sketch capacity for t12 — the corpus vocabulary is 31 terms, so at
    * most 961 distinct bigrams exist at ANY scale factor: 1024 puts the
    * sketch in its exact regime (no eviction, no trim, err all 0), which
    * is what makes a sketch hash-matchable against an exact oracle. The
    * approximate regime is property-tested in HeavyHittersSpec.
    */
  private val T12Capacity = 1024

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Corpus-wide heavy hitters via a mergeable Space-Saving sketch: each
    // partition folds its documents' bigrams into a bounded 1024-entry
    // summary, partials merge up the tree (capacity-sized objects on the
    // wire, never term-sized data), one summary out — the 100 TB shape for
    // "top phrases in the corpus", vs the exact groupBy whose shuffle is
    // proportional to the distinct-term count. Bigram construction is
    // shared with t10 (projected token array, codegen'd slice+zip, no
    // per-element lambda re-evaluation).
    "t12_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = col("__toks")
      val pairs = when(size(toks) >= 2,
        arrays_zip(slice(toks, lit(1), size(toks) - 1).as("w1"),
          slice(toks, lit(2), size(toks) - 1).as("w2")))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
      val perDoc = t(s, dir, "documents")
        .select(graft.operators.TextOps.tokens(col("text")).as("__toks"))
        .select(transform(pairs,
          p => concat_ws(" ", p.getField("w1"), p.getField("w2"))).as("bgs"))
        .as[Seq[String]]
      val summary = perDoc
        .select(HeavyHitters.spaceSaving(T12Capacity).toColumn).toDF("ss")
      summary.select(explode(col("ss")).as("e"))
        .select(col("e.term").as("term"), col("e.est").as("est"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("est").desc, col("term").asc)))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("term"), col("est"))
        .orderBy(col("rank"))
    })
  )

  val oracles: Map[String, String] = Map(

    // Exact bigram top-20 — in the sketch's exact regime the summary IS
    // the exact count map, so a plain count oracle hash-matches it.
    "t12_heavy_hitters" -> """
      WITH tok AS (
        SELECT string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents
      ),
      bg AS (
        SELECT unnest(CASE WHEN len(toks) >= 2
             THEN list_transform(range(0, len(toks) - 1),
                    i -> toks[CAST(i + 1 AS INTEGER)] || ' ' || toks[CAST(i + 2 AS INTEGER)])
             ELSE [] END) AS term
        FROM tok
      ),
      counts AS (SELECT term, count(*) AS est FROM bg GROUP BY 1),
      ranked AS (
        SELECT term, est,
               row_number() OVER (ORDER BY est DESC, term ASC) AS rank
        FROM counts
      )
      SELECT CAST(rank AS INTEGER) AS rank, term, est
      FROM ranked WHERE rank <= 20 ORDER BY rank"""
  )
}
