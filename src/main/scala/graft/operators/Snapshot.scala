package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-snapshot ("argmax per key") operators.
  *
  * The reference's universal temporal semantics: every fact keeps history and
  * queries want only the latest snapshot. It implements this twice:
  *   - per key group: groupBy-MAX CTE joined back
  *     (`/root/reference/src/main/scala/App.scala:27-48`)
  *   - globally: 1-row MAX CTE consumed as an uncorrelated scalar subquery
  *     (`App.scala:57-62,70` and 82-91, 115-128, 140-163)
  *
  * Scale notes: both forms are pure shuffle-parallel plans. The join-back
  * form shuffles the fact twice on the same keys (agg + join) but keeps ALL
  * tied rows — faithful to the reference. The window form shuffles once and
  * picks exactly one row per key (needs a total-order tiebreak to stay
  * deterministic). The global form reduces map-side to 1 row per partition
  * before the final reduction, then broadcasts — no driver round-trip needed.
  */
object Snapshot {

  /** Reference form (`App.scala:27-48`): `GROUP BY keys -> MAX(ord)` joined
    * back on keys + ord equality. Keeps every row tied for the max.
    */
  def latestPerKeyJoin(df: DataFrame, keys: Seq[String], ordCol: String): DataFrame = {
    // The aggregate side derives from `df`, so its key attributes must be
    // renamed before the join-back or Spark flags an ambiguous self-join.
    val maxName = s"__max_$ordCol"
    val latest = df
      .groupBy(keys.map(col): _*).agg(max(col(ordCol)).as(maxName))
      .select(keys.map(k => col(k).as(s"__k_$k")) :+ col(maxName): _*)
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _) &&
      (col(ordCol) === col(maxName))
    df.join(latest, cond).select(df.columns.toIndexedSeq.map(col(_)): _*)
  }

  /** Window form: exactly one row per key, ordered by `orderCols` descending
    * priority (caller must make the ordering total for determinism).
    * One shuffle instead of two — preferred at scale when ties are not wanted.
    */
  def latestPerKeyWindow(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Global 1-row MAX (`App.scala:57-62`): `df.agg(max(ord))`. */
  def latestGlobal(df: DataFrame, ordCol: String, alias: String = "max_date"): DataFrame =
    df.agg(max(col(ordCol)).as(alias))

  /** Uncorrelated-scalar-subquery filter (`App.scala:70`):
    * `WHERE ord = (SELECT MAX(ord) ...)`, kept fully lazy as a broadcast
    * cross-join of the 1-row aggregate — no `.first` driver round-trip, so it
    * scales to any input size and stays a single Spark job.
    */
  def filterLatestGlobal(df: DataFrame, ordCol: String): DataFrame = {
    val scalar = broadcast(latestGlobal(df, ordCol, s"__max_$ordCol"))
    df.crossJoin(scalar)
      .filter(col(ordCol) === col(s"__max_$ordCol"))
      .drop(s"__max_$ordCol")
  }
}
