package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TTLConfig}

import graft.operators.TextOps

/** Ingest-time NEAR-duplicate detection — the streaming twin of the batch
  * incremental-dedup family (d17's delta-vs-index pass, d22's stored-prior
  * maintenance): as documents arrive, each is checked against what already
  * streamed THROUGH THE SAME LSH BUCKETS, so the dup verdict lands at
  * ingest instead of waiting for the nightly batch.
  *
  * Design for the 100 TB ingest path:
  *   - State is SIGNATURES, not features: a 12-slot MinHash signature
  *     (same bands=4/rows=3 geometry as d02/d14/d17 — the estimator whose
  *     accuracy d19 grades) is 96 bytes per stored doc, vs the
  *     kilobytes-per-doc shingle set the exact verify would need. The
  *     stream emits ESTIMATED Jaccard (slot-agreement fraction); the exact
  *     verify stays a batch job over the emitted candidates (d04), exactly
  *     how a deployment splits ingest-time screening from offline
  *     verification.
  *   - Keying is (band, band_hash): only docs sharing a band bucket are
  *     ever compared — the same candidate-generation rule as the batch LSH
  *     (no all-pairs term anywhere), and buckets shard across executors.
  *   - Per-bucket state is CAPPED at `capK` stored signatures
  *     (first-arrivals win, the s31 degree-cap argument): a pathological
  *     hot bucket (blank docs, boilerplate) costs O(capK) per arrival and
  *     O(capK·96B) state, never O(bucket). The trade is one-sided like
  *     every cap here: arrivals past the cap still MATCH against stored
  *     members (they just don't become members), so capping can only MISS
  *     dup pairs among late same-bucket arrivals, never invent them.
  *     Unbounded-key growth across buckets is the TTL knob's job
  *     ([[nearDupStreamTtl]]) — the dedupStream watermark tradeoff in TTL
  *     form: a duplicate arriving after its bucket idled past the TTL
  *     passes unflagged.
  *   - Checkpointing (r17): run the screen with the RocksDB provider AND
  *     `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing
  *     .enabled=true`. The default full-snapshot upload scales with TOTAL
  *     bucket-key state per micro-batch — exactly the thing that grows
  *     with the corpus — while a changelog upload scales with the keys
  *     the batch CHANGED (bounded by batch size), snapshots amortizing in
  *     a background maintenance thread. Restart semantics are identical:
  *     StreamingSpec pins batch-stop-restart emit-for-emit parity under
  *     both modes and asserts the changelog files actually appear.
  *
  * A pair sharing several bands emits once per colliding band (the `band`
  * column says which); consumers dedupe by (doc_id, dup_of) — kept that
  * way so the batch twin can pin the stream's output EXACTLY, multiplicity
  * included (StreamingSpec).
  */
object DocStreams {

  /** One streamed document. */
  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** A doc's arrival at one LSH bucket: the shuffle row between the
    * signature projection and the stateful compare.
    */
  case class BandArrival(band: Int, band_hash: Long, doc_id: Long,
      ts_ms: Long, sig: Array[Long])

  /** One screening hit: `doc_id` estimated near-dup of the earlier
    * `dup_of` (slot-agreement fraction `est_jaccard`), via band `band`.
    */
  case class NearDupHit(doc_id: Long, dup_of: Long, est_jaccard: Double,
      band: Int)

  /** Stored bucket member: doc id + its 12-slot signature (top-level so
    * Encoders.product needs no outer instance).
    */
  case class Member(doc_id: Long, sig: Array[Long])

  /** d02/d14/d17's geometry: 4 bands × 3 rows = 12 signature slots. */
  val Bands = 4
  val Rows = 3
  val Slots: Int = Bands * Rows

  /** The screen's default parameters — the ONE source of truth shared by
    * [[nearDupStream]]/[[nearDupBatch]]'s defaults, the registered
    * d23_ingest_screen query, and its DuckDB oracle SQL (which interpolates
    * these, the bandSql/mhSql pattern). Hardcoding 16/0.5 on both sides let
    * the engine and oracle silently desynchronize if either changed.
    */
  val ScreenCapK = 16
  val ScreenMinEst = 0.5

  /** Project (doc_id, ts, text) to (doc_id, ts_ms, sig[12], band, band_hash)
    * — one row per band. All per-doc work is codegen'd expressions
    * (shingle_hashes / the minhash affine permutations); docs too short to
    * shingle (null bands — see TextHash.minhashBands) cannot collide and
    * are dropped, same as the batch candidate generation.
    */
  private def bandArrivals(docs: DataFrame): DataFrame = {
    val feats = graft.functions.TextHash.shingleHashes(col("text"), 2)
    docs
      .withColumn("__f", feats)
      .withColumn("sig",
        array((0 until Slots).map(j => TextOps.minhashAt(col("__f"), j)): _*))
      .withColumn("__b",
        graft.functions.TextHash.minhashBands(col("__f"), Bands, Rows))
      .filter(col("__b").isNotNull)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(col("__b")).as(Seq("band", "band_hash")))
      .select(col("band"), col("band_hash"), col("doc_id"),
        unix_millis(col("ts")).as("ts_ms"), col("sig"))
  }

  /** The streaming screen: emits a [[NearDupHit]] for every arrival whose
    * signature agrees with a stored same-bucket member on ≥ `minEst` of
    * the 12 slots. `capK` bounds each bucket's member list (doc - see
    * object doc for both bounds' semantics).
    */
  def nearDupStream(docs: Dataset[Doc], capK: Int = ScreenCapK,
      minEst: Double = ScreenMinEst): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    bandArrivals(docs.toDF()).as[BandArrival]
      .groupByKey(a => (a.band, a.band_hash))
      .transformWithState(new NearDupProcessor(capK, minEst),
        TimeMode.None(), OutputMode.Update())
  }

  /** [[nearDupStream]] with per-bucket state TTL — the retention knob for
    * a bucket key space that grows with the corpus (TimeMode must be
    * ProcessingTime for TTL, Spark's transformWithState contract). Each
    * stored member evicts once `ttl` of processing time passes since it
    * was written (ListState TTL is per-element); a dup arriving after its
    * original evicted passes unflagged — the deliberate accuracy-for-space
    * trade, same as [[EventStreams.dedupStream]]'s watermark. Eviction
    * also re-opens cap room: the member list reflects only live entries.
    */
  def nearDupStreamTtl(docs: Dataset[Doc], ttl: java.time.Duration,
      capK: Int = ScreenCapK, minEst: Double = ScreenMinEst): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    bandArrivals(docs.toDF()).as[BandArrival]
      .groupByKey(a => (a.band, a.band_hash))
      .transformWithState(new NearDupProcessor(capK, minEst, Some(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** The batch twin, for pinning the stream's semantics (StreamingSpec):
    * per bucket, members ranked by arrival (ts, doc_id); a later arrival
    * `l` hits every earlier `e` with rank ≤ capK whose signature agrees on
    * ≥ minEst — `e`'s rank bound is membership (stored iff among the first
    * capK), `l` is unbounded (every arrival compares against stored
    * members). Exactly the processor's rule, ignoring batch boundaries —
    * so it equals the stream whenever arrival order (ts, doc_id) is
    * consistent with batch order, which an in-order ingest feed is.
    */
  def nearDupBatch(docs: DataFrame, capK: Int = ScreenCapK,
      minEst: Double = ScreenMinEst): DataFrame = {
    val arr = bandArrivals(docs)
    val w = Window.partitionBy(col("band"), col("band_hash"))
      .orderBy(col("ts_ms"), col("doc_id"))
    val ranked = arr.withColumn("rank", row_number().over(w))
    val e = ranked.filter(col("rank") <= capK).select(
      col("band").as("e_band"), col("band_hash").as("e_hash"),
      col("doc_id").as("dup_of"), col("rank").as("e_rank"),
      col("sig").as("e_sig"))
    val l = ranked.select(col("band").as("l_band"),
      col("band_hash").as("l_hash"), col("doc_id").as("doc_id"),
      col("rank").as("l_rank"), col("sig").as("l_sig"))
    l.join(e, col("l_band") === col("e_band") &&
        col("l_hash") === col("e_hash") && col("e_rank") < col("l_rank"))
      .withColumn("est_jaccard",
        graft.functions.ArrayAgreeCount.agreeCount(col("l_sig"), col("e_sig"))
          .cast("double") / lit(Slots.toDouble))
      .filter(col("est_jaccard") >= minEst)
      .select(col("doc_id"), col("dup_of"), col("est_jaccard"),
        col("l_band").as("band"))
  }
}

/** [[DocStreams.nearDupStream]]'s processor: one capped ListState of
  * (doc_id, signature) per LSH bucket. Arrivals are processed in
  * (ts, doc_id) order within a batch; each compares against the stored
  * members (plus this batch's earlier arrivals that made the cap) and
  * then joins the list iff it still has room — see the object doc for
  * why both sides of that rule are one-sided.
  */
class NearDupProcessor(capK: Int, minEst: Double,
    ttl: Option[java.time.Duration] = None)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (Int, Long), DocStreams.BandArrival, DocStreams.NearDupHit] {
  import DocStreams.{BandArrival, Member, NearDupHit, Slots}

  @transient private var members: ListState[Member] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState("members", Encoders.product[Member],
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(key: (Int, Long),
      rows: Iterator[BandArrival],
      timers: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[NearDupHit] = {
    // Materializes ONE (bucket, micro-batch) slice — bounded by
    // micro-batch sizing (maxOffsetsPerTrigger etc.), NOT by corpus or
    // bucket-lifetime size; per-arrival work after the sort stays
    // O(capK·Slots). The sort is required for the arrival-order rule the
    // batch twin pins (first capK arrivals become members): Spark hands
    // this iterator in shuffle order, and processing out of order would
    // admit different members than a replay. A deliberately hot bucket
    // receiving most of a huge micro-batch pays an in-memory sort of that
    // batch's rows (96 B signature each) — size triggers accordingly.
    val sorted = rows.toSeq.sortBy(a => (a.ts_ms, a.doc_id))
    if (sorted.isEmpty) return Iterator.empty
    val stored = if (members.exists())
      scala.collection.mutable.ArrayBuffer.from(members.get())
    else scala.collection.mutable.ArrayBuffer.empty[Member]
    val n0 = stored.length
    val hits = Seq.newBuilder[NearDupHit]
    sorted.foreach { a =>
      stored.foreach { m =>
        var agree = 0
        var j = 0
        while (j < Slots) {
          if (a.sig(j) == m.sig(j)) agree += 1
          j += 1
        }
        val est = agree.toDouble / Slots
        if (est >= minEst) hits += NearDupHit(a.doc_id, m.doc_id, est, key._1)
      }
      if (stored.length < capK) stored += Member(a.doc_id, a.sig)
    }
    // one write per (bucket, batch), and only if anything joined
    if (stored.length > n0) members.appendList(stored.drop(n0).toArray)
    hits.result().iterator
  }
}
