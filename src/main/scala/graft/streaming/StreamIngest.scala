package graft.streaming

import graft.store.VectorStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}

/** Structured Streaming surface. The reference has NO streaming
  * (SURVEY §2.9) — this is the beyond-reference extension: append-mode
  * `set_data` is the natural `foreachBatch` body, so a stream of
  * records continuously ingests with the same schema coercion,
  * embed-if-missing, and first-wins dedup semantics as batch.
  *
  * Scale: each micro-batch is one bulk append (anti-join against the
  * current store) — no per-row inserts; dedup cost is proportional to
  * the batch, not the store, because the anti-join build side is the
  * incoming batch.
  */
object StreamIngest {

  /** Continuously ingest a stream into a store. Each micro-batch runs
    * the full append path; empty batches are skipped. */
  def intoStore(stream: DataFrame, store: VectorStore,
      checkpoint: Option[String] = None,
      queryName: String = "graft-stream-ingest"): StreamingQuery = {
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.setData(batch, append = !store.isEmpty)
      }
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** Streaming exact dedup with EXPLICIT state (first-wins across the
    * whole stream, not just a watermark horizon): per key,
    * `flatMapGroupsWithState` keeps one boolean "seen" flag and emits
    * only the first row. This is the custom-state form of the U1/J3
    * first-wins semantics for unbounded streams — use the built-in
    * watermarked `dropDuplicates` when a bounded horizon suffices
    * (bounded state); this operator's state grows with distinct keys
    * (the LLM-pipeline "dedup the whole crawl" contract).
    *
    * Emission order inside a micro-batch is per-group; "first" among
    * same-key rows in one batch is arbitrary, matching the batch
    * ingest's tie semantics. */
  def streamingFirstWins(stream: DataFrame, keyCol: String): DataFrame = {
    val enc: Encoder[Row] = Encoders.row(stream.schema)
    implicit val rowEnc: Encoder[Row] = enc
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val keyIdx = stream.schema.fieldIndex(keyCol)
    // prefix-discriminate null from the literal string "null"
    val grouped = stream.groupByKey(r =>
      if (r.isNullAt(keyIdx)) "n" else "v" + r.get(keyIdx))
    val deduped: Dataset[Row] = grouped.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          rows.take(1)
        }
    }
    deduped.toDF()
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * counts + sum per (window, key). Late rows beyond the watermark
    * are dropped; state is bounded by watermark horizon. */
  def windowedAgg(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("total"))

  /** Incremental streaming near-duplicate filter — the crawl-dedup
    * contract over an unbounded stream: each micro-batch is
    * deduplicated WITHIN itself (SimHash pairs + independent-set drop)
    * and against every previously accepted document, survivors are
    * appended to the accepted-signature state and handed to
    * `onSurvivors`. State is one (id, sig64) row per accepted doc —
    * ~16 bytes/doc, lineage-truncated per batch via localCheckpoint,
    * so 1 B accepted docs ≈ 16 GB across the cluster.
    *
    * Returns the query plus an accessor for the accepted-signature
    * frame (for checkpointing/bootstrap: pass a prior run's signatures
    * as `bootstrap` to resume). */
  final class NearDupFilter private[streaming] (
      val query: StreamingQuery, state: () => DataFrame) {
    def acceptedSignatures: DataFrame = state()
  }

  def nearDupIngest(stream: DataFrame, idCol: String, textCol: String,
      onSurvivors: DataFrame => Unit, maxHamming: Int = 3,
      bands: Int = 4, bootstrap: Option[DataFrame] = None,
      queryName: String = "graft-neardup-ingest"): NearDupFilter = {
    val spark = stream.sparkSession
    var seen: DataFrame = bootstrap
      .getOrElse(graft.operators.Dedup.simhashSignatures(
        stream.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          stream.schema), idCol, textCol))
      .localCheckpoint(true)
    val q = stream.writeStream
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // in-batch near-dup drop (chain-safe independent set)
          val pairs = graft.operators.Dedup.nearDupPairsSimHash(
            batch, idCol, textCol, maxHamming, bands = bands)
          val inBatch = graft.operators.Dedup.dedupByPairs(
            batch, idCol, pairs)
          // drop anything near an already-accepted doc
          val sigs = graft.operators.Dedup.simhashSignatures(
            inBatch, idCol, textCol)
          val dupIds = graft.operators.Dedup.nearDupProbeSimHash(
            sigs, seen, idCol, maxHamming = maxHamming, bands = bands)
          val survivors = inBatch.join(dupIds, Seq(idCol), "left_anti")
            .localCheckpoint(true)
          val survivorSigs = sigs.join(dupIds, Seq(idCol), "left_anti")
          val next = seen.unionByName(survivorSigs).localCheckpoint(true)
          seen = next
          onSurvivors(survivors)
        }
      }
      .start()
    new NearDupFilter(q, () => seen)
  }

  /** Streaming gap-based sessionization — the unbounded twin of
    * [[graft.operators.Sessionize]]: per key, events within `maxGapMs`
    * of the running session's end extend it; a session is EMITTED when
    * the event-time watermark passes `end + maxGapMs` (event-time
    * timeout) or when a later batch opens a new session past the gap.
    * Output rows: (key, session_start, session_end, n_events) as epoch
    * millis — append mode, one row per closed session; state per key
    * is three longs, dropped at close.
    *
    * Batch simplification (documented): events of one key arriving in
    * one trigger merge into a single span — sub-batch gaps don't split
    * within the trigger. At micro-batch cadence ≪ gap this is the
    * standard behavior.
    *
    * @param tsCol TimestampType event-time column; the caller's
    *              watermark delay bounds late data as usual
    */
  def streamingSessions(stream: DataFrame, keyCol: String, tsCol: String,
      maxGapMs: Long, watermark: String = "10 minutes"): DataFrame = {
    require(maxGapMs > 0, "maxGapMs must be positive")
    import org.apache.spark.sql.streaming.GroupStateTimeout
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    // the event-time column must survive to the grouped Dataset as a
    // TIMESTAMP for EventTimeTimeout to see the watermark — millis
    // conversion happens inside the state function instead
    implicit val inEnc: Encoder[(String, java.sql.Timestamp)] =
      Encoders.tuple(Encoders.STRING, Encoders.TIMESTAMP)
    implicit val stEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[(String, Long, Long, Long)] = Encoders.tuple(
      Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)
    val prepared = stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, java.sql.Timestamp)]
    val sessions = prepared.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (String, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator.single((key, s, e, n))
          } else {
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var cnt = 0L
            rows.foreach { case (_, t) =>
              val ts = t.getTime
              if (ts < mn) mn = ts
              if (ts > mx) mx = ts
              cnt += 1
            }
            val closed = state.getOption match {
              // merge only when the batch span is within the gap of the
              // stored session ON EITHER SIDE — a late batch that ends
              // more than a gap BEFORE the session start must not merge
              // (mn - e <= gap alone is vacuously true for late data)
              case Some((s, e, n)) if mn <= e + maxGapMs && mx >= s - maxGapMs =>
                state.update((math.min(s, mn), math.max(e, mx), n + cnt))
                Iterator.empty
              case Some((s, e, n)) if mx < s - maxGapMs =>
                // late batch entirely before the open session: emit it
                // as its own (already-past) session, keep the open one
                Iterator.single((key, mn, mx, cnt))
              case Some((s, e, n)) => // batch starts past the gap
                state.update((mn, mx, cnt))
                Iterator.single((key, s, e, n))
              case None =>
                state.update((mn, mx, cnt))
                Iterator.empty
            }
            state.setTimeoutTimestamp(state.get._2 + maxGapMs)
            closed
          }
      }
    sessions.toDF(keyCol, "session_start", "session_end", "n_events")
  }
}
