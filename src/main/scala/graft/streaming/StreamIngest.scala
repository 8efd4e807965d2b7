package graft.streaming

import graft.store.VectorStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
}
