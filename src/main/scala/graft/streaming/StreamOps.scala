package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native Structured Streaming operators exposed through the engine — the
  * reference's emitted code never uses watermarks or windows (SURVEY §2.5:
  * "its stateful ops are all merge-in-foreachBatch"), but Spark provides them
  * natively and our SQL/function surface passes them through at zero cost.
  * These wrappers document the canonical shapes; each works identically on
  * batch DataFrames (no watermark) and streams.
  */
object StreamOps {

  /** Tumbling-window aggregation with a watermark: the streaming counterpart
    * of q15. State is bounded by the watermark horizon. */
  def tumblingAgg(df: DataFrame, tsCol: String, windowLength: String,
      watermark: String, aggs: Seq[Column], groupBy: Seq[Column] = Nil): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base.groupBy((window(col(tsCol), windowLength) +: groupBy): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Stream dedup BY KEY within the watermark horizon — the primitive the
    * runner's ingest-time dedup uses (`dropDuplicatesWithinWatermark`:
    * keyed state evicted at the horizon). Keying on keys ALONE is the
    * contract: a producer retry that re-stamps the timestamp is still the
    * same logical event, and the earlier `dropDuplicates(keys :+ ts)` let
    * both deliveries through. Batch mode = plain dropDuplicates(keys). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else df.dropDuplicates(keys)

  /** Sliding-window aggregation. */
  def slidingAgg(df: DataFrame, tsCol: String, windowLength: String,
      slide: String, watermark: String, aggs: Seq[Column]): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base.groupBy(window(col(tsCol), windowLength, slide)).agg(aggs.head, aggs.tail: _*)
  }
}
