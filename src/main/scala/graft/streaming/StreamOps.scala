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

  /** Exactly-once-ish stream dedup by key within the watermark horizon
    * (`dropDuplicates` keyed state; batch mode = plain dropDuplicates). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base.dropDuplicates(keys :+ tsCol)
  }

  /** Sliding-window aggregation. */
  def slidingAgg(df: DataFrame, tsCol: String, windowLength: String,
      slide: String, watermark: String, aggs: Seq[Column]): DataFrame = {
    val base = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    base.groupBy(window(col(tsCol), windowLength, slide)).agg(aggs.head, aggs.tail: _*)
  }
}
