package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: forward-fill and fixed-step resampling —
  * the gap-filling operators behind "last known value per key per period"
  * reporting, which plain SQL lacks (a GROUP BY drops empty periods
  * entirely; a left join against a calendar table forward-fills nothing).
  *
  * Scale shape: `ffill` is one keyed window pass (single shuffle).
  * `resample` builds the per-key grid from a per-key min/max aggregate
  * (map-side combined, tiny output) exploded to one row per step — never a
  * driver-side calendar — then reuses [[AsOfJoin]]'s union+window pass to
  * attach the as-of-latest payload to every grid point. Total: two shuffles
  * on the key, no joins, no row explosion beyond the grid itself.
  */
object TimeSeries {

  /** Forward-fill nulls in `cols` with the last non-null value per key in
    * time order (one keyed window, all columns in the same pass). */
  def ffill(df: DataFrame, keys: Seq[String], time: String,
      cols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "ffill needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(time))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Resample to a fixed step: for every key, one row per `stepSeconds`
    * bucket between that key's first and last observation, carrying the
    * as-of-latest `payload` columns (gap buckets forward-fill; a bucket
    * before the key's first observation — only the aligned first one —
    * yields nulls). `time` may be a timestamp (grid points are timestamps
    * aligned to epoch multiples of the step) or numeric (numeric grid). */
  def resample(df: DataFrame, keys: Seq[String], time: String,
      stepSeconds: Long, payload: Seq[String],
      gridCol: String = "grid_ts"): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    require(!df.columns.exists(_.equalsIgnoreCase(gridCol)),
      s"grid column '$gridCol' collides with an input column; rename one")
    val step = lit(stepSeconds)
    val isTimestamp = TimeCols.isTimestamp(TimeCols.dataTypeOf(df, time))
    def gridValue(bucket: org.apache.spark.sql.Column) =
      if (isTimestamp) timestamp_seconds(bucket * step) else bucket * step
    // tzNorm: an NTZ time column can't cast to double for the bucket math;
    // min/max run on the TimestampType view (grid points come out
    // TimestampType either way — timestamp_seconds — so NTZ input yields
    // the same session-zone grid a TimestampType input would)
    val grid = df.groupBy(keys.map(col): _*)
      .agg(min(TimeCols.tzNorm(df, time)).as("__mn"),
        max(TimeCols.tzNorm(df, time)).as("__mx"))
      .withColumn("__bucket", explode(sequence(
        floor(col("__mn").cast("double") / step),
        floor(col("__mx").cast("double") / step))))
      .select(keys.map(col) :+ gridValue(col("__bucket")).as(gridCol): _*)
    AsOfJoin(grid, df, on = keys, leftTime = gridCol, rightTime = time,
      payload = payload)
  }
}
