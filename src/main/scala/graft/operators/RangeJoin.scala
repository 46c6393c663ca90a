package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — pair every point row with every interval
  * row whose `[start, end]` contains it (plus optional equi-keys).
  *
  * Spark plans a bare `p.t BETWEEN i.start AND i.end` join as a
  * BroadcastNestedLoopJoin (or a cartesian product with two inequality
  * filters) — O(|points| × |intervals|) compared rows, a scale killer. The
  * standard fix (the bucketed "bin join" behind Databricks' range-join
  * optimization and the interval-join of stream engines): quantize time
  * into fixed-width buckets, EXPLODE each interval over the buckets it
  * covers, and equi-join on (keys…, bucket) with the exact BETWEEN as a
  * post-filter. A point lives in exactly one bucket, so each qualifying
  * (point, interval) pair meets exactly once — no dedup pass. Cost:
  * one shuffle on (keys, bucket), interval rows duplicated only
  * ceil(len/width)+1 times; pick `bucketWidth` ≈ the typical interval
  * length to keep that factor ~2.
  *
  * Bucketing quantizes the `double` cast (epoch seconds for timestamps,
  * identity for numerics) — `bucketWidth` is in those units — but the
  * BETWEEN itself compares the columns NATIVELY, so timestamp boundaries
  * stay exact to the microsecond. Bounds are inclusive on both ends (SQL
  * BETWEEN). Null times/keys never match.
  */
object RangeJoin {

  /** @param points       the (usually larger) point side
    * @param intervals    the interval side; start/end columns inclusive
    * @param pointTime    point column on `points`
    * @param start        interval start column on `intervals`
    * @param end          interval end column on `intervals`
    * @param bucketWidth  bucket width in double-cast time units (> 0)
    * @param on           optional equi-key columns present on BOTH sides
    * @return all `points` columns ++ all `intervals` columns (shared key
    *         columns appear once, from the point side) */
  def apply(points: DataFrame, intervals: DataFrame, pointTime: String,
      start: String, end: String, bucketWidth: Double,
      on: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val overlap = intervals.columns.filterNot(on.contains)
      .filter(c => points.columns.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"interval column(s) ${overlap.mkString(", ")} collide with point columns; rename first")
    require(!(points.columns ++ intervals.columns).exists(_.equalsIgnoreCase("__bucket")),
      "column name '__bucket' is reserved by the range join; rename it first")

    // TimeCols.tzNorm: NTZ time columns can't cast to double directly; the
    // bucket math runs on the TimestampType view while the BETWEEN below
    // still compares the user's columns natively
    def bucketOf(df: DataFrame, name: String): Column =
      floor(TimeCols.tzNorm(df, name).cast("double") / bucketWidth)
    val p = points.withColumn("__bucket", bucketOf(points, pointTime))
    // sequence() is bounded by ceil(len/width)+1 elements per interval; a
    // degenerate reversed interval (end < start) yields no buckets, matching
    // BETWEEN's empty semantics
    val i = intervals
      .filter(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end))
      .withColumn("__bucket",
        explode(sequence(bucketOf(intervals, start), bucketOf(intervals, end))))
    p.join(i, on :+ "__bucket")
      .filter(col(pointTime).between(col(start), col(end)))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join — pair every left interval with every
    * right interval it overlaps (`lStart <= rEnd AND rStart <= lEnd`,
    * closed bounds), plus optional equi-keys. Same bucketed shape as the
    * point join, with one extra idea: both sides explode over their covered
    * buckets, so an overlapping pair would meet once per SHARED bucket —
    * instead of a distinct pass (a second shuffle over the join output),
    * each pair is kept only at its CANONICAL bucket, the bucket of
    * `max(lStart, rStart)`. That bucket is covered by both sides whenever
    * the intervals overlap (max start ≤ min end), so every qualifying pair
    * meets exactly once and no dedup runs. Cost: one shuffle on
    * (keys, bucket); each interval duplicated ceil(len/width)+1 times.
    * Degenerate (reversed/null) intervals yield nothing, like BETWEEN. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Double, on: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    val overlap = right.columns.filterNot(on.contains)
      .filter(c => left.columns.exists(_.equalsIgnoreCase(c)))
    require(overlap.isEmpty,
      s"right column(s) ${overlap.mkString(", ")} collide with left columns; rename first")
    Seq("__bucket", "__sb_l", "__sb_r").foreach(rc =>
      require(!(left.columns ++ right.columns).exists(_.equalsIgnoreCase(rc)),
        s"column name '$rc' is reserved by the interval join; rename it first"))
    def bucketOf(df: DataFrame, name: String): Column =
      floor(TimeCols.tzNorm(df, name).cast("double") / bucketWidth)
    val l = left
      .filter(col(lStart).isNotNull && col(lEnd).isNotNull && col(lStart) <= col(lEnd))
      .withColumn("__sb_l", bucketOf(left, lStart))
      .withColumn("__bucket",
        explode(sequence(bucketOf(left, lStart), bucketOf(left, lEnd))))
    val r = right
      .filter(col(rStart).isNotNull && col(rEnd).isNotNull && col(rStart) <= col(rEnd))
      .withColumn("__sb_r", bucketOf(right, rStart))
      .withColumn("__bucket",
        explode(sequence(bucketOf(right, rStart), bucketOf(right, rEnd))))
    l.join(r, on :+ "__bucket")
      .filter(col("__bucket") === greatest(col("__sb_l"), col("__sb_r")))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bucket", "__sb_l", "__sb_r")
  }
}
