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
  * BETWEEN). Null times/keys never match, and for float/double columns
  * NaN times/bounds never match either (defined semantics here — a bare
  * BETWEEN would treat NaN as greater than everything via Spark's total
  * order, which is an ordering artifact, not a meaningful time).
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

    val p = points.filter(notNan(points, pointTime))
      .withColumn("__bucket", bucketOf(points, pointTime, bucketWidth))
    // sequence() is bounded by ceil(len/width)+1 elements per interval; a
    // degenerate reversed interval (end < start) yields no buckets, matching
    // BETWEEN's empty semantics
    val i = intervals
      .filter(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end)
        && notNan(intervals, start) && notNan(intervals, end))
      .withColumn("__bucket",
        explode(sequence(bucketOf(intervals, start, bucketWidth),
          bucketOf(intervals, end, bucketWidth))))
    p.join(i, on :+ "__bucket")
      .filter(col(pointTime).between(col(start), col(end)))
      .drop("__bucket")
  }

  // TimeCols.tzNorm: NTZ time columns can't cast to double directly; the
  // bucket math runs on the TimestampType view while the exact compares
  // below still use the user's columns natively
  private def bucketOf(df: DataFrame, name: String, width: Double): Column =
    floor(TimeCols.tzNorm(df, name).cast("double") / width)

  /** NaN-as-no-match guard (float/double columns only — isnan is undefined
    * elsewhere): a NaN time/bound has no enumerable bucket, and matching it
    * "as +infinity" would be Spark's total-order artifact, not semantics. */
  private def notNan(df: DataFrame, name: String): Column =
    // case-insensitive field lookup, like every other consumer here
    df.schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.DoubleType |
                org.apache.spark.sql.types.FloatType) => !isnan(col(name))
      case _ => lit(true)
    }

  /** Infer a bucket width from the interval data instead of hand-tuning:
    * the `quantile` (default p90) of the interval LENGTHS, in the same
    * double-cast units the join buckets in (epoch seconds for timestamps).
    * With width ≈ a high length quantile, ~`quantile` of intervals explode
    * to at most 2 buckets (duplication factor ~2, the sweet spot the class
    * doc describes) while the tail pays proportionally more — the right
    * trade when lengths are skewed, since a width sized to the MAX would
    * fan points into buckets so wide the residual filter does all the work.
    *
    * Cost: one approx-quantile aggregation over a `maxSampleRows`-capped
    * sample — bounded regardless of corpus size, run once and reused (set
    * the result as `spark.graft.rangeJoin.bucketWidth` for the optimizer
    * rule, or pass it to [[apply]]). Degenerate inputs fail loudly: no
    * valid intervals, or an all-zero-length sample (width must be > 0). */
  def inferBucketWidth(intervals: DataFrame, start: String, end: String,
      quantile: Double = 0.9, maxSampleRows: Int = 100000): Double = {
    require(quantile > 0 && quantile <= 1, s"quantile must be in (0, 1], got $quantile")
    val lens = intervals
      .filter(col(start).isNotNull && col(end).isNotNull && col(start) <= col(end)
        && notNan(intervals, start) && notNan(intervals, end))
      .select((TimeCols.tzNorm(intervals, end).cast("double")
        - TimeCols.tzNorm(intervals, start).cast("double")).as("__len"))
      .limit(maxSampleRows)
    val q = lens.stat.approxQuantile("__len", Array(quantile), 0.01)
    require(q.nonEmpty, "no valid intervals to infer a bucket width from")
    val w = q.head
    // an all-point sample (every start == end) has no length scale to
    // infer; 0 would divide-by-zero the bucket math — refuse loudly
    require(w > 0,
      s"inferred width $w at p$quantile — interval lengths are all zero at " +
        "this quantile; raise the quantile or pass an explicit bucketWidth")
    w
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
    val l = left
      .filter(col(lStart).isNotNull && col(lEnd).isNotNull && col(lStart) <= col(lEnd)
        && notNan(left, lStart) && notNan(left, lEnd))
      .withColumn("__sb_l", bucketOf(left, lStart, bucketWidth))
      .withColumn("__bucket",
        explode(sequence(bucketOf(left, lStart, bucketWidth),
          bucketOf(left, lEnd, bucketWidth))))
    val r = right
      .filter(col(rStart).isNotNull && col(rEnd).isNotNull && col(rStart) <= col(rEnd)
        && notNan(right, rStart) && notNan(right, rEnd))
      .withColumn("__sb_r", bucketOf(right, rStart, bucketWidth))
      .withColumn("__bucket",
        explode(sequence(bucketOf(right, rStart, bucketWidth),
          bucketOf(right, rEnd, bucketWidth))))
    l.join(r, on :+ "__bucket")
      .filter(col("__bucket") === greatest(col("__sb_l"), col("__sb_r")))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bucket", "__sb_l", "__sb_r")
  }
}
