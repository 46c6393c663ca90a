package graft.operators

import graft.SparkSuite

/** Forward-fill and fixed-step resampling semantics. */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  test("ffill carries the last non-null forward per key, in time order") {
    val df = Seq(
      (1L, 1L, Some(10.0)), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some(40.0)),
      (2L, 1L, None), (2L, 2L, Some(5.0))).toDF("k", "t", "v")
    val out = TimeSeries.ffill(df, Seq("k"), "t", Seq("v"))
      .select("k", "t", "v").as[(Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 1L, Some(10.0)), (1L, 2L, Some(10.0)), (1L, 3L, Some(10.0)),
      (1L, 4L, Some(40.0)),
      (2L, 1L, None), (2L, 2L, Some(5.0)))) // nothing earlier to fill from
  }

  test("resample emits one bucket per step per key, gaps forward-filled") {
    // key 1 observed at t=5 and t=25 (step 10): buckets 0,10,20
    val df = Seq((1L, 5L, 100.0), (1L, 25L, 200.0), (2L, 12L, 7.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.resample(df, Seq("k"), "t", 10L, Seq("v"), gridCol = "g")
      .select("k", "g", "v").as[(Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 0L, None),        // aligned bucket before the first observation
      (1L, 10L, Some(100.0)), // t=5 carried into bucket 10
      (1L, 20L, Some(100.0)), // gap bucket forward-fills
      (2L, 10L, None)))      // single obs at t=12 is after its bucket start
  }

  test("resample on timestamps aligns the grid to epoch step multiples") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq((1L, ts("2024-01-01 06:00:00"), 1.0),
      (1L, ts("2024-01-03 01:00:00"), 2.0)).toDF("k", "ts", "v")
    val out = TimeSeries.resample(df, Seq("k"), "ts", 86400L, Seq("v"))
      .select("grid_ts", "v").as[(java.sql.Timestamp, Option[Double])]
      .collect().toMap
    assert(out == Map(
      ts("2024-01-01 00:00:00") -> None,
      ts("2024-01-02 00:00:00") -> Some(1.0),
      ts("2024-01-03 00:00:00") -> Some(1.0)))
  }

  test("resample on TIMESTAMP_NTZ input matches the TimestampType result") {
    // pandas/pyarrow parquet surfaces as NTZ, which rejects numeric casts —
    // the operator must normalize internally instead of dying at analysis
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val tz = Seq((1L, ts("2024-01-01 06:00:00"), 1.0),
      (1L, ts("2024-01-03 01:00:00"), 2.0)).toDF("k", "ts", "v")
    val ntz = tz.withColumn("ts", $"ts".cast("timestamp_ntz"))
    val run = (df: org.apache.spark.sql.DataFrame) =>
      TimeSeries.resample(df, Seq("k"), "ts", 86400L, Seq("v"))
        .select("grid_ts", "v").as[(java.sql.Timestamp, Option[Double])]
        .collect().toMap
    assert(run(ntz) == run(tz))
  }

  test("resample guards: bad step, grid-name collision") {
    val df = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.resample(df, Seq("k"), "t", 0L, Seq("v"))
    }
    intercept[IllegalArgumentException] {
      TimeSeries.resample(df, Seq("k"), "t", 10L, Seq("v"), gridCol = "v")
    }
  }
}
