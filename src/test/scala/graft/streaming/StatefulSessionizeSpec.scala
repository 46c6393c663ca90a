package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

class StatefulSessionizeSpec extends SparkSuite {
  import spark.implicits._

  test("batch mode flushes the final open session — the last session never vanishes") {
    // one user, all events within the gap: pre-fix, batch mode emitted
    // NOTHING (the open session persisted to meaningless batch state and
    // each group is invoked exactly once)
    val events = Seq(
      (1L, "2024-03-01 10:00:00", 1.0), (1L, "2024-03-01 10:10:00", 2.0),
      (2L, "2024-03-01 09:00:00", 5.0), (2L, "2024-03-01 11:00:00", 7.0))
      .toDF("user_id", "ts_s", "value")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
      .as[StatefulSessionize.Event]
    val out = StatefulSessionize.sessions(events, gapMs = 30 * 60 * 1000)
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    // user 1: ONE session (2 events); user 2: TWO sessions (gap > 30 min)
    assert(out == Set((1L, 2L, 3.0), (2L, 1L, 5.0), (2L, 1L, 7.0)), out.toString)
  }

  test("flatMapGroupsWithState sessionizes across restarted AvailableNow runs") {
    val dir = Files.createTempDirectory("stateful").toString

    def writeEvents(rows: Seq[(Long, String, Double)], mode: String): Unit =
      rows.toDF("user_id", "ts_s", "value")
        .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
        .write.mode(mode).parquet(s"$dir/in")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in")
        .as[StatefulSessionize.Event]
      StatefulSessionize.sessions(stream, gapMs = 30 * 60 * 1000)
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }

    // run 1: two events 10 min apart → one OPEN session, nothing emitted
    writeEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0)), "overwrite")
    runOnce()
    assert(!new java.io.File(s"$dir/out").exists() ||
      spark.read.parquet(s"$dir/out").isEmpty)

    // run 2 (state restored from checkpoint): an event 2h later closes it
    writeEvents(Seq((1L, "2024-01-01 02:00:00", 9.0)), "append")
    runOnce()
    val sessions = spark.read.parquet(s"$dir/out")
      .selectExpr("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(sessions == Set((1L, 2L, 3.0)))
  }

  test("a LATE cross-batch event must not rewind the open session's end") {
    val dir = Files.createTempDirectory("stateful-late").toString
    def writeEvents(rows: Seq[(Long, String, Double)], mode: String): Unit =
      rows.toDF("user_id", "ts_s", "value")
        .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
        .write.mode(mode).parquet(s"$dir/in")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in").as[StatefulSessionize.Event]
      StatefulSessionize.sessions(stream, gapMs = 30 * 60 * 1000)
        .writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
    // run 1 leaves state end = 10:00
    writeEvents(Seq(
      (1L, "2024-01-01 09:40:00", 1.0),
      (1L, "2024-01-01 10:00:00", 2.0)), "overwrite")
    runOnce()
    // run 2: a LATE event inside the session (9:50). Pre-fix the state's
    // end rewound to 9:50, so the 10:25 event (within gap of the TRUE
    // last activity 10:00, beyond gap of 9:50) wrongly split the session.
    writeEvents(Seq((1L, "2024-01-01 09:50:00", 3.0)), "append")
    runOnce()
    writeEvents(Seq((1L, "2024-01-01 10:25:00", 4.0)), "append")
    runOnce()
    // close it far past the gap so everything emits
    writeEvents(Seq((1L, "2024-01-01 23:00:00", 0.0)), "append")
    runOnce()
    val sessions = spark.read.parquet(s"$dir/out")
      .selectExpr("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(sessions == Set((1L, 4L, 10.0)), sessions.toString)
  }
}
