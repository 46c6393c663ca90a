package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

class StatefulSessionizeSpec extends SparkSuite {
  import spark.implicits._

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
}
