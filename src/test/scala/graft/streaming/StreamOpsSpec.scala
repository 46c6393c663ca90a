package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.Skew

class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked tumbling agg runs on a real stream (AvailableNow)") {
    val dir = Files.createTempDirectory("streamops").toString
    Seq(
      ("2024-01-01 00:05:00", "click", 1.0),
      ("2024-01-01 00:20:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 5.0))
      .toDF("ts_s", "event_type", "value")
      .selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value")
      .write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(s"$dir/in")
    // zero-delay watermark: at end-of-stream the watermark = max event time,
    // which closes the hour-00 window (a longer delay would close nothing in
    // a single AvailableNow batch — append emits only watermark-closed windows)
    val agg = StreamOps.tumblingAgg(stream, "ts", "1 hour", "0 seconds",
      aggs = Seq(count(lit(1)).as("n"), sum("value").as("s")))
    agg.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()

    val out = spark.read.parquet(s"$dir/out")
      .selectExpr("CAST(window.start AS STRING)", "n", "s")
      .as[(String, Long, Double)].collect().toSet
    // append mode emits only watermark-closed windows; with AvailableNow the
    // final watermark closes the first window (hour 00), not hour 01
    assert(out == Set(("2024-01-01 00:00:00", 2L, 3.0)))
  }

  test("dedup within watermark drops repeated keys") {
    val d = Seq(
      ("2024-01-01 00:00:01", 1), ("2024-01-01 00:00:01", 1), ("2024-01-01 00:00:02", 2))
      .toDF("ts_s", "k").selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "k")
    assert(StreamOps.dedupWithinWatermark(d, "ts", "1 hour", Seq("k")).count() == 2)
  }

  test("salted join equals plain join") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) 1 else i, s"p$i")).toDF("k", "payload")
    val small = Seq((1, "hot"), (2, "cold"), (500, "mid")).toDF("k", "label")
    val plain = large.join(small, Seq("k")).select("k", "payload", "label")
      .as[(Int, String, String)].collect().toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), buckets = 8)
      .select("k", "payload", "label").as[(Int, String, String)].collect().toSet
    assert(salted == plain && plain.size == 102)
    // left joins keep unmatched LARGE rows exactly once (one salt each)
    val leftJ = Skew.saltedJoin(large, small, Seq("k"), buckets = 8, joinType = "left")
    assert(leftJ.count() == large.count())
    // right/full outer would emit every unmatched small row buckets× —
    // refused by name, never silently duplicated
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(large, small, Seq("k"), buckets = 8, joinType = "full")
    }
    assert(e.getMessage.contains("8 times"), e.getMessage)
  }
}
