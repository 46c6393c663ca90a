package graft.exec

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.ScdMerge

/** TEMPORARY diagnostic — not for commit. */
class ScratchScd2Spec extends SparkSuite {
  import spark.implicits._

  test("isolate trial 4: direct scd2 fold WITH tombstones vs one-shot") {
    val rnd = new scala.util.Random(29)
    val o2 = ScdMerge.Options(keys = Seq("id"), sequenceBy = Seq("seq"),
      scdType = 2, applyAsDeletes = Some("v = 'DEL'"))
    def genEvents() = rnd.shuffle(for {
      key <- 0L to 3L
      seq <- 1L to (3 + rnd.nextInt(4)).toLong
    } yield (key, seq, Seq("a", "b", "c", "DEL")(rnd.nextInt(4))))
    genEvents(); genEvents(); genEvents() // trials 1-3
    val events = genEvents()              // trial 4
    val batches = events.grouped(math.max(1, events.size / 3 + 1)).toSeq
    info(s"events: ${events.sortBy(e => (e._1, e._2)).mkString(", ")}")
    info(s"batches: ${batches.map(_.mkString(";")).mkString(" | ")}")
    var t: Option[org.apache.spark.sql.DataFrame] = None
    var tombs: Option[org.apache.spark.sql.DataFrame] = None
    val schema = ScdMerge.scd2(None,
      Seq((0L, 0L, "x")).toDF("id", "seq", "v"), o2).schema
    batches.zipWithIndex.foreach { case (b, i) =>
      val bdf = b.toDF("id", "seq", "v")
      val merged = ScdMerge.scd2(t, bdf, o2, tombs).collect()
      info(s"after batch $i: ${merged.map(_.toSeq).sortBy(_.toString).mkString(", ")}")
      t = Some(spark.createDataFrame(
        spark.sparkContext.parallelize(merged.toSeq), schema))
      // mirror refreshTombstones (scd2 retirement: closed-at-seq)
      val dels = bdf.filter($"v" === "DEL").select("id", "seq")
      val cands = (tombs match {
        case Some(ts) => dels.unionByName(ts)
        case None => dels
      }).dropDuplicates("id", "seq")
      val closed = t.get.select(col("id").as("tid"), col("__end_at"))
      val standing = cands.join(closed,
        col("id") === col("tid") && (col("__end_at") <=> col("seq")),
        "left_anti")
      val srows = standing.collect()
      info(s"tombs after batch $i: ${srows.map(_.toSeq).mkString(", ")}")
      tombs = Some(srows.toSeq.map(r => (r.getLong(0), r.getLong(1)))
        .toDF("id", "seq"))
    }
    val oneShot = ScdMerge.scd2(None, events.toDF("id", "seq", "v"), o2)
    val cols = oneShot.columns.sorted.toSeq
    def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(canon(t.get) == canon(oneShot),
      s"direct fold diverges\nfold: ${canon(t.get).toSeq.sortBy(_.toString)}\n" +
        s"ones: ${canon(oneShot).toSeq.sortBy(_.toString)}")
  }
}
