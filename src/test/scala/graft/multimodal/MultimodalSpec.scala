package graft.multimodal

import graft.SparkSuite
import graft.sources.Tables

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def media = Multimodal.fromText(
    Tables.load(spark, sf0001, "documents").limit(20), "doc_id", "text", "image/fake")

  test("fromText produces the canonical media schema") {
    val m = media
    assert(m.columns.toSeq == Seq("media_id", "bytes", "mime", "meta"))
    assert(m.schema("bytes").dataType.typeName == "binary")
  }

  test("extractFeatures decodes deterministically via mapPartitions") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.sameElements(f2)) // deterministic stub
    val row = Multimodal.extractFeatures(media)
      .filter($"media_id" === 0).as[Multimodal.MediaFeatures].head()
    assert(row.n_bytes > 0 && row.channels == 3 && row.width >= 64 && row.sha_prefix.length == 8)
    // the stub's dimensions are the documented md5 construction
    val text = Tables.load(spark, sf0001, "documents")
      .filter($"doc_id" === 0).select("text").as[String].head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex, 16)
    assert(row.width == 64 + (h % 1024).toInt)
    assert(row.height == 64 + ((h / 1024) % 1024).toInt)
  }

  test("sampleFrames fans out frames per media item") {
    val frames = Multimodal.sampleFrames(media, framesPerItem = 4)
    assert(frames.count() == 80) // 20 items × 4 frames
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
  }

  test("repartitionForBlobs bounds partition count by byte budget") {
    val parts = Multimodal.repartitionForBlobs(media, targetBytesPerPartition = 1024)
      .rdd.getNumPartitions
    assert(parts >= 2) // 20 docs ≫ 1 KiB total
  }
}
