package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.config.YamlConfig

/** WARC bridge: a GOLDEN-BYTES parse (hand-authored per ISO 28500,
  * independent of our writer — the honest pin for a format where writer
  * and reader ship together), gzip member-per-record decode, strict-mode
  * loud failures, writer round-trip, and the cloudfiles fixed-schema
  * refusals. */
class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def crlf(s: String): String = s.replace("\n", "\r\n")

  /** Two records written by hand from the spec, NOT by WarcBridge.write:
    * a warcinfo record and a conversion record with a non-ASCII payload. */
  private val goldenBytes: Array[Byte] = {
    val p1 = "software: testwriter/1.0\r\n"
    val p2 = "héllo wärld" // 13 bytes in UTF-8
    val doc = crlf(
      s"""WARC/1.0
         |WARC-Type: warcinfo
         |WARC-Record-ID: <urn:uuid:aaa-111>
         |WARC-Date: 2024-03-01T12:00:00Z
         |Content-Type: application/warc-fields
         |Content-Length: ${p1.getBytes(StandardCharsets.UTF_8).length}
         |
         |""".stripMargin) + p1 + "\r\n\r\n" + crlf(
      s"""WARC/1.0
         |WARC-Type: conversion
         |WARC-Record-ID: <urn:uuid:bbb-222>
         |WARC-Date: 2024-03-01T12:34:56Z
         |WARC-Target-URI: http://example.org/x
         |Content-Type: text/plain
         |Content-Length: ${p2.getBytes(StandardCharsets.UTF_8).length}
         |
         |""".stripMargin) + p2 + "\r\n\r\n"
    doc.getBytes(StandardCharsets.UTF_8)
  }

  private def decodeBytes(bytes: Array[Byte], name: String) = {
    val dir = Files.createTempDirectory("graft-warc")
    Files.write(dir.resolve(name), bytes)
    WarcBridge.decode(
      spark.read.format("binaryFile").load(dir.toString))
  }

  test("golden bytes parse: fields, payload bytes, headers map, UTF-8 payload") {
    val rows = decodeBytes(goldenBytes, "golden.warc")
      .orderBy("record_id").collect()
    assert(rows.length == 2)
    val info = rows(0); val conv = rows(1)
    assert(info.getString(0) == "warcinfo" &&
      info.getString(1) == "<urn:uuid:aaa-111>")
    assert(info.getAs[String]("target_uri") == null)
    assert(conv.getString(0) == "conversion")
    assert(conv.getAs[String]("target_uri") == "http://example.org/x")
    assert(conv.getAs[java.sql.Timestamp]("warc_date").toInstant ==
      java.time.Instant.parse("2024-03-01T12:34:56Z"))
    assert(new String(conv.getAs[Array[Byte]]("payload"),
      StandardCharsets.UTF_8) == "héllo wärld")
    assert(conv.getAs[Long]("content_length") ==
      "héllo wärld".getBytes(StandardCharsets.UTF_8).length)
    assert(conv.getAs[Map[String, String]]("headers")("Content-Type") == "text/plain")
  }

  test("gzip member-per-record decodes as one stream") {
    // two separate gzip members concatenated — the Common Crawl layout
    val bos = new java.io.ByteArrayOutputStream()
    val half = goldenBytes.length // write the whole doc twice as 2 members
    for (_ <- 0 until 2) {
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(goldenBytes); gz.finish()
    }
    val rows = decodeBytes(bos.toByteArray, "multi.warc.gz").collect()
    assert(rows.length == 4, s"expected 2 members x 2 records, got ${rows.length} (doc $half bytes)")
  }

  test("a record SPLIT across gzip members buffers and parses — streaming, not whole-file") {
    // the streaming member parser must reassemble a record whose bytes
    // straddle a member boundary (and whose members each hold fractions
    // of several records) — the shape that proves decode no longer
    // concatenates the whole archive before parsing
    val bos = new java.io.ByteArrayOutputStream()
    val cut = goldenBytes.length / 3
    Seq(goldenBytes.slice(0, cut),
        goldenBytes.slice(cut, 2 * cut),
        goldenBytes.slice(2 * cut, goldenBytes.length)).foreach { part =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(part); gz.finish()
    }
    val rows = decodeBytes(bos.toByteArray, "split.warc.gz")
      .select("record_id").as[String].collect().sorted
    assert(rows.toSeq == Seq("<urn:uuid:aaa-111>", "<urn:uuid:bbb-222>"))
    // and a truncated FINAL record (archive ends mid-payload) stays loud
    val bos2 = new java.io.ByteArrayOutputStream()
    val gz2 = new java.util.zip.GZIPOutputStream(bos2)
    gz2.write(goldenBytes.dropRight(10)); gz2.finish()
    val e = intercept[Exception](decodeBytes(bos2.toByteArray, "trunc.warc.gz").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ").contains("warc:"))
  }

  test("streaming gunzip reads lazily from the FS stream — bounded, not whole-file") {
    // three members; measure how much of the underlying stream the FIRST
    // next() pulls. Bounded = one member's compressed bytes + at most one
    // 64 KB read-ahead block — NOT the archive (the pre-fix decode
    // materialized the whole compressed shard per task: 32 tasks x 1 GB
    // Common Crawl shards = a quarter of the heap before decode began)
    val memberBytes = (1 to 3).map { i =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(Array.fill[Byte](200 * 1024)((i % 7).toByte)); gz.finish()
      bos.toByteArray
    }
    val archive = memberBytes.reduce(_ ++ _)
    var readSoFar = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(archive)
      override def read(): Int = { val b = in.read(); if (b >= 0) readSoFar += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) readSoFar += n; n
      }
    }
    val it = WarcBridge.gunzipMembersStream(counting, "lazy.warc.gz")
    val first = it.next()
    assert(first.length == 200 * 1024)
    assert(readSoFar <= memberBytes.head.length + 64 * 1024 + 16,
      s"first member pulled $readSoFar of ${archive.length} archive bytes — " +
        "the decode is slurping ahead instead of streaming")
    assert(it.next().length == 200 * 1024)
    assert(it.next().length == 200 * 1024)
    assert(!it.hasNext)
    // laziness also means a CORRUPT tail cannot fail records before it:
    // first member decodes fine from an archive whose second member is cut
    val cut = archive.take(memberBytes.head.length + 50)
    val it2 = WarcBridge.gunzipMembersStream(
      new java.io.ByteArrayInputStream(cut), "cut.warc.gz")
    assert(it2.next().length == 200 * 1024)
    val e = intercept[Exception](it2.next())
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("strict mode fails loudly: truncation, bare LF, bad length") {
    def err(bytes: Array[Byte]): String = {
      val t = intercept[Exception](decodeBytes(bytes, "bad.warc").collect())
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    }
    val truncated = goldenBytes.dropRight(20)
    assert(err(truncated).contains("warc:"))
    val bareLf = new String(goldenBytes, StandardCharsets.UTF_8)
      .replaceFirst("\r\n", "\n").getBytes(StandardCharsets.UTF_8)
    assert(err(bareLf).contains("bare LF"))
    val badLen = new String(goldenBytes, StandardCharsets.UTF_8)
      .replaceFirst("Content-Length: \\d+", "Content-Length: nope")
      .getBytes(StandardCharsets.UTF_8)
    assert(err(badLen).contains("Content-Length"))
  }

  test("a corrupt SECOND gzip member fails loudly instead of silently dropping tail records") {
    // the JDK's multi-member GZIPInputStream treats a malformed subsequent
    // member as clean EOF — the exact silent-tail-drop this parser refuses
    val bos = new java.io.ByteArrayOutputStream()
    val gz1 = new java.util.zip.GZIPOutputStream(bos)
    gz1.write(goldenBytes); gz1.finish()
    bos.write(Array[Byte](0x1f, 0x00, 0x12, 0x34)) // bad magic after member 1
    val t = intercept[Exception](decodeBytes(bos.toByteArray, "corrupt.warc.gz").collect())
    val msgs = Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("bad magic"), msgs)
    // and a flipped payload bit inside a member is a CRC failure, not EOF
    val good = {
      val b = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(b); g.write(goldenBytes); g.finish()
      b.toByteArray
    }
    good(good.length - 12) = (good(good.length - 12) ^ 0x01).toByte
    val t2 = intercept[Exception](decodeBytes(good, "bitflip.warc.gz").collect())
    val msgs2 = Iterator.iterate(t2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs2.contains("warc:"), msgs2)
  }

  test("spec conformance: case-insensitive names, folded lines, repeated fields") {
    val p = "x"
    val doc = crlf(
      s"""WARC/1.0
         |warc-type: conversion
         |WARC-RECORD-ID: <urn:uuid:ci-1>
         |warc-date: 2024-03-01T00:00:00Z
         |WARC-Target-URI: http://example.org/very/
         | long/folded/path
         |WARC-Concurrent-To: <urn:uuid:other-1>
         |WARC-Concurrent-To: <urn:uuid:other-2>
         |content-length: 1
         |
         |""".stripMargin) + p + "\r\n\r\n"
    val r = decodeBytes(doc.getBytes(StandardCharsets.UTF_8), "ci.warc").collect()(0)
    assert(r.getString(0) == "conversion" && r.getString(1) == "<urn:uuid:ci-1>")
    assert(r.getAs[String]("target_uri") == "http://example.org/very/ long/folded/path")
    assert(r.getAs[Map[String, String]]("headers")("WARC-Concurrent-To") ==
      "<urn:uuid:other-1>, <urn:uuid:other-2>")
  }

  test("non-ASCII header values round-trip as UTF-8") {
    val dir = Files.createTempDirectory("graft-warc-u8").toString
    val src = Seq(("conversion", "<urn:uuid:u8>", "2024-01-01 00:00:00",
      "http://example.org/café/中文", "text/plain", "p"))
      .toDF("warc_type", "record_id", "ts", "target_uri", "content_type", "body")
      .select(col("warc_type"), col("record_id"),
        col("ts").cast("timestamp").as("warc_date"), col("target_uri"),
        col("content_type"), encode(col("body"), "UTF-8").as("payload"))
    WarcBridge.write(src, dir)
    val back = WarcBridge.decode(spark.read.format("binaryFile").load(dir)).collect()(0)
    assert(back.getAs[String]("target_uri") == "http://example.org/café/中文")
  }

  test("writer refuses header injection and null mandatory fields loudly") {
    val dir = Files.createTempDirectory("graft-warc-inj").toString
    def src(uri: String) = Seq(("conversion", "<urn:uuid:i>", uri))
      .toDF("warc_type", "record_id", "target_uri")
      .select(col("warc_type"), col("record_id"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("warc_date"),
        col("target_uri"), lit("text/plain").as("content_type"),
        encode(lit("p"), "UTF-8").as("payload"))
    val t = intercept[Exception](
      WarcBridge.write(src("http://x/\r\nContent-Type: evil"), dir))
    val msgs = Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("header injection"), msgs)
    // failed attempts leave no visible file behind (hidden in-progress only)
    val visible = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(visible.isEmpty, visible.mkString(", "))
  }

  test("writer round-trip preserves every field and payload byte") {
    val dir = Files.createTempDirectory("graft-warc-w").toString
    val src = Seq(
      ("response", "<urn:uuid:1>", "2024-01-02 03:04:05", "http://a/", "text/html", "x" * 5000),
      ("conversion", "<urn:uuid:2>", "2024-01-02 03:04:06", null, null, "ünïcøde")
    ).toDF("warc_type", "record_id", "ts", "target_uri", "content_type", "body")
      .select(col("warc_type"), col("record_id"),
        col("ts").cast("timestamp").as("warc_date"), col("target_uri"),
        col("content_type"), encode(col("body"), "UTF-8").as("payload"))
    WarcBridge.write(src.repartition(1), dir)
    val back = WarcBridge.decode(spark.read.format("binaryFile").load(dir))
      .select("warc_type", "record_id", "warc_date", "target_uri",
        "content_type", "payload")
    assert(back.count() == 2)
    assert(back.exceptAll(src.select("warc_type", "record_id", "warc_date",
      "target_uri", "content_type", "payload")).isEmpty)
  }

  test("re-running write overwrites per-partition files — no duplicate records") {
    // the commit protocol names final files by partition id only, so a
    // retried/speculative attempt (simulated here by a second full write)
    // REPLACES partition files instead of landing a second final file
    // that would duplicate every record on re-read
    val dir = Files.createTempDirectory("graft-warc-rw").toString
    val src = Seq(
      ("response", "<urn:uuid:r1>", "2024-01-02 03:04:05", "http://a/", "text/html", "one"),
      ("response", "<urn:uuid:r2>", "2024-01-02 03:04:06", "http://b/", "text/html", "two")
    ).toDF("warc_type", "record_id", "ts", "target_uri", "content_type", "body")
      .select(col("warc_type"), col("record_id"),
        col("ts").cast("timestamp").as("warc_date"), col("target_uri"),
        col("content_type"), encode(col("body"), "UTF-8").as("payload"))
    WarcBridge.write(src.repartition(2), dir)
    WarcBridge.write(src.repartition(2), dir) // the "second attempt"
    val back = WarcBridge.decode(spark.read.format("binaryFile").load(dir))
    assert(back.count() == 2, "second write must replace, not duplicate")
    assert(back.select("record_id").distinct().count() == 2)
  }

  test("cloudfiles format warc refuses schema declarations and evolution loudly") {
    val dir = Files.createTempDirectory("graft-warc-cf").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp")
    Files.write(Paths.get(s"$dir/landing.warc"), goldenBytes)
    def yaml(extra: String): String =
      s"""pipeline: w
         |flowgroup: f
         |actions:
         |  - name: l
         |    type: load
         |    source:
         |      type: cloudfiles
         |      path: $dir
         |      format: warc
         |      readMode: stream
         |$extra
         |    target: v
         |  - name: w
         |    type: write
         |    source: v
         |    write_target: {type: streaming_table, table: t}
         |""".stripMargin
    val e1 = intercept[YamlConfig.ConfigError](runner.run(
      YamlConfig.parseFlowGroup(yaml("      table_schema: \"x INT\""))))
    assert(e1.getMessage.contains("FIXED schema"))
    val e2 = intercept[YamlConfig.ConfigError](runner.run(YamlConfig.parseFlowGroup(
      yaml("      options: {\"cloudFiles.schemaEvolutionMode\": addNewColumns}"))))
    assert(e2.getMessage.contains("does not apply"))
    val e3 = intercept[YamlConfig.ConfigError](runner.run(YamlConfig.parseFlowGroup(
      yaml("      options: {\"cloudFiles.rescuedDataColumn\": _rescued}"))))
    assert(e3.getMessage.contains("rescuedDataColumn"), e3.getMessage)
    // and the happy path ingests the golden records
    runner.run(YamlConfig.parseFlowGroup(yaml("")))
    assert(store.read("t").count() == 2)
  }
}
