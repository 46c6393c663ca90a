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
