package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import graft.config.YamlConfig.ConfigError

/** WARC (ISO 28500) ingestion without any external connector — the
  * container format Common Crawl publishes (`.warc.gz` response archives
  * and `.wet.gz` extracted-text "conversion" records), i.e. the raw input
  * of a real pretraining corpus pipeline. Same integration shape as
  * [[AvroBridge]]: `binaryFile` lists the files (batch or stream — WARC
  * gzip members are not split-points, so the FILE is the parallelism unit,
  * exactly how Common Crawl shards its corpus into ~1 GB files), and the
  * bridge decodes records with a per-file streaming parser.
  *
  * Unlike avro, a WARC record's shape is FIXED — [[recordSchema]] — so
  * schema declaration/inference/evolution/rescue do not apply (the
  * cloudfiles integration refuses them loudly); the PAYLOAD stays `binary`
  * with its declared Content-Type beside it, the multimodal convention
  * (`graft.multimodal`) for opaque media.
  *
  * Parser posture: strict per the spec (version line `WARC/1.0`/`1.1`,
  * CRLF line endings, mandatory WARC-Type/WARC-Record-ID/WARC-Date/
  * Content-Length, two CRLFs after each payload) with LOUD errors naming
  * file and record offset — a truncated or corrupt archive fails the
  * batch, it does not silently drop tail records. Multi-member gzip
  * (member-per-record, how Common Crawl writes) and single-member both
  * decode through the same JDK stream. */
object WarcBridge {

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("warc_date", TimestampType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("headers", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Decode a `binaryFile` frame (streaming or batch) of `.warc` /
    * `.warc.gz` / `.wet(.gz)` files into [[recordSchema]] rows. */
  def decode(bin: DataFrame): DataFrame =
    bin.select("path", "content").mapPartitions { it =>
      it.flatMap { fileRow =>
        val path = fileRow.getString(0)
        val bytes = fileRow.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty[Row]
        else {
          val in: InputStream =
            if (path.endsWith(".gz"))
              // JDK GZIPInputStream reads CONCATENATED members — the
              // member-per-record layout decodes as one stream
              new GZIPInputStream(new ByteArrayInputStream(bytes))
            else new ByteArrayInputStream(bytes)
          recordIterator(new java.io.BufferedInputStream(in, 64 * 1024), path)
        }
      }
    }(Encoders.row(recordSchema))

  /** Sequential record parser over one (decompressed) WARC stream. */
  private def recordIterator(in: InputStream, path: String): Iterator[Row] =
    new Iterator[Row] {
      private var recordIdx = 0
      private var nextRow: Row = _
      private var done = false

      private def fail(msg: String): Nothing =
        throw ConfigError(s"warc: '$path' record $recordIdx: $msg")

      /** One CRLF-terminated header line; None on clean EOF at a record
        * boundary. */
      private def readLine(atBoundary: Boolean): Option[String] = {
        val sb = new java.lang.StringBuilder(96)
        var c = in.read()
        if (c == -1) {
          if (atBoundary) { in.close(); return None }
          fail("unexpected end of stream inside a record header")
        }
        while (c != '\r') {
          if (c == -1) fail("unexpected end of stream inside a header line")
          if (c == '\n') fail("bare LF in header (WARC requires CRLF)")
          sb.append(c.toChar)
          c = in.read()
        }
        if (in.read() != '\n') fail("CR not followed by LF in header")
        Some(sb.toString)
      }

      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) fail(s"payload truncated at $off of $n bytes")
          off += r
        }
        buf
      }

      private def expectCrlf(what: String): Unit =
        if (in.read() != '\r' || in.read() != '\n')
          fail(s"missing CRLF $what")

      private def advance(): Unit = {
        readLine(atBoundary = true) match {
          case None => done = true
          case Some(version) =>
            if (version != "WARC/1.0" && version != "WARC/1.1")
              fail(s"bad version line '$version'")
            val headers = Iterator.continually(readLine(atBoundary = false).get)
              .takeWhile(_.nonEmpty)
              .map { line =>
                val i = line.indexOf(':')
                if (i < 1) fail(s"malformed header line '$line'")
                line.substring(0, i).trim -> line.substring(i + 1).trim
              }.toIndexedSeq
            val h = headers.toMap
            def mandatory(k: String): String =
              h.getOrElse(k, fail(s"missing mandatory header $k"))
            val len = try mandatory("Content-Length").toLong
              catch { case _: NumberFormatException =>
                fail(s"non-numeric Content-Length '${h("Content-Length")}'") }
            if (len < 0 || len > Int.MaxValue - 8)
              fail(s"unsupported Content-Length $len")
            val date = try java.sql.Timestamp.from(
                java.time.Instant.parse(mandatory("WARC-Date")))
              catch { case _: java.time.format.DateTimeParseException =>
                fail(s"bad WARC-Date '${h("WARC-Date")}'") }
            val payload = readFully(len.toInt)
            expectCrlf("after payload")
            expectCrlf("closing the record (WARC requires two)")
            nextRow = Row(mandatory("WARC-Type"), mandatory("WARC-Record-ID"),
              date, h.get("WARC-Target-URI").orNull,
              h.get("Content-Type").orNull, len, h, payload)
            recordIdx += 1
        }
      }

      def hasNext: Boolean = {
        if (!done && nextRow == null) advance()
        !done
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }

  /** Write rows of [[recordSchema]]-compatible columns `(warc_type,
    * record_id, warc_date, target_uri, content_type, payload)` as WARC
    * files, one per partition, gzipped member-per-record when `gzip` —
    * the fixture/egress twin of [[decode]], byte-compatible with any
    * spec-conforming reader. */
  def write(df: DataFrame, dir: String, gzip: Boolean = true): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val cols = Seq("warc_type", "record_id", "warc_date", "target_uri",
      "content_type", "payload")
    val ext = if (gzip) ".warc.gz" else ".warc"
    df.selectExpr(cols: _*).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val out = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d-$attempt$ext")
        val os = out.getFileSystem(conf.value).create(out, true)
        try it.foreach { r =>
          val payload = r.getAs[Array[Byte]](5)
          val head = new java.lang.StringBuilder(256)
          head.append("WARC/1.0\r\n")
          head.append("WARC-Type: ").append(r.getString(0)).append("\r\n")
          head.append("WARC-Record-ID: ").append(r.getString(1)).append("\r\n")
          head.append("WARC-Date: ").append(
            r.getTimestamp(2).toInstant.toString).append("\r\n")
          if (!r.isNullAt(3))
            head.append("WARC-Target-URI: ").append(r.getString(3)).append("\r\n")
          if (!r.isNullAt(4))
            head.append("Content-Type: ").append(r.getString(4)).append("\r\n")
          head.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
          val rec = new java.io.ByteArrayOutputStream(256 + payload.length)
          rec.write(head.toString.getBytes(StandardCharsets.UTF_8))
          rec.write(payload)
          rec.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
          if (gzip) {
            // one gzip member per record — Common Crawl's layout, which
            // lets spec-conforming readers skip records by member
            val gz = new java.util.zip.GZIPOutputStream(os)
            gz.write(rec.toByteArray)
            gz.finish()
          } else os.write(rec.toByteArray)
        } finally os.close()
      }
    }
  }
}
