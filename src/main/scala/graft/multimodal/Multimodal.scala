package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode / feature-extraction plumbing.
  *
  * Image and WAV audio decode are REAL: [[ImageIoDecoder]] reads PNG/JPEG/
  * GIF/BMP headers with the JDK's `javax.imageio` — width/height/channels
  * without materializing the pixel raster — and [[WavDecoder]] parses
  * RIFF/WAVE chunk headers (channels, sample rate, duration) without
  * touching the sample data, so a 100 TB media scan pays header-parse cost
  * only. Compressed audio and video kernels remain stubbed (no codec
  * libraries in this container): [[StubDecoder]] produces deterministic fake
  * features from the bytes, and every real kernel falls back to it for any
  * payload it cannot claim. Each row records WHICH kernel produced its
  * features (`decoder` column), so dirty-corpus rows that degraded to the
  * stub are identifiable without re-decoding. Everything around the kernels
  * is real and tested: the schema contract, the `mapPartitions` batching
  * shape (the Scala analogue of `mapInPandas` — per-partition iterator,
  * amortized per-batch setup, no driver collect), partition sizing for blob
  * columns, and metadata projection.
  *
  * Scale notes: blob rows are large — callers should size partitions by bytes
  * (`repartitionForBlobs`), not rows, so a 100 TB media table yields
  * executor-memory-sized tasks. Decode runs once per row inside a single
  * partition pass; features land in a flat struct for columnar storage.
  */
object Multimodal {

  /** Canonical media-column schema: (media binary, mime string, meta map). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("meta", MapType(StringType, StringType))))

  /** `media_id` is boxed (the [[Frame]] convention): a null id row passes
    * through instead of crashing the tuple deserializer mid-scan — the
    * dirty-corpus never-throw posture of the decode kernels. */
  final case class MediaFeatures(
      media_id: java.lang.Long, mime: String, n_bytes: Long,
      width: Int, height: Int, channels: Int,
      sample_rate: Int, duration_ms: Long,
      decoder: String, sha_prefix: String)

  /** One kernel's output: spatial dims for images, sample rate/duration for
    * audio (zero where inapplicable), plus the kernel name — consumers can
    * filter stub-degraded rows by `decoder == "stub"`. */
  final case class Decoded(width: Int, height: Int, channels: Int,
      sampleRate: Int = 0, durationMs: Long = 0L, decoder: String)

  /** The decode seam: images and WAV are handled natively; a real deployment
    * plugs ffmpeg/libsndfile here for compressed audio/video. The stub
    * derives deterministic pseudo-dimensions from a content hash so tests
    * (and the DuckDB oracle) can assert exact values. */
  trait Decoder extends Serializable {
    def decode(mime: String, bytes: Array[Byte]): Decoded
  }

  object StubDecoder extends Decoder {
    // one digest per thread, not per decode: getInstance in the per-row
    // loop is a JCA provider lookup + allocation (digest() resets the
    // instance, so reuse is safe; ThreadLocal because decoders are
    // partition-shared singletons called from many task threads)
    private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
      () => java.security.MessageDigest.getInstance("MD5"))
    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      // Deterministic fake for formats with no decoder in this environment
      // (compressed audio/video). Pseudo-dimensions derive from the
      // big-endian first 4 md5 bytes (= first 8 hex chars), so any
      // md5-capable engine — including the DuckDB correctness oracle —
      // replays them exactly.
      val d = md5.get().digest(bytes)
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      val w = 64 + (h % 1024).toInt
      val ht = 64 + ((h / 1024) % 1024).toInt
      // mediaSchema declares mime NULLABLE — a null-mime row must degrade
      // to stub features like every other dirty row, not NPE the scan
      // (thrown from inside ImageIoDecoder's catch handler, it would
      // escape the NonFatal net entirely)
      val ch = if (mime != null && mime.startsWith("audio")) 1 else 3
      Decoded(w, ht, ch, decoder = "stub")
    }
  }

  /** Real image kernel: header-only decode via the JDK's `javax.imageio`.
    * `getWidth(0)`/`getHeight(0)` parse only the format header (PNG IHDR,
    * JPEG SOF, …) — no pixel raster is allocated, which is what makes this
    * viable inside a full-corpus scan. The input stream is an explicit
    * `MemoryCacheImageInputStream` (the bytes are already in memory);
    * `ImageIO.createImageInputStream` would default to a FILE-cache stream —
    * a temp file created and deleted per row, per-blob disk I/O that
    * undercuts the header-parse-only claim. Channels come from the reader's
    * declared image type (RGB→3, RGBA→4, gray→1). Any payload no installed
    * reader claims — wrong magic bytes, truncated header, or a non-image
    * MIME — falls back to [[StubDecoder]], so mixed/dirty corpora degrade
    * deterministically instead of throwing mid-scan. */
  object ImageIoDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      if (bytes.isEmpty) return StubDecoder.decode(mime, bytes)
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) StubDecoder.decode(mime, bytes)
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true) // seekForwardOnly + ignoreMetadata
              val w = r.getWidth(0)
              val h = r.getHeight(0)
              val types = r.getImageTypes(0)
              val ch = if (types.hasNext) types.next().getNumComponents else 3
              Decoded(w, h, ch, decoder = "imageio")
            } finally r.dispose()
          }
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => StubDecoder.decode(mime, bytes)
      }
    }
  }

  /** Real audio kernel: RIFF/WAVE header parse — pure-JVM byte arithmetic,
    * no sample data touched. Walks the chunk list (id + little-endian size,
    * even-padded) for `fmt ` (channels, sample rate, byte rate) and `data`
    * (payload size → duration). Any structural violation — short header,
    * wrong magic, missing chunks, zero byte rate — falls back to
    * [[StubDecoder]], same dirty-corpus posture as the image kernel. */
  object WavDecoder extends Decoder {
    def claims(bytes: Array[Byte]): Boolean =
      bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      if (!claims(bytes)) return StubDecoder.decode(mime, bytes)
      var channels = 0; var sampleRate = 0; var byteRate = 0L
      var dataSize = -1L
      var i = 12L // Long cursor: a hostile 32-bit chunk size must not wrap
      while (i + 8 <= bytes.length && (channels == 0 || dataSize < 0)) {
        val p = i.toInt
        val id = new String(bytes, p, 4, "US-ASCII")
        val size = le32(bytes, p + 4)
        // a fmt chunk declaring < 16 bytes cannot hold the PCM header —
        // reading past it would interpret the NEXT chunk's bytes as
        // channels/rates; treat as structural violation (stub fallback)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length) {
          channels = le16(bytes, p + 10)
          sampleRate = le32(bytes, p + 12).toInt
          byteRate = le32(bytes, p + 16)
        } else if (id == "data") {
          // a streamed/truncated file may declare more than it carries
          dataSize = math.min(size, (bytes.length - i - 8))
        }
        i += 8 + size + (size & 1) // chunks pad to even offsets
      }
      if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataSize < 0)
        StubDecoder.decode(mime, bytes)
      else Decoded(0, 0, channels, sampleRate,
        dataSize * 1000L / byteRate, decoder = "wav")
    }
  }

  /** ID3v2 tag length (0 when absent): "ID3" + version(2) + flags(1) +
    * 4-byte SYNCSAFE size (7 bits per byte — a raw 32-bit read would
    * overshoot into audio data), plus 10 more when the v2.4 footer flag
    * (0x10) is set — the declared size excludes both header and footer.
    * MP3 files almost always carry one; FLAC files occasionally do. */
  private def id3Skip(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
        (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0)
      10 + ((b(6) & 0x7F) << 21 | (b(7) & 0x7F) << 14 |
        (b(8) & 0x7F) << 7 | (b(9) & 0x7F)) +
        (if ((b(5) & 0x10) != 0) 10 else 0)
    else 0

  /** Real FLAC kernel: the mandatory first metadata block is STREAMINFO
    * (34 bytes), whose bytes 10..17 are one big-endian 64-bit group —
    * 20-bit sample rate, 3-bit channels-1, 5-bit bits-per-sample-1, 36-bit
    * total samples — so duration is exact, not estimated. Header-only, no
    * frame data touched; structural violations fall back to the stub like
    * every kernel. */
  object FlacDecoder extends Decoder {
    def claims(bytes: Array[Byte]): Boolean = {
      val o = id3Skip(bytes)
      bytes.length >= o + 4 && bytes(o) == 'f' && bytes(o + 1) == 'L' &&
        bytes(o + 2) == 'a' && bytes(o + 3) == 'C'
    }

    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      val o = id3Skip(bytes)
      // magic(4) + block header(4) + STREAMINFO(34)
      if (!claims(bytes) || bytes.length < o + 4 + 4 + 34)
        return StubDecoder.decode(mime, bytes)
      val blockType = bytes(o + 4) & 0x7F // bit 7 = last-block flag
      val blockLen = ((bytes(o + 5) & 0xFF) << 16) |
        ((bytes(o + 6) & 0xFF) << 8) | (bytes(o + 7) & 0xFF)
      if (blockType != 0 || blockLen < 34) return StubDecoder.decode(mime, bytes)
      val si = o + 8 // STREAMINFO start
      var g = 0L // the 64-bit sr/ch/bps/samples group at STREAMINFO+10
      var i = 0
      while (i < 8) { g = (g << 8) | (bytes(si + 10 + i) & 0xFFL); i += 1 }
      val sampleRate = (g >>> 44).toInt
      val channels = ((g >>> 41) & 0x7).toInt + 1
      val totalSamples = g & 0xFFFFFFFFFL // 36 bits
      if (sampleRate <= 0) return StubDecoder.decode(mime, bytes)
      Decoded(0, 0, channels, sampleRate,
        totalSamples * 1000L / sampleRate, decoder = "flac")
    }
  }

  /** Real MP3 kernel: skip any ID3v2 tag, then parse the first MPEG audio
    * frame header (4 bytes big-endian): version, layer, bitrate index,
    * sample-rate index, channel mode. Duration is the CBR estimate
    * `audio_bytes * 8 / bitrate` — exact for constant-bitrate files, an
    * approximation for VBR (parsing every frame would defeat the
    * header-only contract). Claims only a VALID Layer III header — the
    * 11-bit sync alone would false-positive on arbitrary binary. */
  object Mp3Decoder extends Decoder {
    private val BitrateV1L3 = // kbps, index 1..14 (0 = free, 15 = bad)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val BitrateV2L3 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    private val SampleRates = Map( // version bits -> rates by index
      3 -> Array(44100, 48000, 32000), // MPEG1
      2 -> Array(22050, 24000, 16000), // MPEG2
      0 -> Array(11025, 12000, 8000))  // MPEG2.5

    private def header(b: Array[Byte], o: Int): Option[(Int, Int, Int)] = {
      // returns (sampleRate, channels, bitrateBps) for a valid L3 header
      if (b.length < o + 4) return None
      if ((b(o) & 0xFF) != 0xFF || (b(o + 1) & 0xE0) != 0xE0) return None
      val version = (b(o + 1) >> 3) & 0x3
      val layer = (b(o + 1) >> 1) & 0x3
      if (version == 1 || layer != 1) return None // reserved version / not Layer III
      val brIdx = (b(o + 2) >> 4) & 0xF
      val srIdx = (b(o + 2) >> 2) & 0x3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val sr = SampleRates(version)(srIdx)
      val kbps = (if (version == 3) BitrateV1L3 else BitrateV2L3)(brIdx)
      val channels = if (((b(o + 3) >> 6) & 0x3) == 3) 1 else 2
      Some((sr, channels, kbps * 1000))
    }

    def claims(bytes: Array[Byte]): Boolean =
      header(bytes, id3Skip(bytes)).isDefined

    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      val o = id3Skip(bytes)
      header(bytes, o) match {
        case None => StubDecoder.decode(mime, bytes)
        case Some((sr, ch, bps)) =>
          Decoded(0, 0, ch, sr,
            (bytes.length - o).toLong * 8000L / bps, decoder = "mp3")
      }
    }
  }

  /** Real MP4/MOV kernel: ISO-BMFF box walk — pure-JVM byte arithmetic over
    * the container structure (big-endian size + fourcc type, 64-bit
    * `largesize` when size==1, to-EOF when size==0). Dimensions come from
    * the first `trak` whose `tkhd` declares a nonzero 16.16 fixed-point
    * width/height (video tracks; audio tracks declare 0×0), duration from
    * `mvhd`'s timescale+duration — exact, not estimated. Header-only: no
    * sample data (`mdat`) is touched; a faststart file carries `moov`
    * before `mdat`, so the features need only leading bytes. Structural
    * violations (truncated boxes, sizes smaller than their own header)
    * fall back to [[StubDecoder]] like every kernel. */
  object Mp4Decoder extends Decoder {
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    private def be64(b: Array[Byte], i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v = (v << 8) | (b(i + k) & 0xFFL); k += 1 }; v
    }

    def claims(bytes: Array[Byte]): Boolean =
      bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p'

    /** All child boxes of `[start, end)` as (type, payloadStart, payloadEnd);
      * a box whose declared size is structurally impossible truncates the
      * walk (returning what parsed so far) rather than looping. */
    private def children(b: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val p = i.toInt
        val size0 = be32(b, p)
        val typ = new String(b, p + 4, 4, "US-ASCII")
        val (size, hdr) =
          if (size0 == 1 && i + 16 <= end) (be64(b, p + 8), 16L)
          else if (size0 == 0) (end - i, 8L) // box extends to EOF
          else (size0, 8L)
        if (size < hdr) ok = false // impossible size: stop the walk
        else {
          out += ((typ, i + hdr, math.min(i + size, end)))
          i += size
        }
      }
      out.toSeq
    }
    private def find(b: Array[Byte], start: Long, end: Long, typ: String) =
      children(b, start, end).find(_._1 == typ)

    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      if (!claims(bytes)) return StubDecoder.decode(mime, bytes)
      val r = for {
        (_, ms, me) <- find(bytes, 0L, bytes.length.toLong, "moov")
        (_, hs, he) <- find(bytes, ms, me, "mvhd")
        if he - hs >= 20 // v0 needs 20 payload bytes through duration
        v1 = bytes(hs.toInt) == 1 // version byte; v1 = 64-bit times
        // a v1 box too short for its own 64-bit fields is a structural
        // violation (stub), NOT a fall-through to v0 offsets — those would
        // read creation-time bytes as timescale/duration, silently wrong
        if !v1 || he - hs >= 32
      } yield {
        val p = hs.toInt
        val (timescale, duration) =
          if (v1) (be32(bytes, p + 20), be64(bytes, p + 24))
          else (be32(bytes, p + 12), be32(bytes, p + 16))
        val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
        // first trak with a nonzero tkhd width/height = the video track
        val dims = children(bytes, ms, me).collect {
          case ("trak", ts, te) => tkhdDims(bytes, ts, te)
        }.flatten.find { case (w, h) => w > 0 && h > 0 }
        val (w, h) = dims.getOrElse((0, 0))
        Decoded(w, h, 0, 0, durMs, decoder = "mp4")
      }
      r.getOrElse(StubDecoder.decode(mime, bytes))
    }

    /** Absolute (offset, size) of every sample in the first trak carrying a
      * complete sample table — the ISO-BMFF chunk/sample bookkeeping that
      * locates each frame's payload WITHOUT any codec: `stsz` (per-sample
      * sizes), `stsc` (sample→chunk runs), `stco`/`co64` (chunk file
      * offsets). Offsets are file-absolute, so a frame is a byte slice of
      * the original blob. None when the magic or any table is missing /
      * malformed — callers fall back to the stub slice. */
    def sampleTable(bytes: Array[Byte]): Option[Vector[(Long, Long)]] =
      if (!claims(bytes)) None
      else find(bytes, 0L, bytes.length.toLong, "moov").flatMap { case (_, ms, me) =>
        // prefer the VIDEO trak (nonzero tkhd dims): an audio-first mux
        // would otherwise serve compressed audio packets as "frames".
        // Lazy two-pass scan — table parsing (up to MaxTableEntries of
        // allocation per trak) runs only until the first usable trak, not
        // eagerly for every trak of every blob in the partition scan
        val traks = children(bytes, ms, me).collect { case ("trak", ts, te) => (ts, te) }
        def firstTable(sel: ((Long, Long)) => Boolean) = traks.iterator
          .filter(sel).map { case (ts, te) => trakSamples(bytes, ts, te) }
          .collectFirst { case Some(v) if v.nonEmpty => v }
        val isVideo = (t: (Long, Long)) =>
          tkhdDims(bytes, t._1, t._2).exists { case (w, h) => w > 0 && h > 0 }
        // same strictness as the MKV path: a file WITH a video trak whose
        // sample table is unusable yields None (callers get the stub slice),
        // never another trak's audio packets dressed up as frames; the
        // any-trak fallback exists only for files with no video trak at all
        if (traks.exists(isVideo)) firstTable(isVideo)
        else firstTable(_ => true)
      }

    /** The tkhd 16.16 fixed-point dimensions of one trak — the single
      * version-aware layout parse shared by [[decode]] (dims reporting)
      * and [[sampleTable]] (video-trak selection), so the two can never
      * diverge. Guarded for empty/truncated payloads (stub, not throw). */
    private def tkhdDims(b: Array[Byte], ts: Long, te: Long): Option[(Int, Int)] =
      find(b, ts, te, "tkhd").flatMap { case (_, ks, ke) =>
        if (ke - ks < 1) None
        else {
          val q = ks.toInt
          val wOff = if (b(q) == 1) 88 else 76 // after v1's 64-bit times
          if (ke - ks >= wOff + 8)
            Some(((be32(b, q + wOff) >> 16).toInt,
              (be32(b, q + wOff + 4) >> 16).toInt))
          else None
        }
      }

    private def trakSamples(b: Array[Byte], ts: Long, te: Long): Option[Vector[(Long, Long)]] = for {
      (_, ds, de) <- find(b, ts, te, "mdia")
      (_, fs, fe) <- find(b, ds, de, "minf")
      (_, bs, be) <- find(b, fs, fe, "stbl")
      sizes <- sampleSizes(b, bs, be)
      chunks <- chunkOffsets(b, bs, be)
      runs <- sampleToChunk(b, bs, be)
    } yield assemble(sizes, chunks, runs)

    /** Hostile-header allocation cap: a forged count field must not drive a
      * multi-GB Vector.fill before the truncation checks can bite. 4M
      * samples ≈ 37 h of 30 fps video — far beyond any single blob. */
    private val MaxTableEntries = 4 << 20

    /** stsz: vf(4) + uniform-size(4) + count(4) [+ count × size(4) when the
      * uniform size is 0]. */
    private def sampleSizes(b: Array[Byte], s: Long, e: Long): Option[Vector[Long]] =
      find(b, s, e, "stsz").flatMap { case (_, ps, pe) =>
        if (pe - ps < 12) None
        else {
          val p = ps.toInt
          val uniform = be32(b, p + 4)
          val count = be32(b, p + 8)
          // uniform path: the count has no box-size cross-check (no table
          // follows), so bound it by the blob itself — a sample is at
          // least one byte, so more samples than blob bytes is a forgery
          if (count > MaxTableEntries || count > b.length) None
          else if (uniform != 0) Some(Vector.fill(count.toInt)(uniform))
          else if (pe - ps - 12 < count * 4) None // table truncated
          else Some(Vector.tabulate(count.toInt)(i => be32(b, p + 12 + i * 4)))
        }
      }

    /** stco (32-bit) or co64 (64-bit): vf(4) + count(4) + offsets. */
    private def chunkOffsets(b: Array[Byte], s: Long, e: Long): Option[Vector[Long]] =
      find(b, s, e, "stco").flatMap { case (_, ps, pe) =>
        val p = ps.toInt
        if (pe - ps < 8) None
        else {
          val count = be32(b, p + 4)
          if (count > MaxTableEntries || pe - ps - 8 < count * 4) None
          else Some(Vector.tabulate(count.toInt)(i => be32(b, p + 8 + i * 4)))
        }
      }.orElse(find(b, s, e, "co64").flatMap { case (_, ps, pe) =>
        val p = ps.toInt
        if (pe - ps < 8) None
        else {
          val count = be32(b, p + 4)
          if (count > MaxTableEntries || pe - ps - 8 < count * 8) None
          else Some(Vector.tabulate(count.toInt)(i => be64(b, p + 8 + i * 8)))
        }
      })

    /** stsc: vf(4) + count(4) + count × (first_chunk, samples_per_chunk,
      * sample_description_index) — first_chunk is 1-based, runs extend to
      * the next entry's first_chunk. */
    private def sampleToChunk(b: Array[Byte], s: Long, e: Long): Option[Vector[(Long, Long)]] =
      find(b, s, e, "stsc").flatMap { case (_, ps, pe) =>
        val p = ps.toInt
        if (pe - ps < 8) None
        else {
          val count = be32(b, p + 4)
          if (count > MaxTableEntries || pe - ps - 8 < count * 12) None
          else Some(Vector.tabulate(count.toInt)(i =>
            (be32(b, p + 8 + i * 12), be32(b, p + 12 + i * 12))))
        }
      }

    /** Walk chunks in order, expanding stsc runs, summing sizes within each
      * chunk — yields each sample's absolute (offset, size). Malformed
      * bookkeeping (run starts out of order, more samples than sizes) just
      * truncates the walk: header-only best effort, never a throw. */
    private def assemble(sizes: Vector[Long], chunks: Vector[Long],
        runs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
      val out = Vector.newBuilder[(Long, Long)]
      var sample = 0
      var run = 0
      var chunk = 0 // 0-based
      while (chunk < chunks.size && sample < sizes.size) {
        // advance to the stsc run governing this (1-based) chunk
        while (run + 1 < runs.size && runs(run + 1)._1 <= chunk + 1) run += 1
        val perChunk =
          if (run < runs.size && runs(run)._1 <= chunk + 1) runs(run)._2 else 0L
        var i = 0L
        var off = chunks(chunk)
        while (i < perChunk && sample < sizes.size) {
          out += ((off, sizes(sample)))
          off += sizes(sample)
          sample += 1
          i += 1
        }
        chunk += 1
      }
      out.result()
    }
  }

  /** Real MKV/WebM kernel: EBML walk — variable-length-integer element IDs
    * (marker bits kept, per spec) and sizes (marker stripped; all-ones =
    * unknown size, treated as extends-to-parent-end, the streamed-Segment
    * case). Reads Segment→Info for TimestampScale (ns per tick, default
    * 1 000 000) and Duration (float ticks) — so duration is exact — and
    * Segment→Tracks→TrackEntry→Video for PixelWidth/PixelHeight (Audio's
    * Channels/SamplingFrequency when no video track). Header-only: Cluster
    * payloads are never entered. */
  object MkvDecoder extends Decoder {
    def claims(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && (bytes(0) & 0xFF) == 0x1A && (bytes(1) & 0xFF) == 0x45 &&
        (bytes(2) & 0xFF) == 0xDF && (bytes(3) & 0xFF) == 0xA3

    /** (value, encodedLength); `strip` removes the length-marker bit (sizes)
      * or keeps it (IDs, which the spec compares in full form). */
    private def vint(b: Array[Byte], i: Long, strip: Boolean): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = b(i.toInt) & 0xFF
      if (first == 0) return None // > 8-byte vint: not a valid element here
      val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (i + len > b.length) return None
      var v = (if (strip) first & ((1 << (8 - len)) - 1) else first).toLong
      var k = 1
      while (k < len) { v = (v << 8) | (b((i + k).toInt) & 0xFF); k += 1 }
      Some((v, len))
    }

    /** Child elements of `[start, end)` as (id, payloadStart, payloadEnd). */
    private def children(b: Array[Byte], start: Long, end: Long): Seq[(Long, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var i = start
      var ok = true
      while (ok && i < end) {
        (for {
          (id, idLen) <- vint(b, i, strip = false)
          (sz, szLen) <- vint(b, i + idLen, strip = true)
        } yield {
          val ps = i + idLen + szLen
          // all-value-bits-ones = "unknown size" (streamed Segment):
          // the element runs to the parent's end
          val unknown = sz == (1L << (7 * szLen)) - 1
          val pe = if (unknown) end else math.min(ps + sz, end)
          out += ((id, ps, pe))
          i = if (unknown) end else pe
        }).getOrElse { ok = false }
      }
      out.toSeq
    }
    private def find(b: Array[Byte], s: Long, e: Long, id: Long) =
      children(b, s, e).find(_._1 == id)

    private def uintAt(b: Array[Byte], s: Long, e: Long): Long = {
      var v = 0L; var i = s
      while (i < e) { v = (v << 8) | (b(i.toInt) & 0xFF); i += 1 }; v
    }
    private def floatAt(b: Array[Byte], s: Long, e: Long): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(b, s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(b, s, e))
      case _ => 0.0
    }

    def decode(mime: String, bytes: Array[Byte]): Decoded = {
      if (!claims(bytes)) return StubDecoder.decode(mime, bytes)
      val n = bytes.length.toLong
      val r = find(bytes, 0L, n, 0x18538067L /* Segment */).map { case (_, ss, se) =>
        val info = find(bytes, ss, se, 0x1549A966L /* Info */)
        val scaleNs = info.flatMap { case (_, is, ie) =>
          find(bytes, is, ie, 0x2AD7B1L /* TimestampScale */)
            .map { case (_, vs, ve) => uintAt(bytes, vs, ve) }
        }.filter(_ > 0).getOrElse(1000000L)
        val durTicks = info.flatMap { case (_, is, ie) =>
          find(bytes, is, ie, 0x4489L /* Duration, float ticks */)
            .map { case (_, vs, ve) => floatAt(bytes, vs, ve) }
        }.getOrElse(0.0)
        val durMs = (durTicks * scaleNs / 1e6).toLong
        val entries = trackEntries(bytes, ss, se)
        val video = entries.flatMap { case (es, ee) =>
          find(bytes, es, ee, 0xE0L /* Video */).flatMap { case (_, vs, ve) =>
            for {
              (_, ws, we) <- find(bytes, vs, ve, 0xB0L /* PixelWidth */)
              (_, hs, he) <- find(bytes, vs, ve, 0xBAL /* PixelHeight */)
            } yield (uintAt(bytes, ws, we).toInt, uintAt(bytes, hs, he).toInt)
          }
        }.headOption
        val audio = entries.flatMap { case (es, ee) =>
          find(bytes, es, ee, 0xE1L /* Audio */).map { case (_, as, ae) =>
            val ch = find(bytes, as, ae, 0x9FL /* Channels */)
              .map { case (_, cs, ce) => uintAt(bytes, cs, ce).toInt }.getOrElse(1)
            val sr = find(bytes, as, ae, 0xB5L /* SamplingFrequency */)
              .map { case (_, fs, fe) => floatAt(bytes, fs, fe).toInt }.getOrElse(0)
            (ch, sr)
          }
        }.headOption
        val (w, h) = video.getOrElse((0, 0))
        val (ch, sr) = audio.getOrElse((0, 0))
        Decoded(w, h, ch, sr, durMs, decoder = "mkv")
      }
      r.getOrElse(StubDecoder.decode(mime, bytes))
    }

    /** Absolute (offset, size) of every un-laced (Simple)Block frame across
      * the Segment's Clusters — the MKV counterpart of
      * [[Mp4Decoder.sampleTable]]. A block payload is `track-vint +
      * 2-byte relative timestamp + flags + frame data`; only lacing-free
      * blocks (flags & 0x06 == 0, the common video case) yield a single
      * contiguous frame range. None when the magic is absent or no block
      * parses. */
    /** All TrackEntry spans under the Segment's Tracks element — the one
      * Tracks walk, shared by [[decode]] and [[sampleTable]]. */
    private def trackEntries(b: Array[Byte], ss: Long, se: Long): Seq[(Long, Long)] =
      find(b, ss, se, 0x1654AE6BL /* Tracks */).toSeq
        .flatMap { case (_, ts, te) => children(b, ts, te) }
        .collect { case (0xAEL /* TrackEntry */, es, ee) => (es, ee) }

    def sampleTable(bytes: Array[Byte]): Option[Vector[(Long, Long)]] = {
      if (!claims(bytes)) return None
      find(bytes, 0L, bytes.length.toLong, 0x18538067L /* Segment */).flatMap {
        case (_, ss, se) =>
          // the video TrackEntry's TrackNumber — a muxed file interleaves
          // audio blocks in the same Clusters, and serving Opus packets as
          // "frames" would be silently wrong data. A Video entry whose
          // TrackNumber is missing/unparseable ABORTS to the stub: an
          // unfiltered scan of a known-video file is the exact silent
          // wrongness the filter exists to prevent.
          val videoEntry = trackEntries(bytes, ss, se)
            .find { case (es, ee) => find(bytes, es, ee, 0xE0L /* Video */).isDefined }
          val videoTrack = videoEntry.map { case (es, ee) =>
            find(bytes, es, ee, 0xD7L /* TrackNumber */)
              .map { case (_, ns, ne) => uintAt(bytes, ns, ne) }
          }
          if (videoTrack.exists(_.isEmpty)) return None // video entry, no number
          val wanted: Option[Long] = videoTrack.flatten

          val out = Vector.newBuilder[(Long, Long)]
          var found = false
          def addBlock(bs2: Long, be2: Long): Unit =
            for ((track, tLen) <- vint(bytes, bs2, strip = true)) {
              val dataStart = bs2 + tLen + 3 // rel-timestamp(2) + flags(1)
              val flagsAt = bs2 + tLen + 2
              if (dataStart < be2 && flagsAt < bytes.length &&
                  (bytes(flagsAt.toInt) & 0x06) == 0 &&
                  wanted.forall(_ == track)) {
                out += ((dataStart, be2 - dataStart))
                found = true
              }
            }
          // iterative worklist, NOT recursion: a streamed (unknown-size)
          // Cluster swallows its successors as children, and a blob of N
          // nested unknown-size Clusters must cost O(N) loop iterations —
          // recursion would overflow the stack inside the partition scan.
          // Nested clusters prepend (they sit inside the current span);
          // everything stays in document order, which the evenly-spaced
          // frame sampling depends on.
          var work: List[(Long, Long)] = children(bytes, ss, se).collect {
            case (0x1F43B675L /* Cluster */, cs, ce) => (cs, ce)
          }.toList
          while (work.nonEmpty) {
            val (cs, ce) = work.head
            work = work.tail
            val nested = List.newBuilder[(Long, Long)]
            children(bytes, cs, ce).foreach { case (id, ps, pe) =>
              id match {
                case 0x1F43B675L => nested += ((ps, pe))
                case 0xA3L /* SimpleBlock */ => addBlock(ps, pe)
                case 0xA0L /* BlockGroup */ =>
                  children(bytes, ps, pe).foreach {
                    case (0xA1L /* Block */, bs2, be2) => addBlock(bs2, be2)
                    case _ => ()
                  }
                case _ => ()
              }
            }
            work = nested.result() ++ work
          }
          if (found) Some(out.result()) else None
      }
    }
  }

  /** Default kernel dispatch: audio magics (WAV, FLAC, valid MP3 frame) and
    * container magics (ISO-BMFF ftyp, EBML) → their header kernels,
    * anything else → [[ImageIoDecoder]] (which itself degrades to the
    * stub). Dispatch is by CONTENT magic, not MIME — corpus MIME labels
    * lie. */
  object AutoDecoder extends Decoder {
    def decode(mime: String, bytes: Array[Byte]): Decoded =
      if (WavDecoder.claims(bytes)) WavDecoder.decode(mime, bytes)
      else if (FlacDecoder.claims(bytes)) FlacDecoder.decode(mime, bytes)
      else if (Mp4Decoder.claims(bytes)) Mp4Decoder.decode(mime, bytes)
      else if (MkvDecoder.claims(bytes)) MkvDecoder.decode(mime, bytes)
      else if (Mp3Decoder.claims(bytes)) Mp3Decoder.decode(mime, bytes)
      else ImageIoDecoder.decode(mime, bytes)
  }

  /** Batched feature extraction over a media table — the `mapInPandas`
    * plumbing shape: one pass per partition, per-row decode, typed output
    * via an implicit Encoder. */
  def extractFeatures(media: DataFrame, decoder: Decoder = AutoDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"), col("mime"))
      .as[(java.lang.Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition setup happens once (codec tables, model weights,
        // and the digest instance — getInstance per ROW is a JCA provider
        // lookup + allocation in the hot loop; digest() resets the
        // instance after each call, so one per partition is safe)
        val sha256 = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, bytes, mime) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val d = decoder.decode(mime, b)
          val sha = sha256.digest(b).take(4).map("%02x".format(_)).mkString
          MediaFeatures(id, mime, b.length.toLong, d.width, d.height,
            d.channels, d.sampleRate, d.durationMs, d.decoder, sha)
        }
      }
      .toDF()
  }

  /** `media_id` boxed — same null-id pass-through contract as
    * [[MediaFeatures]]/[[Frame]]. */
  final case class ResizedMedia(media_id: java.lang.Long, bytes: Array[Byte],
      mime: String, width: Int, height: Int, resized: Boolean)

  /** REAL image resize — the one multimodal kernel that by definition must
    * materialize the pixel raster: JDK-decodable payloads (PNG/JPEG/GIF/
    * BMP) larger than the (maxW, maxH) box are bilinear-downscaled
    * aspect-preserving and re-encoded as PNG; already-fitting images and
    * payloads no reader claims pass through byte-identical with
    * `resized = false` (the provenance contract of the decode kernels).
    * No upscaling — training pipelines cap resolution, they don't invent
    * pixels. Alpha survives (ARGB output when the source carries it).
    *
    * Scale note: rasters make rows transiently LARGE — size partitions by
    * bytes ([[repartitionForBlobs]]) before calling this, and expect the
    * output to be smaller than the input (that is the point). In-memory
    * streams only (`ImageIO.setUseCache(false)` per partition) — no
    * per-row temp files on executors. */
  def resizeToFit(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, "resize box must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"), col("mime"))
      .as[(java.lang.Long, Array[Byte], String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // once per partition pass
        rows.map { case (id, bytes, mime) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
            if (img == null) ResizedMedia(id, b, mime, 0, 0, resized = false)
            else if (img.getWidth <= maxW && img.getHeight <= maxH)
              ResizedMedia(id, b, mime, img.getWidth, img.getHeight, resized = false)
            else {
              val s = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
              val nw = math.max(1, math.round(img.getWidth * s).toInt)
              val nh = math.max(1, math.round(img.getHeight * s).toInt)
              val outType =
                if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
                else java.awt.image.BufferedImage.TYPE_INT_RGB
              val out = new java.awt.image.BufferedImage(nw, nh, outType)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedMedia(id, bos.toByteArray, "image/png", nw, nh, resized = true)
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              ResizedMedia(id, b, mime, 0, 0, resized = false)
          }
        }
      }
      .toDF()
  }

  /** Deterministic frame sampling plumbing for video-ish blobs: emits
    * `framesPerItem` (media_id, frame_idx, frame_bytes) rows per input via
    * posexplode — the fan-out shape of real frame extraction, with byte
    * slicing standing in for actual decoding. */
  /** `media_id` is boxed: a null id row passes through (as the original
    * column-expression implementation did) instead of crashing the
    * deserializer mid-job. */
  final case class Frame(media_id: java.lang.Long, frame_idx: Int,
      frame_bytes: Array[Byte])

  def sampleFrames(media: DataFrame, framesPerItem: Int): DataFrame = {
    require(framesPerItem >= 1, s"framesPerItem must be >= 1, got $framesPerItem")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("bytes"))
      .as[(java.lang.Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          // ISO-BMFF blobs with a full sample table, and MKV blobs with
          // parseable Cluster blocks, yield REAL frame payloads: N
          // evenly-spaced samples, each a byte slice at its
          // container-located range — no codec involved, so this works
          // regardless of what encoded the samples
          Mp4Decoder.sampleTable(bytes).orElse(MkvDecoder.sampleTable(bytes)) match {
            case Some(samples) =>
              (0 until framesPerItem).map { i =>
                val idx =
                  if (framesPerItem == 1 || samples.size == 1) 0
                  else ((i.toLong * (samples.size - 1)) / (framesPerItem - 1)).toInt
                val (off, len) = samples(idx)
                val end = math.min(off + len, bytes.length.toLong)
                val fb = if (off >= 0 && off < bytes.length && end > off)
                  java.util.Arrays.copyOfRange(bytes, off.toInt, end.toInt)
                else Array.emptyByteArray // range beyond a truncated blob
                Frame(id, i, fb)
              }
            case None =>
              // stub: a 16-byte slice of the blob stands in for a decoded
              // frame (deterministic; same shape as the pre-kernel path)
              (0 until framesPerItem).map { i =>
                Frame(id, i, bytes.slice(i, math.min(i + 16, bytes.length)))
              }
          }
        }
      }
      .toDF()
  }

  /** Partition a blob table so tasks stay memory-bounded regardless of
    * row width: the partition COUNT comes from the measured total bytes,
    * and rows HASH-distribute across it — byte-balanced in expectation
    * even when blob sizes correlate with ingest order (the earlier range
    * partitioning on media_id gave each partition ~equal ROWS, so a
    * contiguous id range of large videos landed its whole byte weight in
    * a few partitions — the exact OOM this function exists to prevent).
    * Exact byte-balancing would need a global running-sum assignment (one
    * sequential pass); hash distribution gets within sampling noise of it
    * at a fraction of the cost and stays fully parallel. */
  def repartitionForBlobs(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    require(targetBytesPerPartition > 0,
      s"targetBytesPerPartition must be positive, got $targetBytesPerPartition")
    val sized = media.withColumn("__bytes", coalesce(length(col("bytes")).cast("long"), lit(0L)))
    // sum over ZERO rows is NULL — an empty media table (fully filtered
    // upstream) must yield one partition, not a getLong NPE
    val total = sized.agg(coalesce(sum("__bytes"), lit(0L))).first().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    sized.repartition(parts, col("media_id")).drop("__bytes")
  }

  /** Build a media table from any (id, string-payload) source — test/demo
    * helper that treats text bytes as the opaque blob. Non-numeric ids
    * become NULL media_ids (try_cast — under ANSI mode a plain cast THROWS
    * on the first malformed id) and pass through every kernel, per the
    * boxed-id contract. */
  def fromText(df: DataFrame, idCol: String, textCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).try_cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit(mime).as("mime"),
      map(lit("origin"), lit("text")).as("meta"))
}
