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

  test("null media_id rows pass through every kernel — never a deserializer crash") {
    // fromText casts an arbitrary idCol to long, so a non-numeric id lands
    // as media_id = null; a primitive-Long encoder would throw 'Null value
    // appeared in non-nullable field' mid-scan (the bug sampleFrames was
    // boxed to avoid — extractFeatures/resizeToFit share the posture now)
    val dirty = Multimodal.fromText(
      Seq(("doc-7", "payload one"), ("42", "payload two")).toDF("id", "text"),
      "id", "text", "image/fake")
    assert(dirty.filter($"media_id".isNull).count() == 1)
    val feats = Multimodal.extractFeatures(dirty).collect()
    assert(feats.length == 2 && feats.count(_.isNullAt(0)) == 1)
    val resized = Multimodal.resizeToFit(dirty, 64, 64).collect()
    assert(resized.length == 2 && resized.count(_.isNullAt(0)) == 1)
    val frames = Multimodal.sampleFrames(dirty, framesPerItem = 2).collect()
    assert(frames.length == 4 && frames.count(_.isNullAt(0)) == 2)
  }

  test("extractFeatures decodes deterministically via mapPartitions") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.sameElements(f2)) // deterministic stub
    val row = Multimodal.extractFeatures(media)
      .filter($"media_id" === 0).as[Multimodal.MediaFeatures].head()
    assert(row.n_bytes > 0 && row.channels == 3 && row.width >= 64 && row.sha_prefix.length == 8)
    assert(row.decoder == "stub") // text bytes claim no real kernel
    // the stub's dimensions are the documented md5 construction
    val text = Tables.load(spark, sf0001, "documents")
      .filter($"doc_id" === 0).select("text").as[String].head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex, 16)
    assert(row.width == 64 + (h % 1024).toInt)
    assert(row.height == 64 + ((h / 1024) % 1024).toInt)
  }

  // Real image bytes, produced by the JDK encoder itself — a genuine PNG/JPEG
  // byte stream, not a fixture approximation.
  private def encodeImage(format: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  // Real WAV bytes via the JDK's javax.sound encoder — genuine RIFF/WAVE
  // structure (fmt + data chunks), not a hand-rolled approximation.
  private def encodeWav(sampleRate: Int, channels: Int, seconds: Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val nFrames = (sampleRate * seconds).toLong
    val pcm = Array.tabulate((nFrames * fmt.getFrameSize).toInt)(i => (i * 7).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def dims(d: Multimodal.Decoded) = (d.width, d.height, d.channels)

  test("ImageIoDecoder reads true dimensions from real PNG and JPEG bytes") {
    val png = encodeImage("png", 17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(dims(Multimodal.ImageIoDecoder.decode("image/png", png)) == ((17, 9, 3)))
    val rgba = encodeImage("png", 5, 8, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    assert(dims(Multimodal.ImageIoDecoder.decode("image/png", rgba)) == ((5, 8, 4)))
    val jpg = encodeImage("jpg", 33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(dims(Multimodal.ImageIoDecoder.decode("image/jpeg", jpg)) == ((33, 21, 3)))
    val gray = encodeImage("png", 7, 7, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    assert(dims(Multimodal.ImageIoDecoder.decode("image/png", gray)) == ((7, 7, 1)))
    assert(Multimodal.ImageIoDecoder.decode("image/png", png).decoder == "imageio")
  }

  test("WavDecoder reads channels, sample rate and duration from real WAV bytes") {
    val mono = Multimodal.WavDecoder.decode("audio/wav", encodeWav(8000, 1, 2.0))
    assert((mono.channels, mono.sampleRate, mono.durationMs, mono.decoder)
      == ((1, 8000, 2000L, "wav")))
    val stereo = Multimodal.WavDecoder.decode("audio/wav", encodeWav(44100, 2, 0.5))
    assert((stereo.channels, stereo.sampleRate, stereo.decoder) == ((2, 44100, "wav")))
    assert(math.abs(stereo.durationMs - 500L) <= 1)
    assert((stereo.width, stereo.height) == ((0, 0))) // spatial dims n/a

    // a TRUNCATED wav keeps its header features; duration reflects the
    // bytes actually present, not the declared chunk size
    val cut = encodeWav(8000, 1, 2.0).take(8000 * 2 + 100)
    val t = Multimodal.WavDecoder.decode("audio/wav", cut)
    assert(t.decoder == "wav" && t.sampleRate == 8000 && t.durationMs < 2000L)

    // an undersized fmt chunk must NOT read the next chunk's bytes as a
    // PCM header — structural violation → stub
    val bad = encodeWav(8000, 1, 0.1)
    // RIFF(12) + 'fmt '(4): zero out the fmt chunk's declared size
    bad(16) = 0; bad(17) = 0; bad(18) = 0; bad(19) = 0
    assert(Multimodal.WavDecoder.decode("audio/wav", bad).decoder == "stub")
  }

  // Real FLAC container bytes built to spec: "fLaC" magic + a STREAMINFO
  // metadata block (type 0, 34 bytes) whose bytes 10..17 pack the
  // big-endian 20-bit sample rate / 3-bit channels-1 / 5-bit bps-1 /
  // 36-bit total-samples group. No JDK FLAC encoder exists; the layout is
  // the published STREAMINFO spec.
  private def encodeFlacHeader(sampleRate: Int, channels: Int,
      totalSamples: Long, id3: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    if (id3) bos.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 2, 0, 0)) // 2-byte tag body
    bos.write(Array[Byte]('f', 'L', 'a', 'C'))
    bos.write(Array[Byte](0x80.toByte, 0, 0, 34)) // last-block | STREAMINFO, len 34
    val si = new Array[Byte](34)
    val g = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      (15L << 36) | totalSamples // bps 16
    (0 until 8).foreach(i => si(10 + i) = ((g >>> (8 * (7 - i))) & 0xFF).toByte)
    bos.write(si)
    bos.toByteArray
  }

  // Real MPEG-1 Layer III frame header bytes: sync + version/layer, then
  // bitrate index / sample-rate index / channel mode, followed by payload.
  private def encodeMp3(kbps: Int, sampleRate: Int, stereo: Boolean,
      payloadBytes: Int, id3Body: Int = 0): Array[Byte] = {
    val brIdx = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      .indexOf(kbps)
    val srIdx = Seq(44100, 48000, 32000).indexOf(sampleRate)
    require(brIdx > 0 && srIdx >= 0, "test fixture: unsupported rate")
    val bos = new java.io.ByteArrayOutputStream()
    if (id3Body > 0) {
      bos.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      bos.write(Array[Byte](((id3Body >> 21) & 0x7F).toByte, ((id3Body >> 14) & 0x7F).toByte,
        ((id3Body >> 7) & 0x7F).toByte, (id3Body & 0x7F).toByte))
      bos.write(new Array[Byte](id3Body))
    }
    bos.write(Array[Byte](0xFF.toByte, 0xFB.toByte, // MPEG1 Layer III, no CRC
      ((brIdx << 4) | (srIdx << 2)).toByte,
      (if (stereo) 0x00 else 0xC0).toByte))
    bos.write(new Array[Byte](payloadBytes))
    bos.toByteArray
  }

  test("FlacDecoder reads exact rate/channels/duration from STREAMINFO") {
    val flac = encodeFlacHeader(44100, 2, 88200L) // exactly 2 s
    val d = Multimodal.FlacDecoder.decode("audio/flac", flac)
    assert((d.channels, d.sampleRate, d.durationMs, d.decoder)
      == ((2, 44100, 2000L, "flac")))
    // an ID3v2-prefixed flac still claims and decodes
    val tagged = encodeFlacHeader(96000, 1, 48000L, id3 = true)
    val t = Multimodal.FlacDecoder.decode("audio/flac", tagged)
    assert((t.channels, t.sampleRate, t.durationMs, t.decoder)
      == ((1, 96000, 500L, "flac")))
    // a non-STREAMINFO first block is a structural violation → stub
    val bad = flac.clone(); bad(4) = 0x84.toByte // type 4 (VORBIS_COMMENT)
    assert(Multimodal.FlacDecoder.decode("audio/flac", bad).decoder == "stub")
  }

  test("Mp3Decoder parses the frame header; duration is the CBR estimate") {
    // 128 kbps = 16000 bytes/s; 32000 payload bytes + 4 header ≈ 2002 ms
    val mp3 = encodeMp3(128, 44100, stereo = true, payloadBytes = 32000 - 4)
    val d = Multimodal.Mp3Decoder.decode("audio/mpeg", mp3)
    assert((d.channels, d.sampleRate, d.durationMs, d.decoder)
      == ((2, 44100, 2000L, "mp3")))
    // ID3 tag bytes are excluded from the estimate; mono detected
    val tagged = encodeMp3(64, 32000, stereo = false, payloadBytes = 8000 - 4,
      id3Body = 500)
    val t = Multimodal.Mp3Decoder.decode("audio/mpeg", tagged)
    assert((t.channels, t.sampleRate, t.durationMs, t.decoder)
      == ((1, 32000, 1000L, "mp3")))
    // a reserved bitrate index (1111) or bare sync on garbage do not claim
    val badBr = mp3.clone(); badBr(2) = 0xF0.toByte
    assert(!Multimodal.Mp3Decoder.claims(badBr))
    assert(Multimodal.Mp3Decoder.decode("audio/mpeg", badBr).decoder == "stub")
    // an ID3v2.4 tag with the FOOTER flag set (0x10): audio starts 10 bytes
    // later than the declared size — the offset must account for it
    val footered = encodeMp3(128, 44100, stereo = true, payloadBytes = 16000 - 4,
      id3Body = 100)
    footered(5) = 0x10.toByte // set footer flag on the crafted tag
    val withFooter = footered.patch(110, new Array[Byte](10), 0) // insert footer
    val f = Multimodal.Mp3Decoder.decode("audio/mpeg", withFooter)
    assert((f.sampleRate, f.durationMs, f.decoder) == ((44100, 1000L, "mp3")), f)
  }

  test("AutoDecoder dispatches flac and mp3 by content magic") {
    val flac = encodeFlacHeader(22050, 1, 22050L)
    assert(Multimodal.AutoDecoder.decode("application/octet-stream", flac).decoder == "flac")
    val mp3 = encodeMp3(128, 44100, stereo = true, payloadBytes = 100)
    assert(Multimodal.AutoDecoder.decode("application/octet-stream", mp3).decoder == "mp3")
    // WAV still wins for RIFF bytes; garbage still degrades to the stub
    assert(Multimodal.AutoDecoder.decode("x", encodeWav(8000, 1, 0.1)).decoder == "wav")
    assert(Multimodal.AutoDecoder.decode("x",
      "not audio at all".getBytes("UTF-8")).decoder == "stub")
  }

  test("real kernels fall back to the stub for unclaimed payloads") {
    val garbage = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.ImageIoDecoder.decode("image/fake", garbage)
      == Multimodal.StubDecoder.decode("image/fake", garbage))
    assert(Multimodal.WavDecoder.decode("audio/wav", garbage)
      == Multimodal.StubDecoder.decode("audio/wav", garbage))
    assert(Multimodal.ImageIoDecoder.decode("image/png", Array.emptyByteArray)
      == Multimodal.StubDecoder.decode("image/png", Array.emptyByteArray))
    // stub rows are identifiable without re-decoding (the ADVICE gap)
    assert(Multimodal.StubDecoder.decode("audio/wav", garbage).decoder == "stub")
  }

  test("extractFeatures auto-dispatches image and wav kernels end-to-end") {
    val png = encodeImage("png", 40, 25, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jpg = encodeImage("jpg", 12, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val wav = encodeWav(16000, 1, 1.0)
    val mediaDf = Seq(
      (1L, png, "image/png"), (2L, jpg, "image/jpeg"),
      (3L, wav, "audio/wav"),
      (4L, wav, "image/png")) // lying MIME: content magic wins
      .toDF("media_id", "bytes", "mime")
    val feats = Multimodal.extractFeatures(mediaDf)
      .as[Multimodal.MediaFeatures].collect().sortBy(_.media_id)
    assert((feats(0).width, feats(0).height, feats(0).channels, feats(0).decoder)
      == ((40, 25, 3, "imageio")))
    assert((feats(1).width, feats(1).height, feats(1).channels) == ((12, 30, 3)))
    assert((feats(2).sample_rate, feats(2).duration_ms, feats(2).decoder)
      == ((16000, 1000L, "wav")))
    assert(feats(3).decoder == "wav") // dispatched by RIFF magic, not MIME
    assert(feats.forall(f => f.n_bytes > 0 && f.sha_prefix.length == 8))
  }

  test("resizeToFit: real downscale, aspect preserved, pass-through for fits and non-images") {
    val big = encodeImage("png", 100, 60, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val tall = encodeImage("jpg", 40, 200, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val small = encodeImage("png", 30, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val alpha = encodeImage("png", 80, 80, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val junk = "not an image".getBytes("UTF-8")
    val mediaDf = Seq(
      (1L, big, "image/png"), (2L, tall, "image/jpeg"), (3L, small, "image/png"),
      (4L, alpha, "image/png"), (5L, junk, "text/plain"))
      .toDF("media_id", "bytes", "mime")
    val out = Multimodal.resizeToFit(mediaDf, 50, 50)
      .as[Multimodal.ResizedMedia].collect().sortBy(_.media_id)
    // 100x60 fit 50x50 → scale 0.5 → 50x30; 40x200 → scale 0.25 → 10x50
    assert((out(0).width, out(0).height, out(0).resized) == ((50, 30, true)))
    assert((out(1).width, out(1).height, out(1).resized) == ((10, 50, true)))
    // the re-encoded bytes are a REAL image of the claimed size
    val round = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0).bytes))
    assert(round.getWidth == 50 && round.getHeight == 30)
    assert(out(0).mime == "image/png")
    // already fits: byte-identical pass-through
    assert((out(2).resized, out(2).width, out(2).height) == ((false, 30, 20)))
    assert(out(2).bytes.sameElements(small))
    // alpha survives the downscale
    val roundA = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(3).bytes))
    assert(out(3).resized && roundA.getColorModel.hasAlpha)
    // non-image: untouched, flagged
    assert(!out(4).resized && out(4).bytes.sameElements(junk) && out(4).mime == "text/plain")
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

  // ---- crafted container bytes for the video header kernels ----

  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    bb.array()
  }

  private def craftedMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), Array[Byte](0, 0, 0, 0))
    val mvhd = { // v0: vf(4) c(4) m(4) timescale(4) duration(4) + 80 spec bytes
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      bb.array()
    }
    val tkhd = { // v0: width/height are 16.16 fixed at payload offsets 76/80
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0).putInt(0).putInt(0).putInt(1).putInt(0).putInt(duration)
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
      bb.array()
    }
    ftyp ++ mp4Box("moov", mp4Box("mvhd", mvhd),
      mp4Box("trak", mp4Box("tkhd", tkhd)))
  }

  private def be(v: Long, n: Int): Array[Byte] =
    ((n - 1) to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
  private def ebml(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    assert(body.length < 127)
    id ++ Array((0x80 | body.length).toByte) ++ body
  }

  test("Mp4Decoder reads dimensions and exact duration from crafted boxes") {
    val bytes = craftedMp4(timescale = 1000, duration = 90000, w = 640, h = 360)
    val d = Multimodal.Mp4Decoder.decode("video/mp4", bytes)
    assert((d.width, d.height, d.durationMs, d.decoder) == ((640, 360, 90000L, "mp4")))
    // v1 mvhd (64-bit times): same answer through the version-aware offsets
    val mvhdV1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1 + flags
      bb.putLong(0L).putLong(0L).putInt(500).putLong(30000L)
      bb.array()
    }
    val v1 = craftedMp4(1000, 90000, 640, 360).take(16) ++ // just the ftyp
      mp4Box("moov", mp4Box("mvhd", mvhdV1))
    val d1 = Multimodal.Mp4Decoder.decode("video/mp4", v1)
    assert(d1.durationMs == 60000L && d1.decoder == "mp4") // 30000 ticks @ 500/s
    // ftyp with no moov = structural violation → deterministic stub
    val broken = craftedMp4(1000, 1, 1, 1).take(16)
    assert(Multimodal.Mp4Decoder.decode("video/mp4", broken).decoder == "stub")
    // v1 mvhd too short for its own 64-bit fields must STUB, not fall
    // through to v0 offsets (which would read creation-time bytes as
    // timescale/duration — silently wrong features)
    val shortV1 = {
      val bb = java.nio.ByteBuffer.allocate(28)
      bb.put(1.toByte)
      bb.array()
    }
    val sv = craftedMp4(1000, 1, 1, 1).take(16) ++ mp4Box("moov", mp4Box("mvhd", shortV1))
    assert(Multimodal.Mp4Decoder.decode("video/mp4", sv).decoder == "stub")
    // a tkhd truncated to an EMPTY payload (box header is the last 8 bytes)
    // must not throw out of the scan — dims degrade to 0×0
    val emptyTkhd = craftedMp4(1000, 1, 1, 1).take(16) ++ mp4Box("moov",
      mp4Box("mvhd", {
        val bb = java.nio.ByteBuffer.allocate(100)
        bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(2000)
        bb.array()
      }),
      mp4Box("trak", mp4Box("tkhd")))
    val et = Multimodal.Mp4Decoder.decode("video/mp4", emptyTkhd)
    assert((et.width, et.height, et.durationMs, et.decoder) == ((0, 0, 2000L, "mp4")))
  }

  test("MkvDecoder reads EBML video dims, audio params, and scaled duration") {
    val header = ebml(be(0x1A45DFA3L, 4)) // empty EBML header
    val info = ebml(be(0x1549A966L, 4),
      ebml(be(0x2AD7B1L, 3), be(1000000L, 3)),      // TimestampScale 1 ms
      ebml(be(0x4489L, 2), be(java.lang.Float.floatToIntBits(90000f).toLong, 4)))
    val videoTrack = ebml(be(0xAEL, 1), ebml(be(0xE0L, 1),
      ebml(be(0xB0L, 1), be(1280L, 2)), ebml(be(0xBAL, 1), be(720L, 2))))
    val audioTrack = ebml(be(0xAEL, 1), ebml(be(0xE1L, 1),
      ebml(be(0x9FL, 1), be(2L, 1)),
      ebml(be(0xB5L, 1), be(java.lang.Float.floatToIntBits(48000f).toLong, 4))))
    val mkv = header ++ ebml(be(0x18538067L, 4), info,
      ebml(be(0x1654AE6BL, 4), videoTrack, audioTrack))
    val d = Multimodal.MkvDecoder.decode("video/x-matroska", mkv)
    assert((d.width, d.height, d.durationMs, d.decoder) == ((1280, 720, 90000L, "mkv")))
    assert((d.channels, d.sampleRate) == ((2, 48000))) // audio track params ride along
    // magic with an unparseable segment → deterministic stub
    val broken = be(0x1A45DFA3L, 4) ++ Array[Byte](0) // invalid vint after magic
    assert(Multimodal.MkvDecoder.decode("video/webm", broken).decoder == "stub")
  }

  test("sampleFrames slices REAL sample payloads from MP4 sample tables") {
    def be32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    // three samples (sizes 4,5,6) in two chunks: chunk1 = samples 0,1;
    // chunk2 = sample 2 (stsc run: first_chunk=1, samples_per_chunk=2)
    val payloads = Seq("AAAA", "BBBBB", "CCCCCC").map(_.getBytes("US-ASCII"))
    def stbl(off1: Long, off2: Long) = mp4Box("stbl",
      mp4Box("stsz", be32(0), be32(0), be32(3), be32(4), be32(5), be32(6)),
      mp4Box("stsc", be32(0), be32(1), be32(1), be32(2), be32(1)),
      mp4Box("stco", be32(0), be32(2), be32(off1), be32(off2)))
    def container(off1: Long, off2: Long): Array[Byte] = {
      val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), Array[Byte](0, 0, 0, 0))
      val moov = mp4Box("moov", mp4Box("trak", mp4Box("mdia", mp4Box("minf",
        stbl(off1, off2)))))
      ftyp ++ moov ++ mp4Box("mdat", payloads.flatten.toArray)
    }
    // two-pass build: sizes are offset-independent, so measure then rebuild
    val dataStart = container(0, 0).length - payloads.flatten.size
    val mp4 = container(dataStart, dataStart + 9)
    assert(Multimodal.Mp4Decoder.sampleTable(mp4).contains(Vector(
      (dataStart.toLong, 4L), (dataStart + 4L, 5L), (dataStart + 9L, 6L))))

    val media = Seq((7L, mp4, "video/mp4", Map.empty[String, String]))
      .toDF("media_id", "bytes", "mime", "meta")
    val frames = Multimodal.sampleFrames(media, framesPerItem = 3)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(frames.map(f => new String(f.frame_bytes, "US-ASCII")).toSeq ==
      Seq("AAAA", "BBBBB", "CCCCCC")) // evenly spaced = all three here
    val two = Multimodal.sampleFrames(media, framesPerItem = 2)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(two.map(f => new String(f.frame_bytes, "US-ASCII")).toSeq ==
      Seq("AAAA", "CCCCCC")) // first and last sample
    // non-BMFF blobs keep the deterministic stub slice
    val stub = Multimodal.sampleFrames(
      Seq((8L, "0123456789abcdefXYZ".getBytes("US-ASCII"), "text/plain",
        Map.empty[String, String])).toDF("media_id", "bytes", "mime", "meta"), 2)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(new String(stub(0).frame_bytes, "US-ASCII") == "0123456789abcdef")
    assert(new String(stub(1).frame_bytes, "US-ASCII") == "123456789abcdefX")
  }

  test("sampleFrames slices MKV SimpleBlock payloads; laced blocks are skipped") {
    // block payload = track-vint(0x81) + rel-timestamp(2) + flags(1) + data
    def block(flags: Int, data: String): Array[Byte] =
      Array[Byte](0x81.toByte, 0, 0, flags.toByte) ++ data.getBytes("US-ASCII")
    val cluster = ebml(be(0x1F43B675L, 4),
      ebml(be(0xE7L, 1), be(0L, 1)), // cluster timestamp, ignored
      ebml(be(0xA3L, 1), block(0x00, "FRAME_ONE")),
      ebml(be(0xA3L, 1), block(0x06, "LACED_SKIPPED")), // EBML lacing
      ebml(be(0xA0L, 1), ebml(be(0xA1L, 1), block(0x00, "FRAME_TWO"))))
    val mkv = ebml(be(0x1A45DFA3L, 4)) ++ ebml(be(0x18538067L, 4), cluster)
    val media = Seq((9L, mkv, "video/webm", Map.empty[String, String]))
      .toDF("media_id", "bytes", "mime", "meta")
    val frames = Multimodal.sampleFrames(media, framesPerItem = 2)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(frames.map(f => new String(f.frame_bytes, "US-ASCII")).toSeq ==
      Seq("FRAME_ONE", "FRAME_TWO"))
  }

  test("muxed containers: frames come from the VIDEO track only") {
    def be32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    // MKV: Tracks declares video=track1, audio=track2; the cluster
    // interleaves both — audio packets must not surface as frames
    def block(track: Int, data: String): Array[Byte] =
      Array[Byte]((0x80 | track).toByte, 0, 0, 0x00) ++ data.getBytes("US-ASCII")
    val tracks = ebml(be(0x1654AE6BL, 4),
      ebml(be(0xAEL, 1), ebml(be(0xD7L, 1), be(1L, 1)), ebml(be(0xE0L, 1),
        ebml(be(0xB0L, 1), be(64L, 2)), ebml(be(0xBAL, 1), be(48L, 2)))),
      ebml(be(0xAEL, 1), ebml(be(0xD7L, 1), be(2L, 1)), ebml(be(0xE1L, 1),
        ebml(be(0x9FL, 1), be(2L, 1)))))
    val cluster = ebml(be(0x1F43B675L, 4),
      ebml(be(0xA3L, 1), block(1, "VID_A")),
      ebml(be(0xA3L, 1), block(2, "AUDIO_PKT")),
      ebml(be(0xA3L, 1), block(1, "VID_B")))
    val mkv = ebml(be(0x1A45DFA3L, 4)) ++ ebml(be(0x18538067L, 4), tracks, cluster)
    val got = Multimodal.sampleFrames(
      Seq((1L, mkv, "video/webm", Map.empty[String, String]))
        .toDF("media_id", "bytes", "mime", "meta"), 2)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(got.map(f => new String(f.frame_bytes, "US-ASCII")).toSeq ==
      Seq("VID_A", "VID_B"))

    // MP4: audio-first trak has a complete sample table but no tkhd dims;
    // the video trak (nonzero dims) must win
    def trakWith(dims: Option[(Int, Int)], sampleOff: Long, size: Int) = {
      val tkhd = dims.map { case (w, h) =>
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.position(76); bb.putInt(w << 16).putInt(h << 16)
        mp4Box("tkhd", bb.array())
      }.getOrElse(Array.empty[Byte])
      mp4Box("trak", tkhd, mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
        mp4Box("stsz", be32(0), be32(0), be32(1), be32(size)),
        mp4Box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1)),
        mp4Box("stco", be32(0), be32(1), be32(sampleOff))))))
    }
    def mp4(aOff: Long, vOff: Long): Array[Byte] = {
      val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), Array[Byte](0, 0, 0, 0))
      val moov = mp4Box("moov",
        trakWith(None, aOff, 5),                 // audio-ish: no dims
        trakWith(Some((32, 24)), vOff, 6))       // video: dims
      ftyp ++ moov ++ mp4Box("mdat", "AAAAABBBBBB".getBytes("US-ASCII"))
    }
    val dataStart = mp4(0, 0).length - 11 // audio "AAAAA" @+0, video "BBBBBB" @+5
    val vGot = Multimodal.sampleFrames(
      Seq((2L, mp4(dataStart, dataStart + 5), "video/mp4", Map.empty[String, String]))
        .toDF("media_id", "bytes", "mime", "meta"), 1)
      .as[Multimodal.Frame].collect()
    assert(new String(vGot.head.frame_bytes, "US-ASCII") == "BBBBBB")

    // a video trak with a BROKEN sample table must abort to None (stub
    // slice), never fall through to the audio trak's complete table — the
    // MP4 mirror of the MKV numberless-track strictness below
    def brokenVideoMp4(aOff: Long): Array[Byte] = {
      val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), Array[Byte](0, 0, 0, 0))
      val videoNoStbl = {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.position(76); bb.putInt(32 << 16).putInt(24 << 16)
        mp4Box("trak", mp4Box("tkhd", bb.array())) // dims, but no mdia/stbl
      }
      val moov = mp4Box("moov", videoNoStbl, trakWith(None, aOff, 5))
      ftyp ++ moov ++ mp4Box("mdat", "AAAAA".getBytes("US-ASCII"))
    }
    assert(Multimodal.Mp4Decoder.sampleTable(brokenVideoMp4(0)).isEmpty)
  }

  test("MKV edge cases: streamed clusters walk iteratively in order; numberless video track aborts to stub") {
    def block(track: Int, data: String): Array[Byte] =
      Array[Byte]((0x80 | track).toByte, 0, 0, 0x00) ++ data.getBytes("US-ASCII")
    // an unknown-size (streamed) cluster swallows its successor: frames
    // from BOTH must surface, in document order
    val clusterB = ebml(be(0x1F43B675L, 4), ebml(be(0xA3L, 1), block(1, "LATER")))
    val blockA = ebml(be(0xA3L, 1), block(1, "EARLY"))
    val streamedA = be(0x1F43B675L, 4) ++ Array(0xFF.toByte) ++ blockA ++ clusterB
    val mkv = ebml(be(0x1A45DFA3L, 4)) ++ ebml(be(0x18538067L, 4), streamedA)
    val frames = Multimodal.sampleFrames(
      Seq((3L, mkv, "video/webm", Map.empty[String, String]))
        .toDF("media_id", "bytes", "mime", "meta"), 2)
      .as[Multimodal.Frame].collect().sortBy(_.frame_idx)
    assert(frames.map(f => new String(f.frame_bytes, "US-ASCII")).toSeq ==
      Seq("EARLY", "LATER"))

    // a Video TrackEntry with NO TrackNumber cannot be filtered — serving
    // an unfiltered mux would be silently wrong, so the table aborts and
    // sampleFrames falls back to the deterministic stub slice
    val numberless = ebml(be(0x1A45DFA3L, 4)) ++ ebml(be(0x18538067L, 4),
      ebml(be(0x1654AE6BL, 4), ebml(be(0xAEL, 1), ebml(be(0xE0L, 1),
        ebml(be(0xB0L, 1), be(64L, 2))))),
      ebml(be(0x1F43B675L, 4), ebml(be(0xA3L, 1), block(1, "VID"))))
    assert(Multimodal.MkvDecoder.sampleTable(numberless).isEmpty)
  }

  test("AutoDecoder dispatches mp4 and mkv by content magic") {
    val mp4 = craftedMp4(1000, 5000, 320, 240)
    assert(Multimodal.AutoDecoder.decode("application/octet-stream", mp4).decoder == "mp4")
    val mkvMin = ebml(be(0x1A45DFA3L, 4)) ++ ebml(be(0x18538067L, 4))
    assert(Multimodal.AutoDecoder.decode("application/octet-stream", mkvMin).decoder == "mkv")
  }

  test("null mime degrades to stub features; an empty media table repartitions to one partition") {
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, Array[Byte](1, 2, 3), null.asInstanceOf[String]))
      .toDF("media_id", "bytes", "mime")
    val out = Multimodal.extractFeatures(rows).collect()
    assert(out.length == 1 && out.head.getAs[String]("decoder") == "stub",
      out.mkString("; "))
    val empty = rows.filter(lit(false))
    val rp = Multimodal.repartitionForBlobs(empty, targetBytesPerPartition = 1024)
    assert(rp.rdd.getNumPartitions == 1 && rp.count() == 0)
  }
}
