package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BM25 retrieval: hand-computed scores (tf saturation, length
  * normalization, idf), query-term dedup, multi-term summation, top-k
  * truncation with doc-id tie-break, and a relevance sanity check on the
  * real corpus. The cross-engine leg is the s9 DuckDB gate, which
  * recomputes the full chain including the fixed-order fold. */
class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(1L -> "x y", 2L -> "x x z", 3L -> "w").toDF("doc_id", "text")

  private def run(qs: Seq[(Long, String)], k: Int = 10): Seq[(Long, Long, Int, Double)] =
    Bm25.search(corpus, "doc_id", "text", qs.toDF("qid", "qtext"), "qid", "qtext", k)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq

  private def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed single-term scores: tf saturation beats raw tf") {
    // N=3, avgdl=2.0, df(x)=2 -> idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    // d1: tf=1, len=2 -> idf * 2.2 / (1 + 1.2*(0.25 + 0.75*2/2.0)) = idf
    // d2: tf=2, len=3 -> idf * 4.4 / (2 + 1.2*(0.25 + 0.75*3/2.0))
    val d1 = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 2.0 / 2.0))
    val d2 = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.0))
    assert(d2 > d1) // higher tf wins despite the longer doc
    val got = run(Seq(10L -> "x"))
    assert(got == Seq((10L, 2L, 1, r6(d2)), (10L, 1L, 2, r6(d1))))
  }

  test("docs sharing no query term never appear") {
    assert(run(Seq(10L -> "x")).forall(_._2 != 3L))
    assert(run(Seq(10L -> "nope")).isEmpty)
  }

  test("multi-term queries sum per-term contributions; duplicates dedup") {
    val one = run(Seq(10L -> "x y"))
    val dup = run(Seq(10L -> "x y x x"))
    assert(one == dup)
    // d1 matches both terms, d2 only x: d1's score strictly gains y's idf part
    val xOnly = run(Seq(10L -> "x")).map(t => t._2 -> t._4).toMap
    val both = one.map(t => t._2 -> t._4).toMap
    assert(both(1L) > xOnly(1L) && both(2L) == xOnly(2L))
  }

  test("k truncates; exact score ties break by doc id ascending") {
    val two = Seq(1L -> "same text", 2L -> "same text").toDF("doc_id", "text")
    val got = Bm25.search(two, "doc_id", "text",
        Seq(9L -> "same").toDF("qid", "qtext"), "qid", "qtext", 1)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 1)))
  }

  test("index save/load round-trips scores exactly; foreign files refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-ix").toString
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    Bm25.saveIndex(idx, dir)
    val loaded = Bm25.loadIndex(spark, dir)
    val qs = Seq(10L -> "x y").toDF("qid", "qtext")
    def s(i: Bm25.Index) = Bm25.topK(i, qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(s(loaded) == s(idx)) // integer stats round-trip exactly
    val bad = java.nio.file.Files.createTempDirectory("bm25-bad").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$bad/tf")
    val e = intercept[IllegalArgumentException](Bm25.loadIndex(spark, bad))
    assert(e.getMessage.contains("not a BM25"))
  }

  test("a forged v2 manifest (merged-df snapshot) loads; a fold over it appends v3") {
    // r16 wrote `v=2` manifests: one seg-*/{tf,doclen} per fold plus a
    // vocab-sized df-<uuid> merged snapshot named by `df=`. v3 readers
    // must keep scoring those byte-identically, and a fold over one must
    // write only a per-segment delta (snapshot untouched, still covering
    // its leading segments via dfcover)
    val dir = java.nio.file.Files.createTempDirectory("bm25-v2").toString + "/ix"
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    idx.tf.write.parquet(s"$dir/seg-v2fixture/tf")
    idx.docLen.write.parquet(s"$dir/seg-v2fixture/doclen")
    idx.df.write.parquet(s"$dir/df-v2fixture") // merged snapshot, v2-style
    val manifest = Seq("v=2", s"ndocs=${idx.nDocs}", s"totlen=${idx.totLen}",
      "df=df-v2fixture", "seg=seg-v2fixture").mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/manifest.txt"),
      manifest.getBytes("UTF-8"))
    val qs = Seq(10L -> "x y").toDF("qid", "qtext")
    def s(i: Bm25.Index) = Bm25.topK(i, qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val v2 = Bm25.loadIndex(spark, dir)
    assert(s(v2) == s(idx), "v2 manifest no longer scores like the build")
    // fold a delta through the v3 append path
    val m = Bm25.readManifest(spark, dir).get
    assert(m.dfDir.contains("df-v2fixture") && m.dfCover == 1)
    Bm25.appendSegment(v2, m, Seq(4L -> "x w").toDF("doc_id", "text"),
      "doc_id", "text", dir)
    val m2 = Bm25.readManifest(spark, dir).get
    assert(m2.dfDir.contains("df-v2fixture") && m2.dfCover == 1 &&
      m2.segments.size == 2, s"v2→v3 fold mangled the manifest: $m2")
    val fullPlus = Bm25.buildIndex(
      Seq(1L -> "x y", 2L -> "x x z", 3L -> "w", 4L -> "x w")
        .toDF("doc_id", "text"), "doc_id", "text")
    assert(s(Bm25.loadIndex(spark, dir)) == s(fullPlus),
      "mixed v2-snapshot + v3-segment df merge diverged from the full build")
  }

  test("inconsistent df/dfcover manifest refuses loudly — never double-counts df") {
    // a v3 manifest naming a snapshot with dfcover=0 would SUM the
    // snapshot with every segment's own df (doubled document frequencies
    // shift every idf silently); dfcover>0 with no snapshot leaves the
    // leading segments with no df source. Both must refuse by name, not
    // load-and-lie.
    val dir = java.nio.file.Files.createTempDirectory("bm25-bad-mf").toString
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    Bm25.saveIndex(idx, dir) // writes a consistent v3 manifest
    val seg = Bm25.readManifest(spark, dir).get.segments.head
    def forge(lines: Seq[String]): Unit = {
      // saveIndex wrote through Hadoop's ChecksumFileSystem, which keeps a
      // .manifest.txt.crc sidecar — drop it or the raw overwrite below
      // fails the read with ChecksumException before the refusal under test
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/.manifest.txt.crc")): Unit
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/manifest.txt"),
        lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    forge(Seq("v=3", s"ndocs=${idx.nDocs}", s"totlen=${idx.totLen}",
      "df=df-ghost", s"seg=$seg")) // snapshot named, dfcover absent (0)
    val e1 = intercept[IllegalArgumentException](Bm25.readManifest(spark, dir))
    assert(e1.getMessage.contains("df/dfcover inconsistent"), e1.getMessage)
    forge(Seq("v=3", s"ndocs=${idx.nDocs}", s"totlen=${idx.totLen}",
      "dfcover=1", s"seg=$seg")) // cover without a snapshot
    val e2 = intercept[IllegalArgumentException](Bm25.readManifest(spark, dir))
    assert(e2.getMessage.contains("df/dfcover inconsistent"), e2.getMessage)
    forge(Seq("v=3", s"ndocs=${idx.nDocs}", s"totlen=${idx.totLen}",
      "df=df-ghost", "dfcover=2", s"seg=$seg")) // cover exceeds segments
    val e3 = intercept[IllegalArgumentException](Bm25.readManifest(spark, dir))
    assert(e3.getMessage.contains("df/dfcover inconsistent"), e3.getMessage)
  }

  test("a segment listed twice refuses loudly — never double-counts postings") {
    // a multi-path parquet read lists one directory PER MENTION: a
    // manifest naming seg-X twice reads its tf/df twice — doubled term
    // frequencies, silently shifted scores. The r18 review pass found the
    // reader accepted such a manifest; it must refuse by name instead.
    val dir = java.nio.file.Files.createTempDirectory("bm25-dup").toString
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    Bm25.saveIndex(idx, dir)
    val seg = Bm25.readManifest(spark, dir).get.segments.head
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/.manifest.txt.crc")): Unit
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/manifest.txt"),
      Seq("v=3", s"ndocs=${idx.nDocs}", s"totlen=${idx.totLen}",
        s"seg=$seg", s"seg=$seg").mkString("\n").getBytes("UTF-8")): Unit
    val e = intercept[IllegalArgumentException](Bm25.loadIndex(spark, dir))
    assert(e.getMessage.contains("more than once") &&
      e.getMessage.contains(seg), e.getMessage)
  }

  test("a gutted segment dir refuses loudly; a _SUCCESS-only empty frame loads") {
    // an EXISTS-but-empty dir among MULTIPLE read paths contributes zero
    // rows silently (the other paths supply the schema, so no error
    // anywhere — under-counted df, wrong idf); a legitimately empty FRAME
    // keeps the committer's _SUCCESS marker and must keep loading.
    // Missing dirs already fail loudly in the read. Two segments, so the
    // multi-path silence is real.
    val dir = java.nio.file.Files.createTempDirectory("bm25-gut").toString
    Bm25.saveIndex(Bm25.buildIndex(corpus, "doc_id", "text"), dir)
    Bm25.appendSegment(Bm25.loadIndex(spark, dir),
      Bm25.readManifest(spark, dir).get,
      Seq(4L -> "x w").toDF("doc_id", "text"), "doc_id", "text", dir)
    val healthy = Bm25.loadIndex(spark, dir)
    val qs = Seq(10L -> "x y").toDF("qid", "qtext")
    def s(i: Bm25.Index) = Bm25.topK(i, qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val healthyScores = s(healthy)
    val seg2 = Bm25.readManifest(spark, dir).get.segments.last
    val dfDir = java.nio.file.Paths.get(s"$dir/$seg2/df")
    // keep the files aside; gut the dir completely
    val stash = java.nio.file.Files.createTempDirectory("bm25-stash")
    val files = java.nio.file.Files.list(dfDir).toArray.map(_.toString)
    assert(files.nonEmpty, "fixture regressed: the fold wrote no df files")
    files.foreach { f =>
      val p = java.nio.file.Paths.get(f)
      java.nio.file.Files.move(p, stash.resolve(p.getFileName)): Unit
    }
    val e = intercept[IllegalArgumentException](Bm25.loadIndex(spark, dir))
    assert(e.getMessage.contains("empty") && e.getMessage.contains(s"$seg2/df"),
      e.getMessage)
    // _SUCCESS alone = a legitimately empty frame — must load again (the
    // first segment's df supplies the schema)
    java.nio.file.Files.createFile(dfDir.resolve("_SUCCESS")): Unit
    Bm25.loadIndex(spark, dir).df.count(): Unit
    // restore a healthy index and confirm scores are intact end-to-end
    java.nio.file.Files.delete(dfDir.resolve("_SUCCESS"))
    files.foreach { f =>
      val p = java.nio.file.Paths.get(f)
      java.nio.file.Files.move(stash.resolve(p.getFileName), p): Unit
    }
    assert(s(Bm25.loadIndex(spark, dir)) == healthyScores)
  }

  test("updateIndex(build(A), B) IS build(A ++ B) — exact incremental maintenance") {
    val a = Seq(1L -> "x y", 2L -> "x x z")
    val b = Seq(3L -> "w", 4L -> "x w y")
    val incr = Bm25.updateIndex(
      Bm25.buildIndex(a.toDF("doc_id", "text"), "doc_id", "text"),
      b.toDF("doc_id", "text"), "doc_id", "text")
    val full = Bm25.buildIndex((a ++ b).toDF("doc_id", "text"), "doc_id", "text")
    assert(incr.nDocs == full.nDocs && incr.totLen == full.totLen)
    val qs = Seq(9L -> "x w").toDF("qid", "qtext")
    def s(i: Bm25.Index) = Bm25.topK(i, qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(s(incr) == s(full)) // integer stats add exactly
  }

  test("empty corpus refuses at build time; corpus stats live in the index") {
    val e = intercept[IllegalArgumentException](
      Bm25.buildIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"),
        "doc_id", "text"))
    assert(e.getMessage.contains("empty corpus"))
    val idx = Bm25.buildIndex(corpus, "doc_id", "text")
    assert(idx.nDocs == 3 && idx.totLen == 6 && idx.avgdl == 2.0)
    // NULL text = the empty document: counted consistently in BOTH nDocs
    // and totLen (len 1), never a NULL __len row skewing avgdl
    val withNull = Bm25.buildIndex(
      (corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq :+
        (9L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(withNull.nDocs == 4 && withNull.totLen == 7)
    assert(withNull.docLen.filter(col("__len").isNull).isEmpty)
  }

  test("real corpus: rare terms dominate common ones (idf)") {
    // the documents table is generated over a SHARED 31-word vocabulary,
    // so every common term appears in nearly every doc and idf ~ 0 —
    // plant one unique marker per probe doc and retrieve by it mixed with
    // a common word: the marker's idf must put its host doc first
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("text", when(col("doc_id") < 5,
        concat(col("text"), lit(" marker"), col("doc_id"))).otherwise(col("text")))
    val qs = d.filter(col("doc_id") < 5).select(col("doc_id").as("qid"),
      concat(lit("the marker"), col("doc_id")).as("qtext"))
    val top1 = Bm25.search(d, "doc_id", "text", qs, "qid", "qtext", 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 5L).forall(q => top1(q) == q), s"marker retrieval: $top1")
  }
}
