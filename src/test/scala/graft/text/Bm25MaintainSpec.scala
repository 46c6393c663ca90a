package graft.text

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The Bm25Maintain plugin's state machine: build-on-first-run,
  * delta-only fold, REPLAY idempotence (empty delta no-ops), and the
  * lost-index self-heal (rebuild from the full accumulated corpus). The
  * c14 gate pins the end state against the full-corpus DuckDB oracle;
  * this spec pins the transitions. */
class Bm25MaintainSpec extends SparkSuite {
  import spark.implicits._

  private val fn = new graft.plugins.RetrievalTransforms.Bm25Maintain
  private val qs = Seq(9L -> "x w").toDF("qid", "qtext")

  private def run(corpus: DataFrame, path: String): Set[(Long, Long, Int, Double)] =
    fn(Seq(corpus, qs), spark, Map("index_path" -> path, "k" -> "10"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  /** Forge the pre-r16 FLAT layout (tf/doclen/df/stats, no manifest) —
    * what old saveIndex wrote; `withHash = false` additionally forges the
    * pre-r13 doclen (no content hash). */
  private def writeLegacy(ix: Bm25.Index, path: String, withHash: Boolean): Unit = {
    ix.tf.write.mode("overwrite").parquet(s"$path/tf")
    (if (withHash) ix.docLen else ix.docLen.drop("__hash"))
      .write.mode("overwrite").parquet(s"$path/doclen")
    ix.df.write.mode("overwrite").parquet(s"$path/df")
    Seq((ix.nDocs, ix.totLen)).toDF("n_docs", "tot_len").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  private def segDirs(path: String): Seq[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg-"))
      .map(_.getName).toSeq.sorted

  test("build, delta-fold, replay, and self-heal all land on the full-build answer") {
    val a = Seq(1L -> "x y", 2L -> "x x z")
    val b = Seq(3L -> "w", 4L -> "x w y")
    val full = Bm25.topK(Bm25.buildIndex((a ++ b).toDF("doc_id", "text"),
        "doc_id", "text"), qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val path = java.nio.file.Files.createTempDirectory("bm25m").toString + "/ix"
    run(a.toDF("doc_id", "text"), path)                    // run 1: build
    val afterB = run((a ++ b).toDF("doc_id", "text"), path) // run 2: fold delta
    assert(afterB == full)
    val replay = run((a ++ b).toDF("doc_id", "text"), path) // replay: empty delta
    assert(replay == full)
    graft.exec.Fs.deleteRecursively(path)                   // index lost mid-swap
    val healed = run((a ++ b).toDF("doc_id", "text"), path) // rebuild from corpus
    assert(healed == full)
    // present-but-unreadable index (a manifest referencing a burned
    // segment): the run must rebuild, not wedge on loadIndex forever
    graft.exec.Fs.deleteRecursively(s"$path/${segDirs(path).head}")
    val unwedged = run((a ++ b).toDF("doc_id", "text"), path)
    assert(unwedged == full)
  }

  test("a pre-hash (legacy) index loads and folds — never 'self-heals' into a rebuild") {
    // indexes persisted before the __hash column existed are VALID; a
    // schema refusal here would be mislabeled "unreadable" by the
    // self-heal and answered with a full-corpus rebuild — which DROPS
    // history when the maintenance input is delta-only
    val a = Seq(1L -> "x y", 2L -> "x x z")
    val b = Seq(3L -> "w", 4L -> "x w y")
    val full = Bm25.topK(Bm25.buildIndex((a ++ b).toDF("doc_id", "text"),
        "doc_id", "text"), qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val path = java.nio.file.Files.createTempDirectory("bm25m").toString + "/ix"
    // forge the pre-r13 legacy layout: flat dirs, doclen without __hash
    writeLegacy(Bm25.buildIndex(a.toDF("doc_id", "text"), "doc_id", "text"),
      path, withHash = false)
    assert(spark.read.parquet(s"$path/doclen").columns.toSet == Set("__doc", "__len"))
    // DELTA-ONLY input (history absent): the legacy index must load and
    // fold b — a mislabeled rebuild here would lose docs 1 and 2
    val out = run(b.toDF("doc_id", "text"), path)
    assert(out == full)
    // and the fold MIGRATED the layout: manifest present, flat dirs gone
    assert(Bm25.readManifest(spark, path).isDefined)
    assert(!new java.io.File(s"$path/tf").exists(),
      "legacy flat dirs must not survive migration as a stale corpus copy")
    // legacy rows migrated forward only for NEW appends: old rows keep a
    // NULL hash (re-text undetectable — the documented boundary), and a
    // replay of a legacy-known id with ANY text drops rather than refolds
    val replayRetext = run(Seq(1L -> "totally different").toDF("doc_id", "text"), path)
    assert(replayRetext == full, "legacy-known id was re-folded or rebuilt")
    // new (post-legacy) rows still get re-text detection
    val e = intercept[graft.config.YamlConfig.ConfigError] {
      run(Seq(3L -> "retexted").toDF("doc_id", "text"), path)
    }
    assert(e.getMessage.contains("DIFFERENT text"), e.getMessage)
  }

  test("folds are O(delta): one immutable segment per fold, history bytes untouched") {
    val path = java.nio.file.Files.createTempDirectory("bm25seg").toString + "/ix"
    run(Seq(1L -> "x y", 2L -> "x x z").toDF("doc_id", "text"), path)
    val seg1 = segDirs(path)
    assert(seg1.size == 1, s"full build = one segment, got $seg1")
    // fingerprint the first segment's files — a fold must not rewrite them
    def fingerprint(seg: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/$seg"))
        .map(f => f.getPath -> (f.lastModified() + f.length())).toMap
    }
    val fp1 = fingerprint(seg1.head)
    run(Seq(1L -> "x y", 2L -> "x x z", 3L -> "w").toDF("doc_id", "text"), path)
    val seg2 = segDirs(path)
    assert(seg2.size == 2, s"a fold appends exactly one segment, got $seg2")
    assert(fingerprint(seg1.head) == fp1,
      "the fold rewrote history segment bytes — O(delta) violated")
    run(Seq(4L -> "x w y").toDF("doc_id", "text"), path)
    assert(segDirs(path).size == 3)
    // v3: the fold's df rides INSIDE its segment — no vocab-sized merged
    // snapshot dir is ever written, so a fold's written bytes are O(delta)
    val topDirs = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
    assert(topDirs.forall(_.startsWith("seg-")),
      s"non-segment dirs written by v3 folds: ${topDirs.filterNot(_.startsWith("seg-"))}")
    assert(segDirs(path).forall(s => new java.io.File(s"$path/$s/df").isDirectory),
      "a v3 segment is missing its per-segment df delta")
    // and the segmented index still answers exactly like one full build
    val full = Bm25.topK(Bm25.buildIndex(
      Seq(1L -> "x y", 2L -> "x x z", 3L -> "w", 4L -> "x w y")
        .toDF("doc_id", "text"), "doc_id", "text"), qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val replay = run(Seq(1L -> "x y").toDF("doc_id", "text"), path)
    assert(replay == full)
  }

  test("max_segments compaction: the overflowing fold rewrites to ONE segment, scores exact") {
    // the LSM bound: segments must not accumulate unboundedly (listing +
    // small-file overhead at fold count ~ thousands); the fold that would
    // exceed max_segments folds history + delta into one fresh segment
    // through the same atomic manifest commit
    val path = java.nio.file.Files.createTempDirectory("bm25cmp").toString + "/ix"
    def runMax2(c: DataFrame) =
      fn(Seq(c, qs), spark, Map("index_path" -> path, "k" -> "10",
        "max_segments" -> "2"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    runMax2(Seq(1L -> "x y").toDF("doc_id", "text"))
    runMax2(Seq(1L -> "x y", 2L -> "x x z").toDF("doc_id", "text"))
    assert(segDirs(path).size == 2, s"two folds = two segments: ${segDirs(path)}")
    val preCompaction = segDirs(path).toSet
    // third fold would make 3 > max_segments=2 → compacts to ONE
    runMax2(Seq(3L -> "w").toDF("doc_id", "text"))
    val mCompact = Bm25.readManifest(spark, path).get
    assert(mCompact.segments.size == 1,
      s"the overflowing fold must compact to one LIVE segment: $mCompact")
    // the superseded segments stay on disk ONE extra commit (the reader
    // grace period) and are unreferenced — the next commit sweeps them
    assert(preCompaction.subsetOf(segDirs(path).toSet),
      "grace period violated: superseded segments swept at their own commit")
    val full = Bm25.topK(Bm25.buildIndex(
      Seq(1L -> "x y", 2L -> "x x z", 3L -> "w", 4L -> "x w y")
        .toDF("doc_id", "text"), "doc_id", "text"), qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    // post-compaction fold appends again and the answer stays exact; ITS
    // sweep (prev = the compacted manifest) finally removes the
    // pre-compaction segments
    val out = runMax2(Seq(4L -> "x w y").toDF("doc_id", "text"))
    assert(out == full, "compacted index diverged from the full build")
    assert(segDirs(path).size == 2)
    assert((preCompaction -- segDirs(path).toSet) == preCompaction,
      "pre-compaction segments survived a SECOND commit — sweep regressed")
  }

  test("a torn fold (segments written, manifest never renamed) resumes exactly-once") {
    // the bm25_manifest crash window: data dirs staged, commit rename not
    // reached. The live manifest still names only the old state, so the
    // re-run re-folds the delta into ITS OWN fresh segment and the torn
    // dirs are swept as orphans — no double postings, no litter.
    val a = Seq(1L -> "x y", 2L -> "x x z")
    val b = Seq(3L -> "w", 4L -> "x w y")
    val path = java.nio.file.Files.createTempDirectory("bm25torn").toString + "/ix"
    run(a.toDF("doc_id", "text"), path)
    val committed = segDirs(path)
    // forge the torn state exactly as appendSegment stages it: a segment
    // and a df snapshot on disk, unreferenced by the manifest
    val torn = Bm25.buildIndex(b.toDF("doc_id", "text"), "doc_id", "text")
    torn.tf.write.parquet(s"$path/seg-torn0000/tf")
    torn.docLen.write.parquet(s"$path/seg-torn0000/doclen")
    torn.df.write.parquet(s"$path/df-torn0000")
    val resumed = run((a ++ b).toDF("doc_id", "text"), path)
    val full = Bm25.topK(Bm25.buildIndex((a ++ b).toDF("doc_id", "text"),
        "doc_id", "text"), qs, "qid", "qtext", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(resumed == full, "torn-fold resume diverged from the full build")
    val after = segDirs(path)
    assert(!after.contains("seg-torn0000"),
      s"torn segment survived the commit sweep: $after")
    assert(!new java.io.File(s"$path/df-torn0000").exists(),
      "torn df snapshot survived the commit sweep")
    assert((committed.toSet -- after.toSet).isEmpty,
      "the sweep removed a COMMITTED segment")
  }

  test("a re-texted known id refuses loudly; same-text replay still no-ops") {
    val path = java.nio.file.Files.createTempDirectory("bm25m").toString + "/ix"
    run(Seq(1L -> "x y", 2L -> "z").toDF("doc_id", "text"), path)
    // same ids, same text → replay, serves fine
    run(Seq(1L -> "x y", 2L -> "z").toDF("doc_id", "text"), path)
    // id 2 arrives with DIFFERENT text → append-only fold must refuse,
    // naming the id, not silently serve stale postings
    val e = intercept[graft.config.YamlConfig.ConfigError](
      run(Seq(1L -> "x y", 2L -> "z CHANGED", 3L -> "w").toDF("doc_id", "text"), path))
    assert(e.getMessage.contains("2"))
    assert(e.getMessage.contains("DIFFERENT text"))
    // the refusal must not have corrupted the live index: a clean
    // append-only run afterwards still works
    val ok = run(Seq(1L -> "x y", 2L -> "z", 3L -> "w").toDF("doc_id", "text"), path)
    assert(ok.nonEmpty)
  }

  test("duplicate ids WITHIN one batch refuse loudly — never double-fold") {
    // in-batch duplicates sail past the index-membership classification
    // (neither copy is indexed yet); folding both would double-count
    // nDocs/df forever in an append-only index
    val path = java.nio.file.Files.createTempDirectory("bm25dup").toString + "/ix"
    // full-build branch
    val e1 = intercept[graft.config.YamlConfig.ConfigError] {
      run(Seq(1L -> "x y", 1L -> "x z").toDF("doc_id", "text"), path)
    }
    assert(e1.getMessage.contains("duplicate ids") && e1.getMessage.contains("1"), e1.getMessage)
    // delta branch: build clean, then fold a batch whose NEW rows collide
    run(Seq(1L -> "x y").toDF("doc_id", "text"), path)
    val e2 = intercept[graft.config.YamlConfig.ConfigError] {
      run(Seq(1L -> "x y", 2L -> "w", 2L -> "w w").toDF("doc_id", "text"), path)
    }
    assert(e2.getMessage.contains("duplicate ids") && e2.getMessage.contains("2"), e2.getMessage)
    // a clean delta after the refusal still folds (the refusal mutated nothing)
    val ok = run(Seq(1L -> "x y", 2L -> "w").toDF("doc_id", "text"), path)
    assert(ok.nonEmpty)
  }

  test("missing index_path parameter refuses loudly") {
    val e = intercept[IllegalArgumentException](
      fn(Seq(Seq(1L -> "x").toDF("doc_id", "text"), qs), spark, Map.empty))
    assert(e.getMessage.contains("index_path"))
  }
}
