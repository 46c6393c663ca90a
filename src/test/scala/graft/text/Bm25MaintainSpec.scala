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
    // present-but-unreadable index (a crash that burned the swap): the
    // run must rebuild, not wedge on loadIndex forever
    graft.exec.Fs.deleteRecursively(s"$path/tf")
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
    Bm25.saveIndex(Bm25.buildIndex(a.toDF("doc_id", "text"), "doc_id", "text"), path)
    // forge the legacy layout: strip __hash from the persisted doclen
    val legacy = spark.read.parquet(s"$path/doclen").drop("__hash")
    legacy.write.mode("overwrite").parquet(s"$path/doclen-legacy")
    graft.exec.Fs.deleteRecursively(s"$path/doclen")
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$path/doclen-legacy"),
      java.nio.file.Paths.get(s"$path/doclen"))
    assert(spark.read.parquet(s"$path/doclen").columns.toSet == Set("__doc", "__len"))
    // DELTA-ONLY input (history absent): the legacy index must load and
    // fold b — a mislabeled rebuild here would lose docs 1 and 2
    val out = run(b.toDF("doc_id", "text"), path)
    assert(out == full)
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
