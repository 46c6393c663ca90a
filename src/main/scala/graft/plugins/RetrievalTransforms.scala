package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.TransformFunction
import graft.text.Bm25

/** Retrieval operators as pipeline plugin transforms (the function
  * plugin seam, like [[CurationTransforms]]). */
object RetrievalTransforms {

  /** Incrementally maintain a persisted BM25 index and answer a fixed
    * query set from it — the index IS the pipeline's state (the q59
    * "the table is the dedup state" posture applied to retrieval):
    *
    *  - no index at `index_path` → build from the FULL input corpus;
    *  - index present → the delta is the input rows whose ids the
    *    index's doc-length table does not know (one id-keyed join against
    *    index metadata — the indexed corpus text is never re-read), and
    *    [[Bm25.updateIndex]] folds them in EXACTLY (integer stats);
    *  - empty delta (a replayed run) → serve from the live index, no
    *    rewrite, no swap.
    *
    * Id-immutability contract: ids are append-only. A known id arriving
    * with the SAME text is a replay and is dropped; a known id whose
    * text CHANGED (detected via the content hash the index stores per
    * document) is refused loudly naming the offending ids — an
    * append-only fold cannot retract the old postings, and silently
    * ignoring the row would serve stale postings forever. Re-texting
    * documents requires deleting the index dir (next run full-rebuilds).
    *
    * All filesystem access goes through Spark's Hadoop FS layer, so
    * `index_path` may be any scheme the session can write (the same
    * contract as [[Bm25.saveIndex]]/[[Bm25.loadIndex]]). Persistence is
    * the SEGMENT-MANIFEST layout (Bm25's v2): each fold writes ONE new
    * segment (the delta's tf/doclen) plus a vocab-sized merged-df
    * snapshot and commits with a single atomic manifest rename —
    * maintenance writes are O(delta), the indexed corpus is never
    * re-read or rewritten, and a crash before the rename leaves the
    * previous index fully live (orphans swept at the next commit). If
    * the index is lost or unreadable anyway (a crash burned the
    * manifest, a foreign layout), the run self-heals by rebuilding from
    * the full accumulated corpus; both end states equal a fresh full
    * build, which the c14 gate pins against the full-corpus DuckDB
    * oracle. A pre-r16 flat-layout index still loads; its FIRST fold
    * migrates it with a one-time full rewrite.
    *
    * inputs: (corpus, queries). parameters: `index_path` (required),
    * `k` (default 5), `id_col`/`text_col`/`qid_col`/`qtext_col`,
    * `max_segments` (default 64 — a fold that would exceed it compacts
    * the whole index into one segment via the same atomic commit). */
  final class Bm25Maintain extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession,
        p: Map[String, Any]): DataFrame = {
      require(inputs.size == 2,
        s"Bm25Maintain needs (corpus, queries) inputs, got ${inputs.size}")
      Params.requireKnown(p, "Bm25Maintain",
        "index_path", "id_col", "text_col", "qid_col", "qtext_col", "k",
        "max_segments")
      val path = p.get("index_path").map(_.toString).getOrElse(
        throw new IllegalArgumentException("Bm25Maintain: index_path parameter is required"))
      val Seq(corpus, queries) = inputs
      val id = Params.str(p, "id_col", "doc_id")
      val text = Params.str(p, "text_col", "text")
      val qid = Params.str(p, "qid_col", "qid")
      val qtext = Params.str(p, "qtext_col", "qtext")
      val k = p.get("k").map(_.toString.toInt).getOrElse(5)
      val maxSegments = p.get("max_segments").map(_.toString.toInt).getOrElse(64)
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())

      // unreadable-but-present index dirs (a crash that burned the swap)
      // self-heal as a full rebuild rather than wedging every replay
      val live: Option[Bm25.Index] =
        if (!fs.exists(hp)) None
        else scala.util.Try(Bm25.loadIndex(spark, path)) match {
          case scala.util.Success(ix) => Some(ix)
          case scala.util.Failure(e) =>
            // self-heal by rebuilding, but say WHY — a standing
            // misconfiguration (permissions, throttling) must be
            // distinguishable from a one-off crash, or an O(delta)
            // pipeline silently runs O(corpus) forever
            System.err.println(
              s"[graft] Bm25Maintain: index at $path unreadable " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage}); rebuilding from full corpus")
            None
        }

      live match {
        case Some(ix) =>
          // ONE id-keyed join against the index's doc-length metadata
          // classifies every input row: no match → delta (to fold in);
          // match with the SAME content hash → already indexed (a
          // replayed run), drop; match with a DIFFERENT hash → the id
          // was re-texted, which an append-only fold cannot express —
          // refuse loudly rather than serve stale postings forever.
          // The indexed/delta split keys on a membership FLAG, not on the
          // hash being null: a pre-r13 index row loads with a NULL __hash
          // (loadIndex's legacy layout), and treating it as a delta would
          // re-fold an already-indexed doc — for those rows re-texting is
          // undetectable (documented loadIndex boundary), replay still
          // drops them. Cached: the changed-probe, the empty probe, the
          // delta's buildIndex stats, and three parquet writes all read it.
          val classified = corpus.join(
            ix.docLen.select(col("__doc").as(id), col("__hash").as("__ixhash"),
              lit(true).as("__indexed")),
            Seq(id), "left").cache()
          try {
            val changed = classified.filter(col("__ixhash").isNotNull &&
              md5(coalesce(col(text), lit(""))) =!= col("__ixhash"))
            val changedSample = changed.select(col(id)).take(6)
            if (changedSample.nonEmpty) throw graft.config.YamlConfig.ConfigError(
              s"Bm25Maintain: input rows ${changedSample.take(5).map(_.get(0)).mkString(", ")}" +
                (if (changedSample.length > 5) ", ..." else "") +
                s" carry ids the index at $path already knows but with DIFFERENT text. " +
                "The incremental fold is append-only (ids are immutable); to re-text " +
                "documents, delete the index directory and let the next run rebuild " +
                "from the full corpus.")
            val delta = classified.filter(col("__indexed").isNull)
              .drop("__ixhash", "__indexed")
            if (delta.isEmpty) Bm25.topK(ix, queries, qid, qtext, k)
            else {
              refuseDupIds(delta, id, path)
              Bm25.readManifest(spark, path) match {
                case Some(m) =>
                  // O(delta): one new segment carrying its own tf/doclen/df
                  // delta, committed by the manifest rename — the indexed
                  // corpus is never re-read or rewritten (until the
                  // max_segments compaction threshold, the amortized LSM
                  // fold); per-segment dfs merge at load
                  Bm25.appendSegment(ix, m, delta, id, text, path, maxSegments)
                case None =>
                  // legacy flat layout: migrate with a ONE-TIME full
                  // rewrite into the segment layout; every later fold on
                  // this index is O(delta)
                  Bm25.saveIndex(Bm25.updateIndex(ix, delta, id, text), path)
              }
              // kill-point: index committed, downstream hits table NOT yet
              // written — the double-fold window (a resume that re-folded
              // the delta would double every posting; the __indexed flag
              // classification above is what makes the replay a no-op)
              graft.exec.CrashForge.maybeHalt("bm25_fold")
              Bm25.topK(Bm25.loadIndex(spark, path), queries, qid, qtext, k)
            }
          } finally { classified.unpersist(): Unit }
        case None =>
          refuseDupIds(corpus, id, path)
          Bm25.saveIndex(Bm25.buildIndex(corpus, id, text), path)
          Bm25.topK(Bm25.loadIndex(spark, path), queries, qid, qtext, k)
      }
    }

    /** Duplicate ids WITHIN one batch sail past the index-membership
      * classification (neither copy is indexed yet) and buildIndex would
      * fold both — double-counted nDocs/df skew every score and the
      * append-only index can never retract them. One input-sized count
      * aggregate, loud with the offending ids. */
    private def refuseDupIds(df: DataFrame, id: String, path: String): Unit = {
      val dups = df.groupBy(col(id)).count().filter(col("count") > 1)
        .select(col(id)).take(6)
      if (dups.nonEmpty) throw graft.config.YamlConfig.ConfigError(
        s"Bm25Maintain: input batch carries duplicate ids " +
          s"${dups.take(5).map(_.get(0)).mkString(", ")}" +
          (if (dups.length > 5) ", ..." else "") +
          s" — the fold into $path is append-only and would double-count " +
          "their postings; dedup the batch upstream (d1/d8)")
    }

    // (the pre-r16 whole-index stage-and-swap is gone: Bm25.saveIndex /
    // appendSegment commit through the segment-manifest rename, which
    // keeps the live index intact until the single atomic commit point —
    // and folds stopped rewriting the corpus at all)
  }
}
