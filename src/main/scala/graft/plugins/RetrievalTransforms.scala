package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.exec.TransformFunction
import graft.text.Bm25

/** Retrieval operators as pipeline plugin transforms (the function
  * plugin seam, like [[CurationTransforms]]). */
object RetrievalTransforms {

  private def str(p: Map[String, Any], k: String, d: String): String =
    p.get(k).map(_.toString).getOrElse(d)

  /** Incrementally maintain a persisted BM25 index and answer a fixed
    * query set from it — the index IS the pipeline's state (the q59
    * "the table is the dedup state" posture applied to retrieval):
    *
    *  - no index at `index_path` → build from the FULL input corpus;
    *  - index present → the delta is the input rows whose ids the
    *    index's doc-length table does not know (one anti-join against
    *    index metadata — the indexed corpus text is never re-read), and
    *    [[Bm25.updateIndex]] folds them in EXACTLY (integer stats).
    *
    * Crash/replay posture: a replayed run's delta is empty and
    * updateIndex no-ops (idempotent); a crash that loses the index
    * between stage and swap self-heals, because the next run rebuilds
    * from the full accumulated corpus — both end states equal a fresh
    * full build, which the c14 gate pins against the full-corpus DuckDB
    * oracle. The refreshed index is staged to a sibling dir and swapped
    * in (never written over the files it is concurrently reading).
    *
    * inputs: (corpus, queries). parameters: `index_path` (required),
    * `k` (default 5), `id_col`/`text_col`/`qid_col`/`qtext_col`. */
  final class Bm25Maintain extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession,
        p: Map[String, Any]): DataFrame = {
      require(inputs.size == 2,
        s"Bm25Maintain needs (corpus, queries) inputs, got ${inputs.size}")
      val path = p.get("index_path").map(_.toString).getOrElse(
        throw new IllegalArgumentException("Bm25Maintain: index_path parameter is required"))
      val Seq(corpus, queries) = inputs
      val id = str(p, "id_col", "doc_id")
      val text = str(p, "text_col", "text")
      val k = p.get("k").map(_.toString.toInt).getOrElse(5)
      val refreshed = if (new java.io.File(path).exists()) {
        val ix = Bm25.loadIndex(spark, path)
        val delta = corpus.join(
          ix.docLen.select(col("__doc").as(id)), Seq(id), "left_anti")
        Bm25.updateIndex(ix, delta, id, text)
      } else Bm25.buildIndex(corpus, id, text)
      // stage-and-swap: the refreshed index lazily READS the live files,
      // so it must land beside them, then replace them
      val stage = s"$path-stage"
      Bm25.saveIndex(refreshed, stage)
      graft.exec.Fs.deleteRecursively(path)
      require(new java.io.File(stage).renameTo(new java.io.File(path)),
        s"Bm25Maintain: could not swap $stage into place at $path")
      Bm25.topK(Bm25.loadIndex(spark, path), queries,
        str(p, "qid_col", "qid"), str(p, "qtext_col", "qtext"), k)
    }
  }
}
