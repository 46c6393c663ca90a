package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     At 100 TB this is only viable for a bounded query set against a large
  *     corpus (queries broadcast; corpus scanned once, per-partition top-k via
  *     window).
  *   - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed by
  *     sign-bit signatures; candidates come from matching buckets (multi-probe
  *     over bands), then exact cosine re-ranks. The bucket join replaces the
  *     cross join, which is the part that survives a 1000-executor scale-up.
  *
  * All arithmetic is built-in array expressions (`zip_with`/`aggregate`) —
  * sequential folds, so scores are bit-deterministic across engines.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors
    * (excluding itself). Ties broken by neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Random-hyperplane signature: `numBits` sign bits, each from a projection
    * onto a pseudo-random hyperplane derived deterministically from
    * xxhash64(bit, dim) — no stored model, reproducible across runs. */
  private def rhpSignature(vec: Column, dim: Int, numBits: Int): Column = {
    val bits = (0 until numBits).map { b =>
      // hyperplane component for (bit b, dim d): uniform in [-1, 1)
      val proj = (0 until dim).map { d =>
        element_at(vec, d + 1) *
          (xxhash64(lit(b), lit(d)).cast("double") / lit(Long.MaxValue.toDouble))
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce[Column]((x, y) => x.bitwiseOR(y))
  }

  /** LSH-bucketed ANN: signature bands → bucket join → exact re-rank.
    * Recall < 1 by construction; the exact re-rank keeps precision = 1. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numBits: Int = 16,
      bandBits: Int = 8): DataFrame = {
    val numBands = numBits / bandBits
    val mask = (1L << bandBits) - 1
    def withSig(df: DataFrame, id: String, v: String) = {
      val s = df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v))
        .withColumn("sig", rhpSignature(col(v), dim, numBits))
      val bandCols = (0 until numBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * bandBits).bitwiseAND(mask).as("bsig")).as(s"b$b")
      }
      s.select(col(id), col(v), explode(array(bandCols: _*)).as("bk"))
        .select(col(id), col(v), col("bk.band"), col("bk.bsig"))
    }
    val qb = withSig(queries, "query_id", "qv")
    val cb = withSig(corpus, "neighbor_id", "cv")
    val candidates = qb.join(cb, Seq("band", "bsig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
    val scored = candidates
      .withColumn("cosine", dot(col("qv"), col("cv")) / (norm(col("qv")) * norm(col("cv"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}
