package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Sampling
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Driver-gate visibility for operators whose outputs are engine-specific
  * (hash-based sampling, stub-decoded multimodal features) — rows-only
  * checks, deterministic across runs. */
object Extras {

  /** Multimodal pipeline: text bytes → media table → batched stub decode →
    * per-mime feature summary. Deterministic (content-hash stub decoder). */
  def m1Multimodal(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromText(Tables.load(s, dir, "documents"), "doc_id", "text", "image/fake")
    Multimodal.extractFeatures(media)
      .select("media_id", "n_bytes", "width", "height", "channels", "sha_prefix")
  }

  /** Deterministic 10% hash sample of documents (reproducible curation). */
  def m2Sample(s: SparkSession, dir: String): DataFrame =
    Sampling.byHash(Tables.load(s, dir, "documents"), "doc_id", 0.1)
      .select("doc_id", "lang", "n_chars")

  /** Stratified mix: all English + 20% of the rest, tagged. */
  def m3StratifiedMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 1.0), default = 0.2)
      .select("doc_id", "lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_features" -> m1Multimodal,
    "m2_hash_sample" -> m2Sample,
    "m3_stratified_mix" -> m3StratifiedMix)

  /** No oracle SQL: outputs depend on engine-side hashing (xxhash64 / JVM
    * Arrays.hashCode) that DuckDB cannot reproduce — rows-only checks. */
  val oracle: Map[String, String] = Map.empty
}
