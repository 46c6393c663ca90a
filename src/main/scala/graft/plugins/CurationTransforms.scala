package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, Sampling}
import graft.exec.TransformFunction
import graft.text.TextAnalysis

/** The LLM-data operators packaged as pipeline plugin transforms, so a
  * training-data curation pipeline is just a YAML flowgroup (the function
  * plugin seam — SURVEY §2.2 python transform row). Each stage reads its
  * knobs from `parameters` and returns the filtered corpus; chain them:
  * quality → exact dedup → near-dup clusters → decontaminate → sample. */
object CurationTransforms {

  private def str(p: Map[String, Any], k: String, d: String): String =
    Params.str(p, k, d)
  private def num(p: Map[String, Any], k: String, d: Double): Double =
    Params.num(p, k, d)

  /** Solve token-budget mixture rates over pre-aggregated per-group counts
    * — [[Sampling.mixtureRates]] (the m9 operator) through the plugin
    * seam, so a curation pipeline's final sampling plan is one YAML step.
    * parameters: `group_col`/`tokens_col`/`weight_col` (column names in
    * the input view) and `budget_num`/`budget_den` — the token budget is
    * total input tokens × num / den (integer arithmetic, so the DuckDB
    * oracle reproduces it exactly). Output = mixtureRates' plan rows:
    * (group, n_tokens, weight, target_tokens, rate). */
  final class MixtureRates extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "MixtureRates",
        "group_col", "tokens_col", "weight_col", "budget_num", "budget_den")
      val in = inputs.head
      val tokens = str(p, "tokens_col", "n_tokens")
      // one-row aggregate collect: the budget is a CONFIG-scale scalar
      // (the m9 gate's documented pattern); coalesce because sum() over
      // zero rows is null — an empty counts view is a valid no-op plan
      val tot = in.agg(coalesce(sum(col(tokens)), lit(0L)).cast("long"))
        .head.getLong(0)
      val (bNum, bDen) = (num(p, "budget_num", 4.0), num(p, "budget_den", 5.0))
      require(bNum >= 0 && bNum == bNum.floor && bDen >= 1 && bDen == bDen.floor,
        s"MixtureRates: budget_num/budget_den must be integers with num >= 0 " +
          s"and den >= 1, got num=$bNum den=$bDen — the budget is " +
          "total tokens * num / den in exact integer arithmetic " +
          "(budget_den: 0.5 is NOT 'keep half'; that is num=1, den=2)")
      // multiplyExact: a corpus-scale `tot` times a large configured
      // numerator silently WRAPS in plain Long arithmetic — a negative
      // budget reads as "keep nothing", the exact silent under-fill the
      // solver exists to avoid. Refuse loudly instead.
      val budget = try Math.multiplyExact(tot, bNum.toLong) / bDen.toLong
        catch { case _: ArithmeticException => throw new IllegalArgumentException(
          s"MixtureRates: total tokens ($tot) * budget_num (${bNum.toLong}) " +
            "overflows Long — lower budget_num (the budget is tot*num/den; " +
            "num/den need not be large to express any ratio)") }
      Sampling.mixtureRates(in, str(p, "group_col", "source"), tokens,
        str(p, "weight_col", "weight"), budget)
    }
  }

  /** Keep documents passing the heuristic quality gate (t2's quality_keep). */
  final class QualityFilter extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "QualityFilter", "text_col")
      val in = inputs.head
      TextAnalysis.qualityFeatures(in, str(p, "text_col", "text"))
        .filter(col("quality_keep"))
        .select(in.columns.toIndexedSeq.map(col): _*)
    }
  }

  /** Extract clean text from an HTML column ([[TextAnalysis.htmlToText]]'s
    * chain) — the WARC-response → document-text step of a web-curation
    * pipeline. parameters: `html_col` (default "html"), `out_col`
    * (default "text"); other columns pass through. */
  final class HtmlExtract extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "HtmlExtract", "html_col", "out_col")
      inputs.head.withColumn(str(p, "out_col", "text"),
        TextAnalysis.htmlToText(col(str(p, "html_col", "html"))))
    }
  }

  /** Keep one document per exact content hash (the group's min id). */
  final class ExactDedupFilter extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "ExactDedupFilter", "id_col", "text_col")
      val (in, id, text) = (inputs.head, str(p, "id_col", "doc_id"), str(p, "text_col", "text"))
      val keepers = Dedup.exact(in, id, text).select(col("keeper").as(id))
      in.join(keepers, Seq(id), "left_semi")
    }
  }

  /** Drop near-duplicates: MinHash-LSH pairs → connected components → keep
    * only each cluster's canonical (min-id) member. */
  final class NearDupFilter extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "NearDupFilter", "id_col", "text_col", "threshold")
      val (in, id, text) = (inputs.head, str(p, "id_col", "doc_id"), str(p, "text_col", "text"))
      val pairs = Dedup.minHashLsh(in, id, text,
        threshold = num(p, "threshold", 0.6))
      val components = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val losers = components.filter(col("id") =!= col("component"))
        .select(col("id").as(id))
      in.join(losers, Seq(id), "left_anti")
    }
  }

  /** Drop documents sharing any n-gram with the probe (benchmark) input —
    * the second input view is the probe set. */
  final class Decontaminate extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "Decontaminate", "id_col", "text_col", "ngram")
      val Seq(corpus, probes) = inputs.take(2)
      val (id, text) = (str(p, "id_col", "doc_id"), str(p, "text_col", "text"))
      val contaminated = Dedup.contamination(corpus, probes, id, text, id, text,
        n = num(p, "ngram", 8).toInt).select(col(id))
      corpus.join(contaminated, Seq(id), "left_anti")
    }
  }

  /** Deterministic hash sample at `fraction` (portable md5 mode optional). */
  final class HashSample extends TransformFunction {
    def apply(inputs: Seq[DataFrame], spark: SparkSession, p: Map[String, Any]): DataFrame = {
      Params.requireKnown(p, "HashSample", "id_col", "fraction", "portable")
      Sampling.byHash(inputs.head, str(p, "id_col", "doc_id"),
        num(p, "fraction", 1.0),
        portable = p.get("portable").exists(_.toString.toBoolean))
    }
  }
}
