package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained text classification for corpus curation — the role the fastText
  * classifier plays in CCNet/RefinedWeb-style pipelines (domain/quality/
  * language filtering by a MODEL fit on labeled seed data, complementing
  * the heuristic scorers in [[TextAnalysis]]). Multinomial Naive Bayes
  * with Laplace smoothing: exact integer count statistics (one aggregation
  * over the exploded seed), then a scoring pass whose per-class
  * log-likelihood decomposes as
  *
  *   score(d, c) = ln(prior_c) − n_d·ln(tot_c + V) + Σ_{w∈d} ln(cnt_{c,w}+1)
  *
  * so UNKNOWN words never enter the join (they contribute ln(1) = 0 to the
  * sum and are fully covered by the n_d·ln(tot_c+V) term) — the word join
  * is inner, word-keyed, and carries only seed-vocabulary hits.
  *
  * Scale posture: training is one explode + one map-side-combinable count
  * per (class, word); scoring is one explode + a word-keyed inner join
  * (the t9 word-rarity shape — AQE splits hot words) + a (doc, class) SUM,
  * then a |classes|-row broadcast for priors/totals. Nothing is collected;
  * the model lives as a DataFrame keyed by word.
  *
  * Determinism: scores are double log-sums, so cross-engine bits can drift
  * in the last ulp — predictions are emitted only where the winner's
  * MARGIN over the runner-up exceeds `minMargin` (ties broken by label
  * ascending), which makes the emitted (id, label) rows reproducible on
  * any engine computing the same math (the d5 round-then-compare posture,
  * done by filtering instead of rounding). */
object NaiveBayes {

  /** Classify `corpus` rows by the label distribution of `seed`.
    * Tokenization is the repo-wide single-space split (the t3/t6 DuckDB
    * parity convention). NULL text is the empty document (one empty-string
    * token, the LanguageModel/Dsir/Bm25 convention) — a corpus row never
    * silently vanishes from classification, and a NULL-text seed row still
    * contributes its prior AND its one-token count to its class. Returns
    * `(idCol, predicted)` for every corpus row whose decision margin
    * exceeds `minMargin`. */
  def classify(corpus: DataFrame, idCol: String, textCol: String,
      seed: DataFrame, seedTextCol: String, labelCol: String,
      minMargin: Double = 1e-6): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    // ONE pass over the exploded seed: wordCounts is cached (the vocab
    // count materializes it; class totals derive from it by summation;
    // the scoring join reads it) — without the cache each consumer would
    // re-explode the seed. Resource note: the cached frame stays resident
    // after the result materializes — same `clearCache()` lifecycle as
    // Dedup.incrementalNearDup for long-running sessions.
    val wordCounts = seed.select(col(labelCol).as("__label"),
        explode(split(coalesce(col(seedTextCol), lit("")), " ")).as("__w"))
      .groupBy("__label", "__w")
      .agg(count(lit(1)).as("__cnt")).cache()
    val classTotals = wordCounts.groupBy("__label")
      .agg(sum(col("__cnt")).as("__tot"))
    val classDocs = seed.groupBy(col(labelCol).as("__label"))
      .agg(count(lit(1)).as("__nd"))
    val vocab = wordCounts.select("__w").distinct().count()
    val nSeed = seed.count()
    require(nSeed > 0, "NaiveBayes.classify: empty seed")
    // |classes| rows: prior and the per-word unknown penalty, broadcast
    val classStats = broadcast(
      classDocs.join(classTotals, Seq("__label"))
        .select(col("__label"),
          (log(col("__nd").cast("double")) - log(lit(nSeed.toDouble))).as("__prior"),
          log((col("__tot") + lit(vocab)).cast("double")).as("__lnTotV")))

    val docWords = corpus.select(col(idCol).as("__id"),
      explode(split(coalesce(col(textCol), lit("")), " ")).as("__w"))
    val docLen = docWords.groupBy("__id").agg(count(lit(1)).as("__n"))
    val sumLn = docWords
      .join(wordCounts.select(col("__w"), col("__label"),
        log((col("__cnt") + 1).cast("double")).as("__lnC")), Seq("__w"))
      .groupBy("__id", "__label").agg(sum(col("__lnC")).as("__s"))
    val scores = docLen.crossJoin(classStats)
      .join(sumLn, Seq("__id", "__label"), "left")
      .select(col("__id"), col("__label"),
        (col("__prior") - col("__n") * col("__lnTotV") +
          coalesce(col("__s"), lit(0.0))).as("__score"))
    val w = Window.partitionBy("__id")
      .orderBy(col("__score").desc, col("__label").asc)
    scores
      .withColumn("__rn", row_number().over(w))
      .withColumn("__next", lead(col("__score"), 1).over(w))
      .filter(col("__rn") === 1 &&
        (col("__next").isNull || col("__score") - col("__next") > minMargin))
      .select(col("__id").as(idCol), col("__label").as("predicted"))
  }
}
