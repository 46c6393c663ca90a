package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020): fit an LM on a trusted reference corpus
  * (Wikipedia in CCNet; any curated seed here), score every candidate
  * document by its per-token cross-entropy under that model, and keep the
  * low-perplexity (reference-like) tail. This is the MODEL-based
  * complement to [[TextAnalysis]]'s heuristic quality scores and the
  * sequence-aware complement to [[NaiveBayes]]'s bag-of-words classifier:
  * a bigram LM is sensitive to word ORDER (shuffled text scores badly even
  * when its unigram profile is clean), which is exactly the failure mode
  * boilerplate/SEO spam exhibits.
  *
  * Model: bigram LM with add-one (Laplace) smoothing over a BOS-prefixed
  * token stream. For a document w_1..w_n (whitespace tokens, the repo-wide
  * t3/t6 DuckDB-parity convention) with w_0 = BOS:
  *
  *   P(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}) + V)
  *
  * where c(·,·)/c(·) are seed bigram/context counts and V = |seed vocab|+1
  * (one reserved slot of unknown-word mass — the same open-vocabulary
  * operational shortcut as [[NaiveBayes]]). Cross-entropy
  * xent = -(1/n)·Σ ln P; perplexity = exp(xent).
  *
  * Scale posture (the decomposition is the whole design): expanding ln P,
  *
  *   Σ_i ln P_i = S_p - n·ln(V) - S_c
  *     S_p = Σ_{bigrams SEEN in seed}   ln(c(h,w) + 1)
  *     S_c = Σ_{contexts SEEN in seed} (ln(c(h) + V) - ln(V))
  *
  * so unseen bigrams/contexts contribute exactly 0 to their sums and the
  * joins are INNER and seed-keyed: corpus bigrams that never occur in the
  * seed never enter a join (the [[NaiveBayes]]/t9 shape — at 100 TB the
  * corpus streams through two inner hash joins against seed-sized count
  * tables, AQE splitting hot keys; no OOV token rewrite pass, no per-token
  * vocabulary join, nothing corpus-sized is ever regrouped except the
  * final per-doc SUM, which is map-side combinable).
  *
  * Determinism: counts are exact integers; each ln() term and the per-doc
  * sums are doubles, so cross-engine bits can drift in the last few ulps
  * (~1e-10 worst case for a 10k-token doc). Consumers compare at
  * round(·, 6) — the d5 round-then-compare posture; keep decisions must be
  * made on the ROUNDED value so both engines agree trivially. */
object LanguageModel {

  /** BOS sentinel — U+0002 cannot appear in whitespace-split tokens of
    * well-formed text and matches the oracle's chr(2). */
  val Bos = "\u0002"

  /** Trained bigram model: seed-sized count frames plus the smoothing
    * constants. Persist `pairCounts`/`contextCounts` as tables for the
    * train-once/score-many posture (the PQ/IVF codebook seam). */
  final case class BigramLm(pairCounts: DataFrame, contextCounts: DataFrame,
      vocabSize: Long) {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    /** ln(V) as one driver-side IEEE op — identical operand, identical
      * bits, on any engine computing ln correctly rounded to <=1 ulp. */
    def lnV: Double = math.log(vocabSize.toDouble)
  }

  /** `(hist, cur)` bigram rows of `textCol` with a BOS-prefixed history —
    * exactly n bigrams for n tokens, so empty docs ([""] after split)
    * still produce one row and n is never 0. NULL text is the empty
    * document (the paragraphDedup convention) — a corpus row must never
    * silently vanish from scoring. */
  private def bigrams(df: DataFrame, textCol: String, extra: Column*): DataFrame = {
    val w = split(coalesce(col(textCol), lit("")), " ")
    val full = concat(array(lit(Bos)), w)
    val pairs = arrays_zip(
      slice(full, lit(1), size(w)).as("hist"), w.as("cur"))
    val exploded = df.select(extra :+ explode(pairs).as("p"): _*)
    exploded.select(exploded.columns.filter(_ != "p").map(col) :+
      col("p.hist") :+ col("p.cur"): _*)
  }

  /** Fit the bigram LM on `seed`. One explode over the seed; bigram and
    * context counts are one map-side-combinable aggregation each (the
    * context counts derive from the bigram counts — the seed is scanned
    * once). The vocab count is the only driver-side value. Resource
    * note: the bigram-count frame is cached and stays resident — the
    * `clearCache()` lifecycle shared with [[merge]] and the other
    * caching operators. */
  def train(seed: DataFrame, textCol: String): BigramLm = {
    val bg = bigrams(seed, textCol).groupBy("hist", "cur")
      .agg(count(lit(1)).as("c")).cache()
    val ctx = bg.groupBy("hist").agg(sum(col("c")).as("c"))
    // V = distinct seed TOKENS + 1: `cur` ranges over every seed token
    // (BOS is never a `cur`), so distinct cur IS the vocabulary
    val vocab = bg.select("cur").distinct().count()
    // an empty seed would otherwise yield the degenerate V=1/lnV=0 model
    // that scores EVERY doc xent=0 — a silent total quality-gate bypass
    // (the NaiveBayes empty-seed guard, applied here)
    require(vocab > 0, "LanguageModel.train: empty seed")
    BigramLm(bg, ctx, vocab + 1)
  }

  /** Score `corpus` under `lm`: returns `(idCol, n_tokens, xent, ppl)` for
    * EVERY corpus row — xent/ppl rounded to 6 decimals (consumers and the
    * DuckDB oracle compare at this precision; threshold filters must be
    * applied to these rounded values). */
  def crossEntropy(lm: BigramLm, corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg = bigrams(corpus, textCol, col(idCol).as("__id"))
    val sp = bg.join(lm.pairCounts.select(col("hist"), col("cur"),
        log((col("c") + 1).cast("double")).as("__ln")), Seq("hist", "cur"))
      .groupBy("__id").agg(sum(col("__ln")).as("__sp"))
    val sc = bg.join(lm.contextCounts.select(col("hist"),
        (log((col("c") + lm.vocabSize).cast("double")) - lit(lm.lnV)).as("__ln")),
        Seq("hist"))
      .groupBy("__id").agg(sum(col("__ln")).as("__sc"))
    val n = corpus.select(col(idCol).as("__id"),
      size(split(coalesce(col(textCol), lit("")), " ")).as("__n"))
    val xent = (col("__n").cast("double") * lit(lm.lnV) +
      coalesce(col("__sc"), lit(0.0)) - coalesce(col("__sp"), lit(0.0))) /
      col("__n").cast("double")
    // ppl derives from the ROUNDED xent: exp() amplifies absolute drift by
    // a factor of ppl itself, so exp(raw xent) could cross a round-6
    // boundary where exp(rounded xent) cannot (both engines exponentiate
    // the identical rounded operand)
    val xentR = round(xent, 6)
    n.join(sp, Seq("__id"), "left").join(sc, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("__n").as("n_tokens"),
        xentR.as("xent"), round(exp(xentR), 6).as("ppl"))
  }

  /** Train-and-score convenience (the t16 gate shape). */
  def perplexity(corpus: DataFrame, idCol: String, textCol: String,
      seed: DataFrame, seedTextCol: String): DataFrame =
    crossEntropy(train(seed, seedTextCol), corpus, idCol, textCol)

  /** Merge two trained models into the model `train` would have produced
    * on the concatenated seeds — bigram counts ADD, so the merge is EXACT
    * (spec-pinned), which makes training map-reduce-composable: shard a
    * 100 TB seed, train per shard, merge pairwise; or maintain a rolling
    * model by merging each new batch's counts (the d8 posture — history
    * counts are vocab-sized and never re-derived from text). Resource
    * note: like [[train]], each call caches its merged count frame and
    * leaves it resident — a pairwise merge tree over many shards should
    * `spark.catalog.clearCache()` between levels (the
    * [[graft.dedup.Dedup.incrementalNearDup]] lifecycle). */
  def merge(a: BigramLm, b: BigramLm): BigramLm = {
    val pairs = a.pairCounts.unionByName(b.pairCounts)
      .groupBy("hist", "cur").agg(sum(col("c")).as("c")).cache()
    val ctx = pairs.groupBy("hist").agg(sum(col("c")).as("c"))
    val vocab = pairs.select("cur").distinct().count()
    require(vocab > 0, "LanguageModel.merge: empty models")
    BigramLm(pairs, ctx, vocab + 1)
  }

  /** Persist a trained model: count frames plus a 1-row vocab-size frame,
    * ALL as parquet through Spark's filesystem layer — so the model
    * round-trips on any path the session can write (s3a/hdfs/local), not
    * just the driver's local disk. The train-once/serve-many seam shared
    * with the PQ/IVF codebooks (integer counts round-trip exactly, so a
    * loaded model scores bit-identically to the fresh one). */
  def save(lm: BigramLm, path: String): Unit = {
    lm.pairCounts.write.mode("overwrite").parquet(s"$path/pairs")
    lm.contextCounts.write.mode("overwrite").parquet(s"$path/contexts")
    val spark = lm.pairCounts.sparkSession
    import spark.implicits._
    Seq(lm.vocabSize).toDF("vocab_size").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramLm = {
    // validate each piece as it is read: a foreign directory fails on its
    // FIRST wrong table with the named message
    val pairs = spark.read.parquet(s"$path/pairs")
    require(pairs.columns.toSet == Set("hist", "cur", "c"),
      s"$path/pairs is not a bigram-LM pair table (have: ${pairs.columns.mkString(",")})")
    val ctx = spark.read.parquet(s"$path/contexts")
    require(ctx.columns.toSet == Set("hist", "c"),
      s"$path/contexts is not a bigram-LM context table (have: ${ctx.columns.mkString(",")})")
    val meta = spark.read.parquet(s"$path/meta")
    require(meta.columns.toSet == Set("vocab_size"),
      s"$path/meta is not a bigram-LM meta table (have: ${meta.columns.mkString(",")})")
    val rows = meta.collect()
    require(rows.length == 1, s"$path/meta must hold exactly one row, got ${rows.length}")
    BigramLm(pairs, ctx, rows(0).getLong(0))
  }
}
