package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Sampling

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023): the
  * model-free counterpart to the trained selectors ([[NaiveBayes]] t13,
  * [[LanguageModel]] t16). Documents are featurized as HASHED n-gram
  * counts (unigrams + bigrams into `numBuckets` md5 buckets — the
  * portable [[Sampling.md5BucketOf]] recipe, so the features are
  * re-derivable in any md5-capable engine); a bag-of-buckets categorical
  * distribution is fit with add-one smoothing on the TARGET seed and on
  * the RAW corpus; each document's log importance weight is
  *
  *   logw(d) = Σ_b c_b(d) · ( ln p_target[b] − ln p_raw[b] ),
  *   p[b] = (cnt[b] + 1) / (tot + B)
  *
  * and selection is Gumbel-top-k over logw — high-weight (target-like)
  * documents are chosen with the sampling jitter the paper uses to avoid
  * a hard threshold's distribution collapse.
  *
  * Scale posture: the corpus is exploded ONCE into (doc, bucket) counts —
  * one hash exchange; the raw bucket distribution derives from that frame
  * (never a second corpus scan); the weight table is exactly B rows
  * (bounded by construction, broadcast), so scoring is one broadcast join
  * + a map-side-combinable per-doc SUM. Selection is `orderBy + limit(k)`
  * — Spark plans TakeOrderedAndProject (per-partition top-k then a k-row
  * merge), never a global sort.
  *
  * Determinism: counts are exact integers and each bucket's ln-term is a
  * fixed IEEE chain; the per-doc sum is order-dependent, so weights are
  * emitted at round(·, 6) — the d5/t16 posture. Gumbel noise is the
  * deterministic md5 uniform u = (bucket + 0.5) / 2^32 (exact: the
  * division is by a power of two), so a selection is reproducible
  * bit-for-bit across runs, partitionings, and engines. */
object Dsir {

  /** Unigram + bigram feature rows of `textCol` (bigram feature = the two
    * tokens joined by one space), with `extra` columns carried through.
    * NULL text is the empty document (one empty-string unigram, no
    * bigrams) — a row must never silently vanish from the weighting
    * (the paragraphDedup convention). */
  private def features(df: DataFrame, textCol: String, extra: Column*): DataFrame = {
    val w = split(coalesce(col(textCol), lit("")), " ")
    val uni = df.select(extra :+ explode(w).as("__f"): _*)
    // slice length max(n-1, 0): a one-token doc has no bigrams
    val pairs = arrays_zip(
      slice(w, lit(1), greatest(size(w) - 1, lit(0))).as("h"),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))).as("c"))
    val bi = df.select(extra :+ explode(pairs).as("__p"): _*)
      .withColumn("__f", concat_ws(" ", col("__p.h"), col("__p.c")))
      .drop("__p")
    uni.unionByName(bi.select(uni.columns.map(col): _*))
  }

  /** Log importance weight per corpus document (column `dsir_logw`,
    * rounded to 6 decimals — compare and threshold at this precision).
    * Resource note: the (doc, bucket) count frame is cached (three
    * consumers: the raw distribution, its total, and the scoring join) and
    * stays resident after the result materializes — the same
    * `clearCache()` lifecycle as [[graft.dedup.Dedup.incrementalNearDup]]
    * for long-running sessions. */
  def logWeights(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      numBuckets: Int = 10000, salt: Int = 0): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    val bucket = pmod(Sampling.md5BucketOf(col("__f"), lit(salt.toString)),
      lit(numBuckets.toLong))
    // target side first: an empty target must refuse BEFORE any
    // corpus-scale job runs (an empty target would make every weight the
    // same raw-only constant shape — a silent selection no-op; the
    // LanguageModel/NaiveBayes empty-seed guard, applied here). tgtCnt is
    // cached: it feeds both the total and the weight-table join.
    val tgtCnt = features(target, targetTextCol).withColumn("__b", bucket)
      .groupBy("__b").agg(count(lit(1)).as("__ct")).cache()
    val totT = tgtCnt.agg(sum(col("__ct"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(totT > 0, "Dsir.logWeights: empty target")
    // ONE corpus explode -> (doc, bucket) counts; the raw distribution
    // derives from this frame, never a second pass over the corpus
    val docB = features(corpus, textCol, col(idCol).as("__id"))
      .withColumn("__b", bucket)
      .groupBy("__id", "__b").agg(count(lit(1)).as("__c")).cache()
    val rawCnt = docB.groupBy("__b").agg(sum(col("__c")).as("__cr"))
    val totR = rawCnt.agg(sum(col("__cr"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(totR > 0, "Dsir.logWeights: empty corpus")
    val lnTotT = math.log((totT + numBuckets).toDouble)
    val lnTotR = math.log((totR + numBuckets).toDouble)
    // B rows by construction -> broadcast; left join: buckets unseen in
    // the target carry ct=0 and cost ln(1/(totT+B)) per occurrence
    val wtab = broadcast(rawCnt.join(tgtCnt, Seq("__b"), "left")
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + 1).cast("double")) - lit(lnTotT)
          - log((col("__cr") + 1).cast("double")) + lit(lnTotR)).as("__lnw")))
    docB.join(wtab, Seq("__b"))
      .groupBy("__id")
      .agg(round(sum(col("__c").cast("double") * col("__lnw")), 6).as("dsir_logw"))
      .select(col("__id").as(idCol), col("dsir_logw"))
  }

  /** Gumbel-top-k selection over importance weights: rank by
    * `weight + g` where `g = -ln(-ln(u))` and `u` is the deterministic
    * md5 uniform of the document id — reproducible resampling without a
    * random number generator; a different `salt` is a fresh draw. */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the AsOfJoin/RangeJoin reserved-name convention: withColumn would
    // silently CLOBBER a caller column of the same name and drop() would
    // then remove it from the output entirely
    val reserved = weights.columns
      .filter(c => c.equalsIgnoreCase("__gumbel") || c.equalsIgnoreCase("__score"))
    require(reserved.isEmpty,
      s"column name(s) ${reserved.mkString(", ")} are reserved by gumbelTopK; rename first")
    val u = (Sampling.md5Bucket(idCol, salt) + lit(0.5)) /
      lit(Sampling.PortableBuckets.toDouble)
    weights
      .withColumn("__gumbel", -log(-log(u)))
      .withColumn("__score", col(weightCol) + col("__gumbel"))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k)
      .drop("__gumbel", "__score")
  }
}
