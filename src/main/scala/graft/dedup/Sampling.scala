package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * All sampling here is *hash-based*, not RNG-based: a row's inclusion
  * depends only on its key (`xxhash64(key, salt)`), so samples are
  * reproducible across runs, cluster sizes, and partitionings — the property
  * that matters when a 100 TB corpus is resampled incrementally (a re-run
  * must keep/drop the same documents). No shuffle: sampling is a filter.
  *
  * RECIPE VERSION NOTE (stability across engine versions): the default
  * (non-portable) bucket space widened from 1e6 to 2^32 in r15 — rates
  * under 1e-6 used to floor to a ZERO threshold and silently keep nothing.
  * Within either version the kept set is stable, but ACROSS the boundary
  * the kept set at a given (key, salt, fraction) SHIFTS: `pmod(xxhash64(k,
  * salt), 1e6) < f*1e6` and `pmod(..., 2^32) < f*2^32` select different
  * keys. Incrementally-sampled corpora built under the old recipe must
  * either resample from scratch or pin the old engine for that corpus —
  * there is no compatibility switch, deliberately: keeping the floored
  * recipe available would preserve the silent under-fill bug it had. The
  * `portable = true` arm (md5, documented below) is unchanged and was
  * always 2^32-wide.
  */
object Sampling {

  /** Portable 32-bit bucket in [0, 2^32): the big-endian first 8 hex chars
    * of `md5(key + ":" + salt)`. Reproducible in ANY engine with md5 (DuckDB:
    * `('0x' || substring(md5(k || ':0'), 1, 8))::BIGINT`) — use when a
    * sample must be re-derivable outside this engine (audits, oracles,
    * cross-system curation). xxhash64 stays the cheap default. */
  def md5Bucket(keyCol: String, salt: Int): Column =
    md5Bucket(keyCol, lit(salt.toString))

  /** Column-salt overload (epoch-dependent draws etc.). */
  def md5Bucket(keyCol: String, salt: Column): Column =
    md5BucketOf(col(keyCol), salt)

  /** Column-key form (computed keys, e.g. DSIR's n-gram features) — the
    * ONE copy of the documented portable recipe; all arities delegate
    * here so they stay in sync with the DuckDB spelling above by
    * construction. */
  def md5BucketOf(key: Column, salt: Column): Column =
    // NULL keys hash an empty-string sentinel (DuckDB: COALESCE(CAST(k
    // AS VARCHAR), '')): a bare concat would be NULL for a NULL key, the
    // bucket would be NULL, and every `bucket < threshold` filter in this
    // file would silently DROP null-key rows — even at fraction 1.0 —
    // while the xxhash64 arm (which hashes null inputs to the seed) keeps
    // them. Non-null keys hash exactly as before. (A literal ""-keyed
    // row shares the NULL bucket — both are deterministic, neither is
    // dropped, and no castable key type renders to "".)
    conv(substring(md5(concat(coalesce(key.cast("string"), lit("")),
      lit(":"), salt.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long")

  /** Bucket-space size of the portable recipe: 2^32, the range of 8 hex
    * chars. Public so derived math (e.g. Dsir's uniform u = (bucket+0.5)/
    * PortableBuckets) stays in lockstep with the recipe's width by
    * construction. */
  val PortableBuckets = 4294967296L // 2^32
  // the default (xxhash64) space matches the portable width: a 1e6-bucket
  // space floors any effective rate below 1e-6 to a ZERO threshold — e.g.
  // applyMixture solving a 5000-token budget against a 1e10-token source
  // keeps NOTHING instead of ~5e-7 of it, silently under-filling the very
  // budget the solver exists to hit; at 2^32 the floor is 2.3e-10
  private val HashBuckets = 4294967296L // 2^32

  private def bucketAndScale(keyCol: String, salt: Int, portable: Boolean): (Column, Long) =
    if (portable) (md5Bucket(keyCol, salt), PortableBuckets)
    else (pmod(xxhash64(col(keyCol), lit(salt)), lit(HashBuckets)), HashBuckets)

  /** Keep ~`fraction` of rows, decided by key hash (deterministic). */
  def byHash(df: DataFrame, keyCol: String, fraction: Double, salt: Int = 0,
      portable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val (bucket, scale) = bucketAndScale(keyCol, salt, portable)
    df.filter(bucket < (fraction * scale).toLong)
  }

  /** Per-stratum fractions (`sampleBy` made deterministic): each stratum
    * value samples at its own rate; missing strata default to `default`. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double = 0.0, salt: Int = 0,
      portable: Boolean = false): DataFrame = {
    val (bucket, scale) = bucketAndScale(keyCol, salt, portable)
    val threshold = fractions.foldLeft(lit((default * scale).toLong): Column) {
      case (acc, (value, frac)) =>
        when(col(stratumCol) === value, lit((frac * scale).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Cap each group at `k` rows, chosen deterministically by key hash order
    * — "at most K documents per domain", the standard anti-domination step
    * of crawl curation (one over-represented site must not dominate the
    * mix). Hash order, not arrival order: the kept set is reproducible
    * across runs and partitionings, and re-derivable in any md5-capable
    * engine in portable mode. One shuffle (the per-group window); ties are
    * impossible for distinct keys and broken by the key otherwise. */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, k: Int,
      salt: Int = 0, portable: Boolean = false): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    require(!df.columns.exists(_.equalsIgnoreCase("__rank")),
      "input already has a __rank column; rename it first")
    val (bucket, _) = bucketAndScale(keyCol, salt, portable)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(bucket, col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Temperature-based domain rebalancing (the mT5/Pile `α`-temperature
    * mixture, realized as deterministic downsampling): each domain keeps
    * rate `min(1, baseRate · (c_max / c_d)^(1-α))`, so after sampling the
    * domain sizes are proportional to `c_d^α` (capped at keeping every row)
    * — α = 1 keeps natural proportions, α → 0 flattens toward uniform.
    * Row inclusion is the same hash filter as [[byHash]] (reproducible,
    * nested across baseRates, incremental-friendly).
    *
    * Scale shape: one map-side-combined count per domain (the per-domain
    * table is tiny by nature), rates broadcast back, then a pure filter —
    * the corpus is never shuffled.
    *
    * Determinism note (oracle-grade): at the default α = 0.5 the rate uses
    * `sqrt`, which IEEE 754 requires to be correctly rounded — the
    * threshold reproduces bit-for-bit in any engine. Other α go through
    * `pow`, which carries a ≤1-ulp platform tolerance. */
  def temperatureSample(df: DataFrame, keyCol: String, domainCol: String,
      alpha: Double = 0.5, baseRate: Double = 1.0, salt: Int = 0,
      portable: Boolean = false): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    require(baseRate >= 0 && baseRate <= 1, s"baseRate in [0,1], got $baseRate")
    val (bucket, scale) = bucketAndScale(keyCol, salt, portable)
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__c"))
    // cmax via a global window over the (tiny) per-domain table — a
    // separate agg + crossJoin would embed the corpus-scale groupBy
    // subtree TWICE in the plan (the exact double-scan mixtureRates'
    // single-window-pass note documents removing)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ratio = max(col("__c")).over(wAll).cast("double") / col("__c").cast("double")
    val boost = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = counts
      .withColumn("__thr",
        floor(least(lit(1.0), lit(baseRate) * boost) * scale).cast("long"))
      .select(col(domainCol).as("__dom"), col("__thr"))
    // null-safe join: a NULL domain is a legitimate domain of its own (the
    // groupBy above counted it) — a plain equality join would silently drop
    // every null-domain row regardless of rate, where stratified() keeps
    // null strata at the default rate
    df.join(broadcast(rates), df(domainCol) <=> rates("__dom"))
      .filter(bucket < col("__thr"))
      .select(df.columns.toIndexedSeq.map(df(_)): _*)
  }

  /** Mix N sources at given sampling rates into one corpus, tagging each row
    * with its source — the standard weighted-mixture step of a training-data
    * pipeline. Inputs must be union-compatible on `columns`. */
  def mix(sources: Seq[(String, DataFrame, Double)], keyCol: String,
      columns: Seq[String], salt: Int = 0): DataFrame =
    sources.map { case (name, df, fraction) =>
      byHash(df.select(columns.map(col): _*), keyCol, fraction, salt)
        .withColumn("_source", lit(name))
    }.reduce(_ unionByName _)

  /** Epoch-weighted UPSAMPLING — the other half of mixture control
    * ([[temperatureSample]] can only shrink): a domain with weight `w`
    * contributes each of its rows `floor(w)` times (epochs `0..floor(w)-1`)
    * plus a fractional epoch kept at rate `w - floor(w)` — e.g. weight 2.5
    * replays the domain twice and half again, the standard
    * quality-source-times-N recipe of pre-training mixtures. Output rows
    * carry `_epoch`; the fractional epoch's membership is the same
    * portable hash filter as the rest of this file, with the epoch folded
    * into the salt (`salt + epoch + 1`) so each epoch's kept set is an
    * independent, reproducible draw.
    *
    * Scale shape: a per-row `sequence` explode (fan-out ≤ ⌈w⌉, driven by
    * config literals) + a filter — zero shuffle, and the explode factor is
    * the mixture weight itself, so output volume is exactly the mixture's
    * token budget. */
  def upsampleEpochs(df: DataFrame, keyCol: String, domainCol: String,
      weights: Map[String, Double], default: Double = 1.0, salt: Int = 0,
      portable: Boolean = false): DataFrame = {
    (weights.values ++ Seq(default)).foreach(w =>
      require(w >= 0, s"weights must be >= 0, got $w"))
    Seq("_epoch", "__w").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a $c column; rename it first"))
    val scale = if (portable) PortableBuckets else HashBuckets
    val w = weights.foldLeft(lit(default): Column) { case (acc, (value, wt)) =>
      when(col(domainCol) === value, lit(wt)).otherwise(acc)
    }
    val n = ceil(w).cast("int")
    val epochs = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    val withEpoch = df.withColumn("__w", w)
      .withColumn("_epoch", explode(epochs))
    val epochSalt = lit(salt) + col("_epoch") + 1
    val bucket =
      if (portable) md5Bucket(keyCol, epochSalt)
      else pmod(xxhash64(col(keyCol), epochSalt), lit(HashBuckets))
    withEpoch
      .filter(col("_epoch") < floor(col("__w")) ||
        bucket < floor((col("__w") - floor(col("__w"))) * scale).cast("long"))
      .drop("__w")
  }

  /** Deterministic train/val/test split assignment: each row gets a
    * `_split` label from its key hash against cumulative fraction
    * thresholds — the standard leakage-safe corpus split (a key always
    * lands in the same split across runs, cluster layouts, and engines in
    * portable mode; a grown corpus never migrates old keys between
    * splits). Splits are checked IN ORDER against cumulative bounds; the
    * last split absorbs the hash-scale remainder, so fractions that sum
    * to 1 partition the corpus exactly. Zero-shuffle: a pure per-row
    * expression over the key.
    *
    * Threshold arithmetic is `(cumulative · scale).toLong` with the
    * cumulative sum folded in the GIVEN split order — document the order
    * with the split spec and any engine reproduces the assignment. */
  def splitAssign(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: Int = 0, portable: Boolean = false): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0), "split fractions must be >= 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    require(!df.columns.exists(_.equalsIgnoreCase("_split")),
      "input already has a _split column; rename it first")
    val (bucket, scale) = bucketAndScale(keyCol, salt, portable)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.init
      .map(c => (c * scale).toLong)
    val assigned = splits.init.zip(bounds)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), b), acc) => when(bucket < b, lit(name)).otherwise(acc)
      }
    df.withColumn("_split", assigned)
  }

  /** Deterministic global shuffle into `shards` training shards: each row
    * gets `_shard = hash % shards` and `_pos` = its rank within the shard
    * by (hash, key). The canonical pre-training sharder — the assignment
    * depends only on (key, salt), so a re-run over a grown corpus keeps
    * every old row's shard (only `_pos` shifts where new rows interleave),
    * and a different salt is a fresh epoch-level reshuffle.
    *
    * Scale shape: ONE hash exchange (the per-shard window) + per-shard
    * sort — deliberately no global ORDER BY (no range exchange), because a
    * total order across 100 TB buys nothing once shard files are read
    * independently. Reduce-side parallelism equals `shards`, so size it
    * like an output-file count (thousands at corpus scale), not a handful.
    * Plan-guarded in SamplingSpec. */
  def shuffleShards(df: DataFrame, keyCol: String, shards: Int, salt: Int = 0,
      portable: Boolean = false): DataFrame = {
    require(shards > 0, s"shards must be > 0, got $shards")
    Seq("_shard", "_pos").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a $c column; rename it first"))
    val (bucket, _) = bucketAndScale(keyCol, salt, portable)
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(bucket, lit(shards.toLong)).cast("int")
    val w = Window.partitionBy(shard).orderBy(bucket, col(keyCol))
    df.withColumn("_shard", shard)
      .withColumn("_pos", row_number().over(w))
  }

  /** Token-budget WATER-FILLING mixture solver — the planning step the
    * sampling family executes: given per-source available token counts,
    * mixture weights, and a total token budget, compute each source's
    * sampling rate such that target allocations follow the weights until
    * a source RUNS OUT, whose shortfall redistributes to the others
    * (`target_i = min(n_i, λ·w_i)` with λ the water level solving
    * `Σ target_i = budget`). The naive per-source `rate = budget·w_i/n_i`
    * silently under-fills the budget whenever any source is scarce — the
    * exact failure this solver exists to avoid.
    *
    * Closed form, no iteration: sort sources by exhaustion point
    * `r_i = n_i/w_i`; the capped set is a PREFIX of that order, found by
    * prefix sums (one row per SOURCE — bounded by construction, so the
    * single-partition window is metadata-scale; document-scale data never
    * enters). Entirely window/aggregate SQL: deterministic, and an
    * external engine reproduces it bit-for-bit (the m9 DuckDB oracle
    * does — double prefix sums in an identical order are identical IEEE
    * arithmetic).
    *
    * Zero-weight sources get `target = 0`; `budget ≥ Σn` caps everyone at
    * rate 1. Returns `(sourceCol, n_tokens, weight, target_tokens, rate)`
    * — feed `rate` to [[byHash]]/[[stratified]] per source to execute the
    * plan. */
  def mixtureRates(counts: DataFrame, sourceCol: String, tokensCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val base = counts.select(col(sourceCol),
      col(tokensCol).cast("long").as("__n"),
      col(weightCol).cast("double").as("__w"))
    // exhaustion point; null (sorted last, never capped) for weight <= 0
    val withR = base.withColumn("__r",
      when(col("__w") > 0, col("__n").cast("double") / col("__w")))
    val ord = Window.orderBy(col("__r").asc_nulls_last, col(sourceCol).asc)
    // EVERYTHING rides the same single-partition window pass — a first cut
    // computed totW and the last-capped-row aggregate as separate
    // agg+crossJoin branches, which re-executed the caller's `counts`
    // subtree (a data-scale corpus aggregation in the m9 gate) ~5× for one
    // metadata-scale result
    val glob = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val flagged = withR
      .withColumn("__cumN", sum(when(col("__w") > 0, col("__n")).otherwise(0L)).over(ord))
      .withColumn("__cumW", sum(when(col("__w") > 0, col("__w")).otherwise(0.0)).over(ord))
      .withColumn("__totW",
        sum(when(col("__w") > 0, col("__w")).otherwise(0.0)).over(glob))
      // row k is capped iff taking rows 1..k whole leaves a water level
      // λ(k) at or above its own exhaustion point:
      // n_k·(totW−cumW_k) ≤ (B−cumN_k)·w_k
      .withColumn("__capped", col("__r").isNotNull &&
        col("__n").cast("double") * (col("__totW") - col("__cumW")) <=
          (lit(budget).cast("double") - col("__cumN").cast("double")) * col("__w"))
    // λ from the LAST capped row's prefix sums (max cumN of a prefix is its
    // end; arg-max via struct max keeps cumW from the same row)
    flagged
      .withColumn("__k",
        max(when(col("__capped"), struct(col("__cumN").as("cn"), col("__cumW").as("cw"))))
          .over(glob))
      .withColumn("__kN", coalesce(col("__k.cn"), lit(0L)))
      .withColumn("__kW", coalesce(col("__k.cw"), lit(0.0)))
      .withColumn("__lambda",
        when(col("__totW") > col("__kW"),
          (lit(budget).cast("double") - col("__kN").cast("double")) /
            (col("__totW") - col("__kW"))))
      .withColumn("target_tokens",
        when(col("__capped"), col("__n"))
          .when(col("__r").isNull, lit(0L))
          .otherwise(least(col("__n"),
            floor(col("__lambda") * col("__w")).cast("long"))))
      .withColumn("rate", when(col("__n") === 0, lit(0.0))
        .otherwise(round(col("target_tokens").cast("double") / col("__n").cast("double"), 9)))
      .select(col(sourceCol), col("__n").as("n_tokens"), col("__w").as("weight"),
        col("target_tokens"), col("rate"))
  }

  /** Map-keyed convenience overload: weights by source value, `default`
    * for sources the map omits. */
  def mixtureRates(counts: DataFrame, sourceCol: String, tokensCol: String,
      weights: Map[String, Double], default: Double, budget: Long): DataFrame = {
    val weightCol = weights.foldLeft(lit(default): Column) {
      case (acc, (value, w)) => when(col(sourceCol) === value, lit(w)).otherwise(acc)
    }
    mixtureRates(counts.withColumn("__weight", weightCol),
      sourceCol, tokensCol, "__weight", budget)
  }

  /** Execute a [[mixtureRates]] plan: per-source hash sampling at each
    * source's solved rate — the same deterministic bucket filter as
    * [[byHash]], with the rate joined per row (broadcast — the plan is one
    * row per source by construction; null-safe on the source key, the
    * [[temperatureSample]] convention, so a NULL source samples at ITS
    * plan row instead of silently dropping). A source absent from the
    * plan keeps nothing — an unplanned source leaking through at rate 1
    * would silently blow the token budget the plan exists to enforce. */
  def applyMixture(df: DataFrame, rates: DataFrame, sourceCol: String,
      keyCol: String, salt: Int = 0, portable: Boolean = false): DataFrame = {
    val (bucket, scale) = bucketAndScale(keyCol, salt, portable)
    val r = rates.select(col(sourceCol).as("__src"),
      floor(col("rate") * scale).cast("long").as("__thr"))
    df.join(broadcast(r), df(sourceCol) <=> r("__src"), "left")
      .filter(bucket < coalesce(col("__thr"), lit(0L)))
      .select(df.columns.toIndexedSeq.map(df(_)): _*)
  }
}
