package graft.dedup

import graft.SparkSuite
import graft.sources.Tables

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("hash sampling is deterministic and ~proportional") {
    val docs = Tables.load(spark, sf0001, "documents")
    val s1 = Sampling.byHash(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.byHash(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    assert(s1 == s2) // reproducible
    assert(s1.size > 50 && s1.size < 150) // ~100 of 500
    // nested property: a 10% sample is a subset of the 20% sample (same salt)
    val s3 = Sampling.byHash(docs, "doc_id", 0.1).select("doc_id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
  }

  test("portable md5 sampling: deterministic, nested, and matching the documented bucket") {
    val docs = Tables.load(spark, sf0001, "documents")
    val s20 = Sampling.byHash(docs, "doc_id", 0.2, portable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.size > 50 && s20.size < 150)
    val s10 = Sampling.byHash(docs, "doc_id", 0.1, portable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s20))
    // fraction 1.0 keeps everything (threshold 2^32 > any bucket)
    assert(Sampling.byHash(docs, "doc_id", 1.0, portable = true).count() == docs.count())
    // the bucket is the documented md5 construction, reproducible off-engine
    val id = s20.head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:0".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    assert(java.lang.Long.parseLong(hex, 16) < (0.2 * 4294967296L.toDouble).toLong)
  }

  test("stratified sampling applies per-stratum rates") {
    val docs = Tables.load(spark, sf0001, "documents")
    val out = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), default = 0.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter($"lang" === "en").count()) // rate 1.0 keeps all
  }

  test("temperatureSample: α-rates cap at 1, flatten toward uniform, stay deterministic") {
    val docs = Tables.load(spark, sf0001, "documents")
    // α = 1 keeps natural proportions: rate = baseRate for every domain
    val nat = Sampling.temperatureSample(docs, "doc_id", "source",
      alpha = 1.0, baseRate = 1.0)
    assert(nat.count() == docs.count())
    // α = 0.5 at baseRate 1: the LARGEST domain keeps exactly rate 1 (all
    // rows); smaller domains keep sqrt-boosted rates capped at 1 → also all
    val flat = Sampling.temperatureSample(docs, "doc_id", "source",
      alpha = 0.5, baseRate = 1.0)
    assert(flat.count() == docs.count())
    // baseRate 0.5, α = 0.5: per-domain keep-rate grows as the domain
    // shrinks — the retained FRACTION of a small domain ≥ that of the max
    // domain; assignment is deterministic and column order is preserved
    val t1 = Sampling.temperatureSample(docs, "doc_id", "source",
      alpha = 0.5, baseRate = 0.5, portable = true)
    val t2 = Sampling.temperatureSample(docs, "doc_id", "source",
      alpha = 0.5, baseRate = 0.5, portable = true)
    assert(t1.columns.toSeq == docs.columns.toSeq)
    assert(t1.select("doc_id").as[Long].collect().toSet ==
      t2.select("doc_id").as[Long].collect().toSet)
    val before = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val after = t1.groupBy("source").count().as[(String, Long)].collect().toMap
    val maxDomain = before.maxBy(_._2)._1
    val minDomain = before.minBy(_._2)._1
    val fracMax = after.getOrElse(maxDomain, 0L).toDouble / before(maxDomain)
    val fracMin = after.getOrElse(minDomain, 0L).toDouble / before(minDomain)
    assert(fracMin >= fracMax - 0.1,
      s"small domain should be kept at >= the max domain's rate ($fracMin vs $fracMax)")
    // a NULL domain is a domain: its rows sample at the null-group's rate
    // instead of silently vanishing through a non-null-safe join
    val withNull = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("id", "dom")
    val keptNull = Sampling.temperatureSample(withNull, "id", "dom",
      alpha = 1.0, baseRate = 1.0)
    assert(keptNull.count() == 3, "null-domain rows must survive at rate 1")
    assert(keptNull.columns.toSeq == Seq("id", "dom"))
    // the threshold math is the documented construction, re-derivable
    // off-engine: every kept row's md5 bucket < floor(min(1, .5*sqrt(cmax/c))*2^32)
    val cmax = before.values.max.toDouble
    val kept = t1.select("doc_id", "source").as[(Long, String)].collect()
    kept.foreach { case (id, src) =>
      val thr = math.floor(math.min(1.0, 0.5 * math.sqrt(cmax / before(src))) *
        4294967296L.toDouble).toLong
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:0".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      assert(java.lang.Long.parseLong(hex, 16) < thr)
    }
  }

  test("upsampleEpochs: floor(w) full copies + fractional epoch, independent draws") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents")
    val out = Sampling.upsampleEpochs(docs, "doc_id", "source",
      weights = Map("src1" -> 3.0, "src2" -> 0.5), default = 1.0,
      portable = true).persist()
    val n = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val got = out.groupBy("source").count().as[(String, Long)].collect().toMap
    // integer weight = exact replication; every epoch value present
    assert(got("src1") == 3 * n("src1"))
    assert(out.filter($"source" === "src1").select("_epoch").distinct()
      .as[Int].collect().toSet == Set(0, 1, 2))
    // default weight 1.0 = identity for the other sources
    assert(got("src0") == n("src0"))
    // fractional weight: between 0 and the full domain, epoch always 0
    assert(got.getOrElse("src2", 0L) > 0 && got("src2") < n("src2"))
    assert(out.filter($"source" === "src2").select("_epoch").distinct()
      .as[Int].collect().toSet == Set(0))
    // deterministic
    val again = Sampling.upsampleEpochs(docs, "doc_id", "source",
      weights = Map("src1" -> 3.0, "src2" -> 0.5), portable = true)
      .select("doc_id", "_epoch").as[(Long, Int)].collect().toSet
    assert(again == out.select("doc_id", "_epoch").as[(Long, Int)].collect().toSet)
    // fractional epochs draw INDEPENDENTLY per epoch: weight 1.5's extra
    // epoch is not the same doc subset as a plain 0.5-weight epoch-0 draw
    // with a different epoch index — check via 2.5 (extra epoch index 2)
    val frac25 = Sampling.upsampleEpochs(docs, "doc_id", "source",
      weights = Map("src2" -> 2.5), portable = true)
      .filter($"source" === "src2" && $"_epoch" === 2)
      .select("doc_id").as[Long].collect().toSet
    val frac05 = out.filter($"source" === "src2").select("doc_id")
      .as[Long].collect().toSet
    assert(frac25 != frac05, "per-epoch draws should differ (independent salts)")
    // zero weight drops the domain outright
    val none = Sampling.upsampleEpochs(docs, "doc_id", "source",
      weights = Map("src3" -> 0.0), portable = true)
    assert(none.filter($"source" === "src3").count() == 0)
    // the non-portable (xxhash64) arm: same structural properties —
    // exact replication at integer weights, partial fractional epoch,
    // deterministic across calls
    val fast = Sampling.upsampleEpochs(docs, "doc_id", "source",
      weights = Map("src1" -> 2.0, "src2" -> 0.5))
    assert(fast.filter($"source" === "src1").count() == 2 * n("src1"))
    val fastFrac = fast.filter($"source" === "src2").count()
    assert(fastFrac > 0 && fastFrac < n("src2"))
    assert(fast.select("doc_id", "_epoch").as[(Long, Int)].collect().toSet ==
      Sampling.upsampleEpochs(docs, "doc_id", "source",
        weights = Map("src1" -> 2.0, "src2" -> 0.5))
        .select("doc_id", "_epoch").as[(Long, Int)].collect().toSet)
    // injected-column guards
    intercept[IllegalArgumentException] {
      Sampling.upsampleEpochs(fast, "doc_id", "source", weights = Map())
    }
    out.unpersist()
  }

  test("splitAssign: exact partition, stable across growth, ordered thresholds") {
    val docs = Tables.load(spark, sf0001, "documents")
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = Sampling.splitAssign(docs, "doc_id", splits, portable = true).persist()
    // exact partition: every row labeled, labels only from the spec
    assert(out.count() == docs.count())
    val byLabel = out.groupBy("_split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // growth stability: the split of a subset equals the subset of the split
    val subset = Sampling.splitAssign(docs.filter($"doc_id" < 100), "doc_id",
      splits, portable = true).select("doc_id", "_split").as[(Long, String)].collect().toSet
    val fromFull = out.filter($"doc_id" < 100)
      .select("doc_id", "_split").as[(Long, String)].collect().toSet
    assert(subset == fromFull)
    // zero-shuffle: pure per-row expression
    val plan = Sampling.splitAssign(docs, "doc_id", splits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // fractions must sum to 1 and _split must be free
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(out, "doc_id", splits)
    }
    out.unpersist()
  }

  test("mix unions sources with tags at given rates") {
    val a = Seq((1L, "xa"), (2L, "ya")).toDF("id", "text")
    val b = Seq((10L, "xb")).toDF("id", "text")
    val m = Sampling.mix(Seq(("src_a", a, 1.0), ("src_b", b, 1.0)), "id", Seq("id", "text"))
    assert(m.count() == 3)
    assert(m.filter($"_source" === "src_b").count() == 1)
  }

  test("shuffleShards: stable shard assignment, contiguous positions, no range exchange") {
    val docs = Tables.load(spark, sf0001, "documents")
    val out = Sampling.shuffleShards(docs, "doc_id", shards = 8).persist()
    // every row lands exactly once, shards within range
    assert(out.count() == docs.count())
    val shards = out.select("_shard").distinct().as[Int].collect().toSet
    assert(shards.forall(s => s >= 0 && s < 8))
    // positions are 1..n_s contiguous per shard
    val bad = out.groupBy("_shard")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.max("_pos").as("mx"),
        org.apache.spark.sql.functions.min("_pos").as("mn"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1)
    assert(bad.count() == 0)
    // assignment depends only on (key, salt): input partitioning is irrelevant
    val again = Sampling.shuffleShards(docs.repartition(7), "doc_id", shards = 8)
    assert(out.select("doc_id", "_shard", "_pos").as[(Long, Int, Int)].collect().toSet ==
      again.select("doc_id", "_shard", "_pos").as[(Long, Int, Int)].collect().toSet)
    // a different salt reshuffles (epoch semantics)
    val epoch2 = Sampling.shuffleShards(docs, "doc_id", shards = 8, salt = 1)
    assert(out.select("doc_id", "_shard").as[(Long, Int)].collect().toSet !=
      epoch2.select("doc_id", "_shard").as[(Long, Int)].collect().toSet)
    // plan shape: hash exchange only — a global sort (range exchange) would
    // be the scale-killer this operator exists to avoid
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
    out.unpersist()
    // reserved output columns are a loud error
    intercept[IllegalArgumentException] {
      Sampling.shuffleShards(docs.withColumn("_shard",
        org.apache.spark.sql.functions.lit(1)), "doc_id", 4)
    }
  }

  test("capPerGroup keeps at most k per group, deterministically, nested in k") {
    val docs = Tables.load(spark, sf0001, "documents")
    val capped = Sampling.capPerGroup(docs, "doc_id", "source", k = 3)
    val counts = capped.groupBy("source").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ <= 3))
    // deterministic across runs and partitionings
    val again = Sampling.capPerGroup(docs.repartition(7), "doc_id", "source", k = 3)
    assert(capped.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    // nested: the k=2 set is a subset of the k=3 set (hash order is stable)
    val two = Sampling.capPerGroup(docs, "doc_id", "source", k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(two.subsetOf(capped.select("doc_id").as[Long].collect().toSet))
    // a group smaller than k keeps all its rows
    assert(Sampling.capPerGroup(docs, "doc_id", "source", k = 1000).count() == docs.count())
    // reserved working column is a loud error, not silent data loss
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(docs.withColumn("__RANK", org.apache.spark.sql.functions.lit(1)),
        "doc_id", "source", k = 3)
    }
  }

  test("mixtureRates: water-filling — scarce sources cap, shortfall redistributes, budget met") {
    // three sources: A scarce/high-weight (caps at 1.0), B and C fill the rest
    val counts = Seq(("A", 100L, 10.0), ("B", 10000L, 1.0), ("C", 20000L, 1.0))
      .toDF("source", "n_tokens", "weight")
    val out = Sampling.mixtureRates(counts, "source", "n_tokens", "weight", budget = 8100L)
      .select("source", "n_tokens", "target_tokens", "rate")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // naive per-source allocation gives A 10/12 of the budget (6750) — but A
    // only HAS 100; water-filling caps it and splits the remaining 8000
    // between B and C by weight
    assert(out("A")._3 == 100L && out("A")._4 == 1.0)
    assert(out("B")._3 == 4000L && out("C")._3 == 4000L)
    assert(out.values.map(_._3).sum == 8100L)
    // budget >= total available: everyone caps at rate 1
    val all = Sampling.mixtureRates(counts, "source", "n_tokens", "weight", budget = 50000L)
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(all.values.forall(_ == 1.0), all.toString)
    // zero-weight source contributes nothing; zero-count source rates 0
    val edge = Seq(("Z", 500L, 0.0), ("E", 0L, 2.0), ("B", 1000L, 1.0))
      .toDF("source", "n_tokens", "weight")
    val eo = Sampling.mixtureRates(edge, "source", "n_tokens", "weight", budget = 600L)
      .select("source", "target_tokens", "rate")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(eo("Z")._2 == 0L && eo("Z")._3 == 0.0)
    assert(eo("E")._2 == 0L && eo("E")._3 == 0.0)
    assert(eo("B")._2 == 600L)
    // map overload: missing sources take the default weight
    val mo = Sampling.mixtureRates(counts, "source", "n_tokens",
      weights = Map("A" -> 10.0), default = 1.0, budget = 8100L)
      .select("source", "target_tokens").as[(String, Long)].collect().toMap
    assert(mo == Map("A" -> 100L, "B" -> 4000L, "C" -> 4000L))
  }

  test("applyMixture executes the plan: per-source rates honored, unplanned sources drop") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents")
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_tokens"))
      .withColumn("weight", lit(1.0))
    val total = counts.agg(sum("n_tokens")).as[Long].head()
    val plan = Sampling.mixtureRates(counts, "source", "n_tokens", "weight", total / 2)
    val kept = Sampling.applyMixture(docs, plan, "source", "doc_id", portable = true)
    // overall keep ratio tracks the budget fraction (hash sampling is
    // approximate per source; wide tolerance)
    val ratio = kept.count().toDouble / docs.count()
    assert(ratio > 0.3 && ratio < 0.7, s"keep ratio $ratio far from planned 0.5")
    // a source missing from the plan keeps NOTHING (budget enforcement)
    val partial = plan.filter(col("source") =!= "src0")
    assert(Sampling.applyMixture(docs, partial, "source", "doc_id", portable = true)
      .filter(col("source") === "src0").isEmpty)
    // determinism: same plan, same kept set
    val again = Sampling.applyMixture(docs, plan, "source", "doc_id", portable = true)
    assert(again.select("doc_id").as[Long].collect().sorted.toSeq ==
      kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("null keys are sampled, not silently dropped (portable and default agree)") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "a"), (java.lang.Long.valueOf(2L), "b"),
      (null.asInstanceOf[java.lang.Long], "c"),
      (null.asInstanceOf[java.lang.Long], "d")).toDF("doc_id", "v")
    // fraction 1.0 must keep EVERYTHING in both hash arms — a NULL md5
    // bucket used to fail the `< threshold` filter and vanish the rows
    assert(Sampling.byHash(docs, "doc_id", 1.0, portable = true).count() == 4)
    assert(Sampling.byHash(docs, "doc_id", 1.0).count() == 4)
    // deterministic: both null-key rows share one bucket, so a fraction
    // either keeps both or drops both — never a split
    val kept = Sampling.byHash(docs, "doc_id", 0.5, portable = true)
      .filter(col("doc_id").isNull).count()
    assert(kept == 0 || kept == 2, s"null-key rows split across a threshold: $kept")
  }
}
