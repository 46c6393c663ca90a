package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Tables

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup groups identical texts") {
    val d = Seq((1, "same text"), (2, "same text"), (3, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(d, "doc_id", "text")
      .select("keeper", "n_dups").as[(Int, Long)].collect().toSet
    assert(out == Set((1, 2L), (3, 1L)))
  }

  test("ngram jaccard finds near-identical docs, not unrelated ones") {
    val d = Seq(
      (1, "a b c d e f g h"),
      (2, "a b c d e f g x"),     // shares most 3-grams with 1
      (3, "q r s t u v w z")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(d, "doc_id", "text", n = 3, threshold = 0.3)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    assert(pairs == Set((1, 2)))
  }

  test("minhash LSH agrees with exact jaccard on testdata near-dups") {
    val docs = Tables.load(spark, sf0001, "documents")
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash self-distance is zero and dup-pair hamming small") {
    val d = Seq(
      (1, "the quick brown fox jumps over the lazy dog again and again"),
      (2, "the quick brown fox jumps over the lazy dog again and again today"),
      (3, "completely different words about spark catalyst optimizer internals")).toDF("doc_id", "text")
    val pairs = Dedup.simHash(d, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    assert(pairs.contains((1, 2)))
    assert(!pairs.contains((1, 3)) && !pairs.contains((2, 3)))
  }

  test("LSH near-dup: precision-1 subset of brute force; exact dups guaranteed found") {
    val embs = Tables.load(spark, sf0001, "embeddings")
    val bf = Dedup.embeddingNearDup(embs, "vec_id", "embedding", threshold = 0.45)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(embs, "vec_id", "embedding",
      threshold = 0.45, dim = 64)
      .as[(Long, Long, Double)].collect().toSet
    assert(bf.nonEmpty, "testdata should contain planted embedding near-dups")
    assert(lsh.subsetOf(bf)) // precision 1: every LSH pair is a true pair, same score
    // identical vectors share every band signature, so the collision — and
    // therefore recall — is guaranteed, not probabilistic
    val v = Seq.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val other = Seq.tabulate(64)(i => math.cos(i * 3.0 + 1).toFloat)
    val planted = Seq((1L, v), (2L, v), (3L, other)).toDF("vec_id", "embedding")
    val found = Dedup.embeddingNearDupLsh(planted, "vec_id", "embedding",
      threshold = 0.99, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == Set((1L, 2L)))
  }

  test("portable simhash with maxHamming <= 3 equals the all-pairs result") {
    val docs = Tables.load(spark, sf0001, "documents")
    val banded = Dedup.simHash(docs, "doc_id", "text", maxHamming = 3, portable = true)
      .as[(Long, Long, Int)].collect().toSet
    // exhaustive reference: cross-join the signatures themselves — pigeonhole
    // (<= 3 diffs over 4 bands) says banding must not lose any of these pairs
    val sigs = Dedup.simHashSignatures(docs, "doc_id", "text", portable = true)
    val a = sigs.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val allPairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == allPairs)
  }

  test("contamination flags docs sharing probe n-grams, broadcast probe side") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // contains probe 5-gram
      (101L, "completely unrelated words in this document here")).toDF("doc_id", "text")
    val probes = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, probes, "doc_id", "text", "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((100L, 1L, 1L))) // one 5-gram of doc 100 hits the probe
  }

  test("fuzzyContamination: exact per-pair Jaccard, broadcast probes, no corpus self-join") {
    val corpus = Seq(
      // near-dup of probe 1: 6 words -> shingle sets overlap heavily
      (100L, "alpha beta gamma delta epsilon zeta"),
      // shares ONE 5-gram window but diverges after -> low jaccard
      (101L, "alpha beta gamma delta epsilon completely different tail words here now"),
      (102L, "totally unrelated content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val out = Dedup.fuzzyContamination(corpus, probes,
      "doc_id", "text", "doc_id", "text", n = 5, threshold = 0.3)
    val rows = out.as[(Long, Long, Double)].collect().toSet
    // doc 100: shingles {a b g d e, b g d e z}; probe: {a b g d e, b g d e z, g d e z h}
    // inter 2, union 3 -> 0.666667. doc 101: inter 1, sets 6 & 3 -> 1/8 < 0.3.
    assert(rows == Set((100L, 1L, 0.666667)))
    // plan: probe side broadcast (no shuffle of the corpus for the probe
    // join), and no cartesian anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("connected components canonicalize dup clusters to min id") {
    // chain 1-2-3 (one component), pair 10-11, isolated edge 20-21
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (21L, 20L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L))
    // long chain exercises multi-iteration propagation
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, "id_a", "id_b")
      .select("component").distinct().as[Long].collect().toSeq
    assert(comps == Seq(0L))
  }

  test("star-alternation components match propagation on chain, clique, and random graphs") {
    // the production path is large-star/small-star; propagation is the
    // round-per-diameter-hop baseline it must agree with exactly
    def check(pairs: org.apache.spark.sql.DataFrame): Unit = {
      val stars = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      val prop = Dedup.connectedComponentsPropagation(pairs, "id_a", "id_b", maxIter = 300)
        .as[(Long, Long)].collect().toMap
      assert(stars == prop)
    }
    // a 60-hop chain: propagation needs 60 rounds, stars O(log²)
    check((0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b"))
    // a clique with shuffled ids
    check(Seq((9L, 3L), (3L, 7L), (7L, 9L), (9L, 7L)).toDF("id_a", "id_b"))
    // seeded random graph: many components, mixed shapes, self-loops
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    check(edges.toDF("id_a", "id_b"))
    // star rounds stay logarithmic where propagation is linear: the 60-hop
    // chain converges inside a budget propagation provably cannot meet
    val tight = Dedup.connectedComponents(
      (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b"),
      "id_a", "id_b", maxIter = 12, Dedup.LocalCheckpoint)
      .select("component").distinct().count()
    assert(tight == 1L, "star alternation should collapse a 60-chain in ≤12 rounds")
  }

  test("incremental near-dup: batch probes the history band index, survivors verified") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different historical content about databases and indexes")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // near-dups 1
      (101L, "entirely novel text with no historical counterpart at all"),
      (102L, "the quick brown fox jumps over the lazy dog today") // exact dup of 1
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(batch, history, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(101L))
    // the precomputed-index path (the production shape) is equivalent
    val index = Dedup.minHashBuckets(history, "doc_id", "text", n = 3)
    val viaIndex = Dedup.incrementalNearDup(batch, history, "doc_id", "text",
      n = 3, threshold = 0.5, historyBuckets = Some(index))
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == out)
    // a batch against empty history keeps everything
    val empty = history.filter($"doc_id" < 0)
    assert(Dedup.incrementalNearDup(batch, empty, "doc_id", "text").count() == 3)
    // explicit hot-shingle exclusion applies UNIFORMLY (batch, index,
    // verification): excluding every shingle of the shared sentence makes
    // the former near-dups invisible to each other — they all survive
    val allShingles = Dedup.shingles(history, "doc_id", "text", n = 3)
      .select(org.apache.spark.sql.functions.xxhash64($"shingle").as("h0")).distinct()
    val blinded = Dedup.incrementalNearDup(batch, history, "doc_id", "text",
      n = 3, threshold = 0.5, hotShingles = Some(allShingles))
      .select("doc_id").as[Long].collect().toSet
    assert(blinded == Set(100L, 101L, 102L))
  }

  test("duplicatedSpans: cross-doc shared windows merge into maximal spans") {
    // docs 1 and 2 share the 4-word run "alpha beta gamma delta" twice,
    // separated far enough apart to form TWO spans in doc 1 but merged by
    // proximity in doc 2; doc 3 shares nothing 4 words long
    val shared = "alpha beta gamma delta"
    val d = Seq(
      (1L, s"$shared x1 x2 x3 x4 x5 x6 x7 x8 x9 $shared"),
      (2L, s"p q $shared r $shared s"),
      (3L, "alpha beta nope delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(d, "doc_id", "text", n = 4, minDocs = 2)
      .select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Int, Int, Long)].collect().toSet
    // doc 1: duplicated window starts 0 and 13 (gap 13 > n=4 → two spans)
    // doc 2: starts 2 and 7 (gap 5 > 4 → also two spans)
    assert(out == Set((1L, 0, 3, 1L), (1L, 13, 16, 1L),
      (2L, 2, 5, 1L), (2L, 7, 10, 1L)))
    // windows overlapping/adjacent DO merge: two docs share a 5-word run →
    // two 4-word windows at starts 0,1 merge into one span covering 0..4
    val run = Seq(
      (1L, "a b c d e tailone x y z"),
      (2L, "a b c d e tailtwo q r s")).toDF("doc_id", "text")
    val merged = Dedup.duplicatedSpans(run, "doc_id", "text", n = 4, minDocs = 2)
      .select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(merged == Set((1L, 0, 4, 2L), (2L, 0, 4, 2L)))
    // within-doc repetition alone is NOT span duplication (minDocs counts docs)
    val selfrep = Seq(
      (1L, s"$shared $shared"),
      (2L, "totally different words here man")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(selfrep, "doc_id", "text", n = 4, minDocs = 2).isEmpty)
    // docs shorter than n contribute no windows (no truncated-tail aliasing)
    val short = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(short, "doc_id", "text", n = 4, minDocs = 2).isEmpty)
  }

  test("cutSpans removes exactly the flagged word ranges; unflagged docs pass through") {
    val d = Seq(
      (1L, "keep1 a b c d keep2"),
      (2L, "x a b c d y z"),
      (3L, "untouched words entirely")).toDF("doc_id", "text")
    // doc 1: cut words 1..4; doc 2: cut 1..4; doc 3: no spans
    val spans = Seq((1L, 1, 4), (2L, 1, 4)).toDF("doc_id", "span_start", "span_end")
    val out = Dedup.cutSpans(d, spans, "doc_id", "text")
      .as[(Long, String, Int)].collect().map { case (id, t, n) => id -> (t, n) }.toMap
    assert(out(1L) == ("keep1 keep2", 4))
    assert(out(2L) == ("x y z", 4))
    assert(out(3L) == ("untouched words entirely", 0))
    // multiple spans per doc compose; an all-covered doc degrades to ""
    val spans2 = Seq((1L, 0, 0), (1L, 5, 5), (3L, 0, 2)).toDF("doc_id", "span_start", "span_end")
    val out2 = Dedup.cutSpans(d, spans2, "doc_id", "text")
      .as[(Long, String, Int)].collect().map { case (id, t, n) => id -> (t, n) }.toMap
    assert(out2(1L) == ("a b c d", 2))
    assert(out2(3L) == ("", 3))
    // round-trip with the detector: cutting detected spans leaves no
    // duplicated full window behind (re-detection over the cut corpus with
    // the same n finds nothing new among previously-flagged docs)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"pre $shared post1 q r s t u v"),
      (2L, s"$shared mid2 w x y z zz yy"),
      (3L, "wholly unrelated text with plenty of distinct words here")).toDF("doc_id", "text")
    val detected = Dedup.duplicatedSpans(corpus, "doc_id", "text", n = 8, minDocs = 2)
    assert(detected.count() > 0)
    val cut = Dedup.cutSpans(corpus, detected, "doc_id", "text")
      .select(col("doc_id"), col("text_cut").as("text"))
    assert(Dedup.duplicatedSpans(cut, "doc_id", "text", n = 8, minDocs = 2).isEmpty)
  }

  test("incrementalExactBloom: exact d8 semantics, join only for the maybe residue") {
    val history = (0L until 200L).map(i => (i, s"hist doc number $i body")).toDF("doc_id", "text")
    val index = history.select(md5($"text").as("fp")).distinct()
    // batch: 30 true dupes of history, 70 fresh, plus an in-batch dupe pair
    val batch = ((0L until 30L).map(i => (1000L + i, s"hist doc number $i body")) ++
      (0L until 70L).map(i => (2000L + i, s"fresh doc $i payload")) :+
      (3000L, "fresh doc 0 payload")).toDF("doc_id", "text")
    val exact = Dedup.incrementalExact(batch, Some(index), "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val bloom = Dedup.incrementalExactBloom(batch, Some(index), "doc_id", "text",
      expectedItems = 200)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(bloom == exact)
    assert(bloom.size == 70) // 30 dupes dropped, in-batch dupe collapsed
    assert(!bloom.exists(_._1 == 3000L)) // in-batch keeper = min id (2000)
    // empty / absent index degenerate cleanly
    assert(Dedup.incrementalExactBloom(batch, None, "doc_id", "text",
      expectedItems = 1).count() == 100)
    val emptyIx = index.filter(lit(false))
    assert(Dedup.incrementalExactBloom(batch, Some(emptyIx), "doc_id", "text",
      expectedItems = 200).count() == 100)
    // the sketch itself: definitely-absent is authoritative, present is maybe
    import org.apache.spark.sql.graftnative.BloomFunctions
    val sk = index.agg(BloomFunctions.bloomAgg(xxhash64($"fp"), 200L, 4096L).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probes = Seq("hist doc number 7 body", "never seen anywhere").toDF("text")
      .select(BloomFunctions.mightContain(lit(sk), xxhash64(md5($"text"))).as("mc"))
      .as[Boolean].collect().toSeq
    assert(probes.head, "a true member must test maybe-present")
    intercept[IllegalArgumentException] {
      Dedup.incrementalExactBloom(batch, Some(index), "doc_id", "text", expectedItems = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.incrementalExactBloom(batch, Some(index), "doc_id", "text",
        expectedItems = 10, fpp = 1.5)
    }
  }

  test("incrementalExactBloom: sketch sizing above Spark's silent clamp caps") {
    // BloomFilterAggregate clamps numItems/numBits to the runtime-filter
    // session caps (4 M / 64 M bits by default) — pre-fix, expectedItems
    // above ~7 M silently degraded the real fpp far past the request.
    // The call must raise the caps for the build and restore them after.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (items0, bits0) = (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    val wanted = 20000000L // needs ~191 M bits at fpp 0.01 — 3× the cap
    assert(org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(wanted, 0.01) > bits0.toLong)
    val history = (0L until 50L).map(i => (i, s"clamp doc $i")).toDF("doc_id", "text")
    val index = history.select(md5($"text").as("fp")).distinct()
    val batch = Seq((100L, "clamp doc 3"), (101L, "brand new")).toDF("doc_id", "text")
    val out = Dedup.incrementalExactBloom(batch, Some(index), "doc_id", "text",
      expectedItems = wanted)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(101L)) // still exact
    // caps restored — the raise must not leak into the session
    assert(spark.conf.get(itemsKey) == items0)
    assert(spark.conf.get(bitsKey) == bits0)
  }

  test("keepOneSpanCut: content survives exactly once — keeper kept, every other copy cut") {
    val shared = "s1 s2 s3 s4 s5"  // 5 words, one island at n=4
    val d = Seq(
      (1L, s"$shared a1 a2 a3"),        // keeper (min doc, min start)
      (2L, s"b1 $shared b2 b3"),        // loser: island cut
      (3L, s"c1 c2 c3 $shared"),        // loser: island cut
      (4L, "untouched words entirely here")).toDF("doc_id", "text")
    val out = Dedup.keepOneSpanCut(d, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, String, Int)].collect().map { case (id, t, nr) => id -> (t, nr) }.toMap
    assert(out(1L) == (s"$shared a1 a2 a3", 0))   // keeper intact
    assert(out(2L) == ("b1 b2 b3", 5))
    assert(out(3L) == ("c1 c2 c3", 5))
    assert(out(4L) == ("untouched words entirely here", 0))
    // the corpus-level property: after the cut the shared content appears
    // in EXACTLY one doc
    assert(out.values.count(_._1.contains(shared)) == 1)
    // within-doc second occurrence of keeper content also cuts (the
    // keeper is the doc's FIRST occurrence)
    val selfA = Seq(
      (1L, s"$shared mid1 mid2 mid3 $shared"),
      (2L, s"x1 $shared x2 y1 y2")).toDF("doc_id", "text")
    val out2 = Dedup.keepOneSpanCut(selfA, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, String, Int)].collect().map { case (id, t, nr) => id -> (t, nr) }.toMap
    assert(out2(1L) == (s"$shared mid1 mid2 mid3", 5))
    assert(out2(2L) == ("x1 x2 y1 y2", 5))
    // documented boundary: islands overlapping the same text with
    // DIFFERENT extents form singleton content groups — both kept
    // (under-cut, never corrupt; d12 is the aggressive path)
    val mixed = Seq(
      (1L, "a b c d e f g h i j k"),   // island [0,10] (merges two partners)
      (2L, "a b c d e f g x1 x2"),     // island [0,6]
      (3L, "y1 y2 e f g h i j k")).toDF("doc_id", "text")
    val out3 = Dedup.keepOneSpanCut(mixed, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, String, Int)].collect().map { case (id, t, nr) => id -> (t, nr) }.toMap
    assert(out3.values.forall(_._2 == 0), out3.toString)
  }

  test("exactSubstrings: maximal spans carry exact arbitrary length, not window quanta") {
    // an 11-word shared run with minLen=4 reports ONE span of exactly 11
    // tokens per side — the arbitrary-length regime d10's islands only
    // cover positionally
    val run11 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    val d = Seq(
      (1L, s"$run11 ta tb tc"),
      (2L, s"px py $run11"),
      (3L, "wholly unrelated words that never pair with anything else")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrings(d, "doc_id", "text", minLen = 4)
      .select("doc_id", "span_start", "span_end", "span_len", "n_docs")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set((1L, 0, 10, 11, 1L), (2L, 2, 12, 11, 1L)))
    // run maximality: a 5-word share = one span of len 5, never two windows
    val d5 = Seq(
      (1L, "p q r s t one two three"),
      (2L, "four five p q r s t six")).toDF("doc_id", "text")
    val out5 = Dedup.exactSubstrings(d5, "doc_id", "text", minLen = 4)
      .select("doc_id", "span_len").as[(Long, Int)].collect().toSet
    assert(out5 == Set((1L, 5), (2L, 5)))
  }

  test("exactSubstrings: overlapping spans with different partners stay distinct where d10 merges") {
    // A shares its words 0..6 with B and 4..10 with C — two maximal
    // duplicated substrings that OVERLAP; the fixed-window island merges
    // them into one [0,10] blob, the arbitrary-length detector must not
    val a = "a b c d e f g h i j k"
    val d = Seq(
      (1L, a),
      (2L, "a b c d e f g x1 x2"),
      (3L, "y1 y2 e f g h i j k")).toDF("doc_id", "text")
    val fine = Dedup.exactSubstrings(d, "doc_id", "text", minLen = 4)
      .filter($"doc_id" === 1L)
      .select("span_start", "span_end", "span_len", "n_docs")
      .as[(Int, Int, Int, Long)].collect().toSet
    assert(fine == Set((0, 6, 7, 1L), (4, 10, 7, 1L)))
    val coarse = Dedup.duplicatedSpans(d, "doc_id", "text", n = 4, minDocs = 2)
      .filter($"doc_id" === 1L)
      .select("span_start", "span_end").as[(Int, Int)].collect().toSet
    assert(coarse == Set((0, 10)))
  }

  test("exactSubstrings: contained occurrences are pruned, equal extents aggregate partners") {
    // B carries A's full 10-word run, C only its first 6 words: A's [0,5]
    // MEM with C is strictly inside A's [0,9] MEM with B → pruned from A;
    // C still reports its own maximal 6-word span (shared with BOTH → n_docs=2)
    val run10 = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    val d = Seq(
      (1L, s"$run10 u1 u2"),
      (2L, s"v1 $run10"),
      (3L, "m1 m2 m3 m4 m5 m6 z1 z2 z3")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrings(d, "doc_id", "text", minLen = 4)
      .select("doc_id", "span_start", "span_end", "span_len", "n_docs")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set(
      (1L, 0, 9, 10, 1L),   // the contained [0,5]-with-C occurrence pruned
      (2L, 1, 10, 10, 1L),
      (3L, 0, 5, 6, 2L)))   // same extent vs A and vs B → one row, 2 partners
    // equal-extent aggregation on the long side too: make B's copy also
    // appear in a third doc → n_docs=2 for every long-run occurrence
    val d2 = Seq(
      (1L, s"$run10 u1 u2"),
      (2L, s"v1 $run10"),
      (3L, s"$run10 w1 w2")).toDF("doc_id", "text")
    val agg = Dedup.exactSubstrings(d2, "doc_id", "text", minLen = 4)
      .select("doc_id", "n_docs").as[(Long, Long)].collect().toSet
    assert(agg == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("exactSubstrings: a capped window INSIDE a shared passage does not fragment the span") {
    // docs 1 and 2 (alone) share a 12-word passage whose MIDDLE contains a
    // 4-gram that is viral (present in many other docs, so over maxDf and
    // excluded from pairing). Run bridging must still report ONE maximal
    // span of the full extent — overlapping matched windows prove the
    // bridged region shared; fragmenting it was the pre-fix behavior.
    val hot = "h1 h2 h3 h4" // the viral 4-gram
    val passage = s"p1 p2 p3 p4 $hot q1 q2 q3 q4"  // 12 words, hot at 4..7
    val viral = (10L to 16L).map(i => (i, s"$hot filler$i fillerb$i fillerc$i"))
    val d = (Seq(
      (1L, s"$passage tail1 tailx"),
      (2L, s"lead2 $passage")) ++ viral).toDF("doc_id", "text")
    // maxDf = 3: the hot 4-gram (in 9 docs) is capped; the passage's other
    // windows pair only docs 1 and 2
    val out = Dedup.exactSubstrings(d, "doc_id", "text", minLen = 4, maxDf = 3)
      .filter($"doc_id".isin(1L, 2L))
      .select("doc_id", "span_start", "span_end", "span_len", "n_docs")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set((1L, 0, 11, 12, 1L), (2L, 1, 12, 12, 1L)), out.toString)
  }

  test("exactSubstrings: capped EDGE windows extend back to the exact extent") {
    // docs 1 and 2 share a 12-word passage whose first 8 words are viral
    // boilerplate (every window inside them is over maxDf, 5 consecutive
    // capped starts — beyond the ≤ minLen bridging limit, and at the EDGE
    // where bridging can never help). Pre-fix the reported span started at
    // the first uncapped window; flank extension compares the two docs'
    // words outward and must restore the full extent exactly.
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    val passage = s"$hot r1 r2 r3 r4"
    val viral = (10L to 16L).map(i => (i, s"$hot fa$i fb$i fc$i fd$i"))
    val d = (Seq(
      (1L, s"$passage t1a t1b"),
      (2L, s"lead2x $passage")) ++ viral).toDF("doc_id", "text")
    val out = Dedup.exactSubstrings(d, "doc_id", "text", minLen = 4, maxDf = 3)
      .filter($"doc_id".isin(1L, 2L))
      .select("doc_id", "span_start", "span_end", "span_len", "n_docs")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(out == Set((1L, 0, 11, 12, 1L), (2L, 1, 12, 12, 1L)), out.toString)
    // trailing-edge symmetry: viral SUFFIX, rare head
    val passage2 = s"s1 s2 s3 s4 $hot"
    val viral2 = (20L to 26L).map(i => (i, s"ga$i gb$i gc$i gd$i $hot"))
    val d2 = (Seq(
      (1L, s"$passage2 u1 u2"),
      (2L, s"v1 $passage2")) ++ viral2).toDF("doc_id", "text")
    val out2 = Dedup.exactSubstrings(d2, "doc_id", "text", minLen = 4, maxDf = 3)
      .filter($"doc_id".isin(1L, 2L))
      .select("doc_id", "span_start", "span_end", "span_len")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out2 == Set((1L, 0, 11, 12), (2L, 1, 12, 12)), out2.toString)
  }

  test("exactSubstrings: maxDf cap, within-doc repeats, short docs, guards") {
    val shared = "alpha beta gamma delta"
    // three docs share the run; maxDf=2 excludes its windows from pairing
    val viral = Seq(
      (1L, s"$shared one uniq"),
      (2L, s"two $shared uniq2"),
      (3L, s"$shared three uniq3")).toDF("doc_id", "text")
    assert(Dedup.exactSubstrings(viral, "doc_id", "text", minLen = 4, maxDf = 2).isEmpty)
    assert(Dedup.exactSubstrings(viral, "doc_id", "text", minLen = 4, maxDf = 3)
      .count() == 3)
    // within-doc repetition alone never pairs (cross-doc only, as d10)
    val selfrep = Seq(
      (1L, s"$shared $shared"),
      (2L, "totally different words here man")).toDF("doc_id", "text")
    assert(Dedup.exactSubstrings(selfrep, "doc_id", "text", minLen = 4).isEmpty)
    // docs under minLen words contribute no windows
    val short = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.exactSubstrings(short, "doc_id", "text", minLen = 4).isEmpty)
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrings(short, "doc_id", "text", minLen = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.exactSubstrings(short, "doc_id", "text", minLen = 4, maxDf = 1)
    }
  }

  test("exactSubstrings: detect → cut (coverage path) → re-detect converges on natural text") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"pre $shared post1 q r s t u v"),
      (2L, s"$shared mid2 w x y z zz yy"),
      (3L, "wholly unrelated text with plenty of distinct words here")).toDF("doc_id", "text")
    val detected = Dedup.exactSubstrings(corpus, "doc_id", "text", minLen = 8)
    assert(detected.count() == 2)
    // the CUT uses the linear coverage path (duplicatedSpans at n=minLen):
    // its position set equals the union of arbitrary-length duplicated
    // spans, so cutting it removes every d16 occurrence too
    val cut = Dedup.cutSpans(corpus,
      Dedup.duplicatedSpans(corpus, "doc_id", "text", n = 8, minDocs = 2),
      "doc_id", "text")
      .select(col("doc_id"), col("text_cut").as("text"))
    assert(Dedup.exactSubstrings(cut, "doc_id", "text", minLen = 8).isEmpty)
  }

  test("qualityKeepers: highest score wins the cluster, ties and misses degrade sanely") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val scores = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 9.0), // tie 2 vs 3 → min id 2
      (10L, 1.0)                        // 11 has NO score → ranks last
    ).toDF("doc_id", "score")
    val out = Dedup.qualityKeepers(pairs, "id_a", "id_b", scores, "doc_id", "score")
      .select("doc_id", "component", "keeper").as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L),
      (10L, 10L, 10L), (11L, 10L, 10L)))
  }

  test("semanticNearDup: subset of brute force with identical scores, useful recall") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val cb = graft.similarity.Similarity.trainCentroids(e, "embedding", nCells = 8)
    val sem = Dedup.semanticNearDup(e, "vec_id", "embedding", cb, threshold = 0.45)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val brute = Dedup.embeddingNearDup(e, "vec_id", "embedding", threshold = 0.45)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty)
    // precision 1: every cell-blocked pair IS a brute pair, scores identical
    assert(sem.subsetOf(brute), (sem -- brute).take(3).toString)
    // recall: cell blocking must find a meaningful share of the exact pairs
    val recall = sem.size.toDouble / brute.size
    info(s"semantic recall = ${sem.size}/${brute.size} = $recall")
    assert(recall >= 0.3, s"recall $recall below floor")
    // pairs are canonical (a < b) and tagged with their cell
    val cells = Dedup.semanticNearDup(e, "vec_id", "embedding", cb, 0.45)
    assert(cells.columns.toSeq == Seq("id_a", "id_b", "cosine", "cell_id"))
    assert(cells.filter(col("id_a") >= col("id_b")).isEmpty)
  }

  test("qualityKeepers: duplicate score rows do not fan out the output") {
    // a doc scored twice (e.g. re-scored batches unioned) must still yield
    // ONE row per clustered doc; the max of its scores ranks it
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val scores = Seq((1L, 3.0), (1L, 9.0), (2L, 5.0)).toDF("doc_id", "score")
    val out = Dedup.qualityKeepers(pairs, "id_a", "id_b", scores, "doc_id", "score")
      .select("doc_id", "component", "keeper").as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 2, s"fan-out: $out")
    assert(out.toSet == Set((1L, 1L, 1L), (2L, 1L, 1L))) // max(3,9)=9 beats 5
  }

  test("hot-shingle cap: stop-shingles stop producing candidate pairs") {
    // three docs share ONLY a boilerplate prefix; two are real near-dups
    val docs = Seq(
      (1L, "subscribe to our newsletter today the quick brown fox jumps over the dog"),
      (2L, "subscribe to our newsletter today the quick brown fox jumps over the dog"),
      (3L, "subscribe to our newsletter today completely different content here entirely")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((1L, 3L)))
    // cap = 2: the 3-doc boilerplate shingles drop; (1,3) no longer pairs,
    // the true dup (1,2) survives with jaccard 1 over the capped space
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.1,
      maxShingleDocFreq = Some(2))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)) && !capped.contains((1L, 3L)))
    // a cap above every doc frequency is a no-op (exact result preserved)
    val noop = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.1,
      maxShingleDocFreq = Some(100))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(noop == uncapped)
    // the LSH path accepts the same knob
    val lsh = Dedup.minHashLsh(docs, "doc_id", "text", n = 3, threshold = 0.9,
      maxShingleDocFreq = Some(2))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == Set((1L, 2L)))
  }

  test("incremental exact dedup: in-batch keeper + anti-join against the index") {
    val incoming = Seq(
      (10L, "seen before"), // in the index -> dropped
      (11L, "brand new"),
      (12L, "brand new"), // in-batch dup of 11 -> dropped
      (13L, "also new")).toDF("doc_id", "text")
    val index = Seq("seen before").toDF("t")
      .select(md5($"t").as("fp"))
    val out = Dedup.incrementalExact(incoming, Some(index), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L))
    // no index: only in-batch dedup
    val noIx = Dedup.incrementalExact(incoming, None, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(noIx == Set(10L, 11L, 13L))
  }

  test("connected components: reliable-checkpoint strategy matches local") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expected = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // without a checkpoint dir the reliable strategy refuses loudly
    val hadDir = spark.sparkContext.getCheckpointDir
    if (hadDir.isEmpty)
      intercept[IllegalArgumentException] {
        Dedup.connectedComponents(pairs, "id_a", "id_b", 25, Dedup.ReliableCheckpoint)
      }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b", 25, Dedup.ReliableCheckpoint)
      .as[(Long, Long)].collect().toMap
    assert(out == expected)
  }

  test("embedding near-dup finds identical vectors") {
    val d = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f)),
      (2, Seq(0.99f, 0.01f, 0.0f)),
      (3, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(d, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    assert(pairs == Set((1, 2)))
  }

  test("paragraph dedup: corpus-wide first occurrence survives, docs reassemble in order") {
    val d = Seq(
      (1L, "intro\n\nshared footer\n\nbody one"),
      (2L, "body two\n\nshared footer"),
      (3L, "shared footer")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 owns the footer's first occurrence; later copies are cut
    assert(out(1L) == (("intro\n\nshared footer\n\nbody one", 3L, 3L)))
    assert(out(2L) == (("body two", 2L, 1L)))
    // a doc that was ALL boilerplate keeps an empty text, not a lost row
    assert(out(3L) == (("", 1L, 0L)))
  }

  test("paragraph dedup is idempotent and a dup-free corpus passes through") {
    val d = Seq((1L, "a\n\nb"), (2L, "c")).toDF("doc_id", "text")
    val once = Dedup.paragraphDedup(d, "doc_id", "text")
    val again = Dedup.paragraphDedup(
      once.select(col("doc_id"), col("text_dedup").as("text")), "doc_id", "text")
    assert(once.select("doc_id", "text_dedup").as[(Long, String)].collect().toSet ==
      Set(1L -> "a\n\nb", 2L -> "c"))
    assert(again.select("doc_id", "text_dedup").as[(Long, String)].collect().toSet ==
      Set(1L -> "a\n\nb", 2L -> "c"))
  }

  test("minHashLsh band misconfiguration refuses loudly, never silently empty") {
    val d = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    // rowsPerBand > numHashes -> zero bands -> every doc silently dropped
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minHashLsh(d, "doc_id", "text", numHashes = 8, rowsPerBand = 16)
    }
    assert(e1.getMessage.contains("ZERO bands"), e1.getMessage)
    // non-divisible split -> silently unused hashes (recall loss)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.minHashLsh(d, "doc_id", "text", numHashes = 32, rowsPerBand = 5)
    }
    assert(e2.getMessage.contains("divisible"), e2.getMessage)
  }

  test("connectedComponentsPropagation refuses an unconverged exit (split labels)") {
    // a 4-hop chain cannot converge in 1 round of min-label propagation
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsPropagation(chain, "a", "b", maxIter = 1).collect()
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
    // and converged output is correct
    val ok = Dedup.connectedComponentsPropagation(chain, "a", "b", maxIter = 10)
      .select("component").distinct().count()
    assert(ok == 1)
  }

  test("incrementalExactBloom honors the first-column index convention, any name") {
    val batch = Seq((10L, "dup text"), (11L, "fresh text")).toDF("doc_id", "text")
    // index fingerprint column named 'hash' (not 'fp') — the documented
    // drop-in contract is incrementalExact's: first column is the key
    val ix = Seq(Tuple1("dup text")).toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("hash"))
    val out = Dedup.incrementalExactBloom(batch, Some(ix), "doc_id", "text",
      expectedItems = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L), out.toString)
  }
}
