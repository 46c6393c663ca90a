package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Naive Bayes classifier: hand-computed posteriors on a tiny corpus,
  * multiplicity and unknown-word handling, the margin filter's tie
  * suppression, and end-to-end language recovery on the real corpus (the
  * cross-engine leg is the t13 DuckDB gate, which refits the model). */
class NaiveBayesSpec extends SparkSuite {
  import spark.implicits._

  private def classify(corpus: Seq[(Long, String)],
      seed: Seq[(String, String)], minMargin: Double = 1e-6): Map[Long, String] =
    NaiveBayes.classify(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      seed.toDF("lang", "text"), "text", "lang", minMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("separable two-class seed classifies held-out docs by shared vocabulary") {
    val seed = Seq("en" -> "the cat sat on the mat", "en" -> "the dog ran",
      "fr" -> "le chat dort sur le tapis", "fr" -> "le chien court")
    val got = classify(Seq(1L -> "the cat ran", 2L -> "le chien dort"), seed)
    assert(got == Map(1L -> "en", 2L -> "fr"))
  }

  test("hand-computed posterior: priors, smoothing, and unknown words") {
    // seed: en = {a a b}, fr = {c}; V = 3; doc = "a z" (z unknown to both)
    //   en: ln(1/2) - 2*ln(3+3) + ln(2+1)        (a:cnt 2; z unknown)
    //   fr: ln(1/2) - 2*ln(1+3)                  (both unknown)
    val seed = Seq("en" -> "a a b", "fr" -> "c")
    val en = math.log(0.5) - 2 * math.log(6.0) + math.log(3.0)
    val fr = math.log(0.5) - 2 * math.log(4.0)
    assert(en > fr) // sanity of the hand computation itself
    val got = classify(Seq(1L -> "a z"), seed)
    assert(got == Map(1L -> "en"))
    // and the margin filter respects the computed gap: a minMargin above
    // |en - fr| suppresses the prediction
    assert(classify(Seq(1L -> "a z"), seed, minMargin = en - fr + 0.1).isEmpty)
  }

  test("NULL text is the empty document — the corpus row never vanishes") {
    // the empty doc carries one ""-token; with seed en = {"" ...}? keep it
    // simpler: NULL corpus text scores as the one-token "" doc, which is
    // unknown to both classes, so the PRIOR decides — the row must appear
    // in the output (the LanguageModel/Dsir/Bm25 convention), not be
    // silently dropped by split(NULL) exploding to nothing
    val seed = Seq("en" -> "a", "en" -> "b", "fr" -> "c")
    val corpus = Seq(1L -> "a").toDF("doc_id", "text")
      .unionByName(Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = NaiveBayes.classify(corpus, "doc_id", "text",
        seed.toDF("lang", "text"), "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "en")) // 2L: prior 2:1 for en
    // and a NULL-text SEED row still contributes prior + its ""-token
    val seedNull = Seq(("en", "a"), ("fr", null.asInstanceOf[String]),
      ("fr", null.asInstanceOf[String])).toDF("lang", "text")
    val got2 = NaiveBayes.classify(
        Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"),
        "doc_id", "text", seedNull, "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fr saw "" twice in seed; the NULL doc's ""-token matches → fr wins
    assert(got2 == Map(7L -> "fr"))
  }

  test("exact ties are suppressed, not broken arbitrarily") {
    // identical class-conditional distributions -> equal scores everywhere
    val seed = Seq("x" -> "a b", "y" -> "a b")
    assert(classify(Seq(1L -> "a", 2L -> "b c"), seed).isEmpty)
  }

  test("word multiplicity counts: repeated evidence outweighs the prior") {
    // 'y' has 3x the seed docs (prior 3:1), but the doc repeats an
    // x-exclusive word — multiplicity must accumulate per occurrence
    val seed = Seq("x" -> "quux common", "y" -> "common alpha",
      "y" -> "common beta", "y" -> "common gamma")
    val got = classify(Seq(1L -> "quux quux quux", 2L -> "common"), seed)
    assert(got(1L) == "x")
    assert(got(2L) == "y") // prior decides for class-neutral evidence
  }

  /** Independent quadratic reference with the same formula. */
  private def refClassify(corpus: Seq[(Long, String)],
      seed: Seq[(String, String)], minMargin: Double): Map[Long, String] = {
    def toks(t: String) = t.split(" ", -1).toSeq
    val classes = seed.map(_._1).distinct.sorted
    val counts: Map[(String, String), Long] = seed
      .flatMap { case (c, t) => toks(t).map(w => (c, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = classes.map(c =>
      c -> counts.collect { case ((`c`, _), n) => n }.sum).toMap
    val nd = seed.groupBy(_._1).map { case (c, v) => c -> v.size.toLong }
    val vocab = counts.keys.map(_._2).toSet.size
    corpus.flatMap { case (id, t) =>
      val ws = toks(t)
      val scored = classes.map { c =>
        c -> (math.log(nd(c).toDouble) - math.log(seed.size.toDouble) -
          ws.size * math.log((totals(c) + vocab).toDouble) +
          ws.map(w => math.log((counts.getOrElse((c, w), 0L) + 1).toDouble))
            .filter(_ != 0.0).sum)
      }.sortBy { case (c, s) => (-s, c) }
      val margin = scored match {
        case (_, best) :: (_, second) :: _ => best - second
        case _ => Double.MaxValue
      }
      if (margin > minMargin) Some(id -> scored.head._1) else None
    }.toMap
  }

  test("matches the independent reference decision-for-decision on the real corpus") {
    // NOTE: the fixture's `lang` is METADATA over one shared 31-word
    // vocabulary (all languages draw the same words), so semantic language
    // recovery is impossible by construction — the strong pin is exact
    // agreement with an independently-coded model on the same data, plus
    // an above-chance sanity floor (frequency profiles differ slightly).
    val d = graft.sources.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang", "text")
    val rows = d.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = graft.queries.LlmData.t13NbClassify(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = refClassify(rows.map(r => (r._1, r._3)).toSeq,
      rows.filter(_._1 < 250).map(r => (r._2, r._3)).toSeq, 1e-6)
    assert(got == ref, {
      val onlyGot = got.toSet -- ref.toSet
      val onlyRef = ref.toSet -- got.toSet
      s"spark-only: ${onlyGot.take(5)}, ref-only: ${onlyRef.take(5)}"
    })
    val byId = rows.map(r => r._1 -> r._2).toMap
    val acc = got.count { case (id, p) => byId(id) == p }.toDouble / got.size
    assert(acc > 0.25, s"below the 5-class chance line: $acc") // 5 classes
  }
}
