package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bigram LM perplexity: hand-computed cross-entropy (smoothing, unseen
  * pair/context handling), word-order sensitivity (the property that
  * distinguishes it from the bag-of-words scorers), empty docs, full
  * coverage, and train/score reuse. The cross-engine leg is the t16 DuckDB
  * gate, which refits the model end-to-end. */
class LanguageModelSpec extends SparkSuite {
  import spark.implicits._

  private def score(corpus: Seq[(Long, String)], seed: Seq[String]): Map[Long, (Int, Double, Double)] =
    LanguageModel.perplexity(corpus.toDF("doc_id", "text"), "doc_id", "text",
        seed.toDF("text"), "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap

  private def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed cross-entropy: counts, smoothing, and V") {
    // seed {a b, a c}: pairs (B,a)=2 (a,b)=1 (a,c)=1; ctx B=2 a=2;
    // vocab {a,b,c} -> V=4. Doc "a b":
    //   lnP(a|B) = ln(2+1) - ln(2+4);  lnP(b|a) = ln(1+1) - ln(2+4)
    //   xent = (2 ln6 - ln3 - ln2) / 2 = ln6 / 2
    val got = score(Seq(1L -> "a b"), Seq("a b", "a c"))
    val (n, xent, ppl) = got(1L)
    assert(n == 2)
    assert(xent == r6(math.log(6.0) / 2))
    assert(ppl == r6(math.exp(r6(math.log(6.0) / 2))))
  }

  test("unseen pair contributes ln(1)=0; unseen context costs the full ln(V)") {
    // doc "z z": (B,z) unseen pair in seen ctx B -> -ln(2+4);
    //            (z,z) unseen ctx            -> -ln(4)
    val got = score(Seq(1L -> "z z"), Seq("a b", "a c"))
    assert(got(1L)._2 == r6((math.log(6.0) + math.log(4.0)) / 2))
  }

  test("word order matters: reference-ordered text beats its shuffle") {
    val seed = Seq.fill(20)("the cat sat on the mat")
    val got = score(Seq(1L -> "the cat sat", 2L -> "sat the cat"), seed)
    assert(got(1L)._2 < got(2L)._2,
      s"in-order xent ${got(1L)._2} should beat shuffled ${got(2L)._2}")
  }

  test("every corpus row scores exactly once; empty text is n=1, not a crash") {
    val got = score(Seq(1L -> "", 2L -> "a b", 3L -> "q r s"), Seq("a b"))
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._1 == 1) // split("") = [""] -> one BOS bigram
    assert(got(1L)._2 > 0)
    // NULL text = the empty document: scored identically to "", not dropped
    val withNull = score(Seq(1L -> null, 2L -> ""), Seq("a b"))
    assert(withNull.keySet == Set(1L, 2L))
    assert(withNull(1L) == withNull(2L))
  }

  test("train once, score many: reused model gives identical results") {
    val lm = LanguageModel.train(Seq("a b", "a c").toDF("text"), "text")
    assert(lm.vocabSize == 4)
    val corpus = Seq(1L -> "a b c", 2L -> "c a").toDF("doc_id", "text")
    val s1 = LanguageModel.crossEntropy(lm, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val s2 = LanguageModel.crossEntropy(lm, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(s1 == s2)
  }

  test("save/load round-trips the model bit-for-bit; foreign files refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("lm-model").toString
    val lm = LanguageModel.train(Seq("a b c", "a b d").toDF("text"), "text")
    LanguageModel.save(lm, dir)
    val loaded = LanguageModel.load(spark, dir)
    assert(loaded.vocabSize == lm.vocabSize)
    val corpus = Seq(1L -> "a b x", 2L -> "d a").toDF("doc_id", "text")
    def s(m: LanguageModel.BigramLm) =
      LanguageModel.crossEntropy(m, corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(s(loaded) == s(lm)) // integer counts round-trip exactly
    // a foreign parquet at the path must refuse, not mis-score
    val bad = java.nio.file.Files.createTempDirectory("lm-bad").toString
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$bad/pairs")
    val e = intercept[IllegalArgumentException](LanguageModel.load(spark, bad))
    assert(e.getMessage.contains("not a bigram-LM"))
  }

  test("merge(train(A), train(B)) IS train(A ++ B) — exact, so training is map-reduce-composable") {
    val a = Seq("a b c", "a b")
    val b = Seq("b c d", "c a")
    val merged = LanguageModel.merge(
      LanguageModel.train(a.toDF("text"), "text"),
      LanguageModel.train(b.toDF("text"), "text"))
    val full = LanguageModel.train((a ++ b).toDF("text"), "text")
    assert(merged.vocabSize == full.vocabSize)
    val corpus = Seq(1L -> "a b c d", 2L -> "d c b", 3L -> "").toDF("doc_id", "text")
    def s(m: LanguageModel.BigramLm) =
      LanguageModel.crossEntropy(m, corpus, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(s(merged) == s(full)) // integer counts add exactly
  }

  test("empty seed refuses loudly — never the everything-passes degenerate model") {
    val e = intercept[IllegalArgumentException](
      LanguageModel.train(Seq.empty[String].toDF("text"), "text"))
    assert(e.getMessage.contains("empty seed"))
  }

  test("seed-like documents score lower perplexity than off-distribution ones") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val seed = d.filter(col("doc_id") < 100).select("text")
    val out = LanguageModel.perplexity(d, "doc_id", "text", seed, "text")
    val seedMed = out.filter(col("doc_id") < 100).agg(expr("percentile(ppl, 0.5)")).head().getDouble(0)
    val restMed = out.filter(col("doc_id") >= 100).agg(expr("percentile(ppl, 0.5)")).head().getDouble(0)
    assert(seedMed < restMed,
      s"seed median ppl $seedMed should undercut non-seed $restMed")
  }
}
