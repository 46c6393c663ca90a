package graft.text

import graft.SparkSuite

/** Property fuzz for the bigram LM: [[LanguageModel.perplexity]] checked
  * against a plain-Scala reference over seeded random corpora (small
  * vocabulary → dense bigram reuse, the regime where a wrong count or a
  * missed BOS shows). The reference fits the same add-one model with
  * HashMaps and computes per-doc cross-entropy directly from the
  * definition (per-bigram ln P, no decomposition) — so the engine's
  * seen-only ln-decomposition is validated against the undreamed-of
  * naive formula, not against itself. Compared at the operator's own
  * round-6 contract with a 1-ulp-scale slack for summation order. */
class LanguageModelFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val Bos = LanguageModel.Bos

  private def referenceXent(corpus: Seq[(Long, String)],
      seed: Seq[String]): Map[Long, Double] = {
    val seedBigrams = seed.flatMap { t =>
      val w = t.split(" ", -1)
      (Bos +: w.dropRight(1)).zip(w)
    }
    val pair = seedBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctx = seedBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = seedBigrams.map(_._2).distinct.size.toLong + 1
    corpus.map { case (id, t) =>
      val w = t.split(" ", -1)
      val bgs = (Bos +: w.dropRight(1)).zip(w)
      val sumLnP = bgs.map { bg =>
        math.log((pair.getOrElse(bg, 0L) + 1).toDouble) -
          math.log((ctx.getOrElse(bg._1, 0L) + v).toDouble)
      }.sum
      id -> -sumLnP / w.length
    }.toMap
  }

  test("fuzz: engine xent matches the naive per-bigram reference on random corpora") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("a", "b", "c", "d", "e")
    def doc(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 1 to 5) {
      val seed = Seq.fill(6)(doc(1 + rnd.nextInt(12)))
      val corpus = (1L to 20L).map(i => i -> doc(1 + rnd.nextInt(15)))
      val expected = referenceXent(corpus, seed)
      val got = LanguageModel.perplexity(corpus.toDF("doc_id", "text"),
          "doc_id", "text", seed.toDF("text"), "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got.keySet == expected.keySet, s"round $round: row set")
      for ((id, e) <- expected) {
        val r6 = BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(id) - r6) <= 1e-6 + 1e-12,
          s"round $round doc $id: engine ${got(id)} vs reference $e (round-6 $r6)")
      }
    }
  }
}
