package graft.text

import graft.SparkSuite

/** Property fuzz for BM25: [[Bm25.search]] against a plain-Scala
  * reference computing the textbook formula directly (per-query maps, no
  * inverted index, no fold ordering tricks) over seeded random corpora
  * with a small vocabulary — heavy term overlap, many near-ties, the
  * regime that stresses rank stability. Scores compared at the
  * operator's round-6 contract; ranks compared exactly (the reference
  * breaks ties by doc id like the engine). */
class Bm25FuzzSpec extends SparkSuite {
  import spark.implicits._

  private def reference(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Int, Double)] = {
    val k1 = 1.2; val b = 0.75
    val docs = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    val n = docs.size.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = docs.flatMap(_._2.distinct).groupBy(identity).map { case (t, v) => t -> v.size }
    queries.flatMap { case (q, qt) =>
      val terms = qt.split(" ", -1).distinct
      val scored = docs.flatMap { case (d, ws) =>
        val tf = ws.groupBy(identity).map { case (t, v) => t -> v.size }
        val contribs = terms.toSeq.sorted.flatMap { t =>
          tf.get(t).map { f =>
            val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
            idf * (f * (k1 + 1.0)) / (f + k1 * ((1.0 - b) + b * ws.length / avgdl))
          }
        }
        if (contribs.isEmpty) None
        else Some(d -> contribs.foldLeft(0.0)(_ + _)) // same left fold order
      }
      scored.sortBy { case (d, sc) => (-sc, d) }.take(k).zipWithIndex.map {
        case ((d, sc), i) =>
          (q, d, i + 1,
            BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
  }

  test("fuzz: scores and ranks match the textbook reference on random corpora") {
    val rnd = new scala.util.Random(777L)
    val vocab = Vector("x", "y", "z", "w", "v", "u")
    def doc(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 1 to 5) {
      val corpus = (1L to 12L).map(i => i -> doc(1 + rnd.nextInt(10)))
      val queries = (100L to 102L).map(i => i -> doc(1 + rnd.nextInt(4)))
      val expected = reference(corpus, queries, k = 4)
      val got = Bm25.search(corpus.toDF("doc_id", "text"), "doc_id", "text",
          queries.toDF("qid", "qtext"), "qid", "qtext", k = 4)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(got == expected, s"round $round mismatch:\n got=$got\n exp=$expected")
    }
  }
}
