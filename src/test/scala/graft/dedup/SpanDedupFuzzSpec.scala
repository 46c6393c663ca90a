package graft.dedup

import graft.SparkSuite

/** Property fuzz for the span-dedup pipeline: [[Dedup.duplicatedSpans]] and
  * [[Dedup.cutSpans]] checked against a brute-force in-memory reference over
  * seeded random corpora (small vocabulary → frequent cross-doc window
  * collisions, the regime that stresses the island merge). The reference
  * recomputes windows, the ≥minDocs distinct-doc filter, the gap>n island
  * split, and the positional cut with plain Scala collections — any drift
  * in indexing, merging, or cutting shows as a set mismatch with the seed
  * in the failure message. */
class SpanDedupFuzzSpec extends SparkSuite {
  import spark.implicits._

  private def referenceSpans(corpus: Seq[(Long, String)], n: Int,
      minDocs: Int): Set[(Long, Int, Int, Long)] = {
    val windows = corpus.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      if (ws.length < n) Seq.empty
      else (0 to ws.length - n).map(i => (id, i, ws.slice(i, i + n).mkString(" ")))
    }
    val dupWins = windows.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs)
      .values.flatten.toSeq
    dupWins.groupBy(_._1).flatMap { case (id, ws) =>
      val starts = ws.map(_._2).sorted
      // islands: gap > n starts a new maximal span
      val islands = starts.tail.foldLeft(List(List(starts.head))) {
        case (acc @ (cur :: rest), s) =>
          if (s - cur.head <= n) (s :: cur) :: rest else List(s) :: acc
        case (Nil, s) => List(List(s))
      }
      islands.map { isl =>
        (id, isl.min, isl.max + n - 1, isl.size.toLong)
      }
    }.toSet
  }

  private def referenceCut(corpus: Seq[(Long, String)],
      spans: Set[(Long, Int, Int, Long)]): Map[Long, (String, Int)] =
    corpus.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val cover = spans.collect { case (sid, s0, s1, _) if sid == id =>
        (s0 to s1).toSet
      }.flatten
      val kept = ws.zipWithIndex.collect { case (w, i) if !cover.contains(i) => w }
      id -> (kept.mkString(" "), ws.length - kept.length)
    }.toMap

  test("duplicatedSpans + cutSpans match the brute-force reference on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e")
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(3) // window length 2..4
      val corpus = (0 until (5 + rnd.nextInt(10))).map { id =>
        val len = rnd.nextInt(30) // includes docs shorter than n and empty
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = corpus.toDF("doc_id", "text")
      val expected = referenceSpans(corpus, n, minDocs = 2)
      val spans = Dedup.duplicatedSpans(df, "doc_id", "text", n = n, minDocs = 2)
      val got = spans.select("doc_id", "span_start", "span_end", "n_windows")
        .as[(Long, Int, Int, Long)].collect().toSet
      assert(got == expected, s"seed=$seed n=$n spans diverged\n" +
        s"only-engine: ${got -- expected}\nonly-reference: ${expected -- got}")
      val expectedCut = referenceCut(corpus, expected)
      val gotCut = Dedup.cutSpans(df, spans, "doc_id", "text")
        .as[(Long, String, Int)].collect()
        .map { case (id, t, r) => id -> (t, r) }.toMap
      assert(gotCut == expectedCut, s"seed=$seed n=$n cut diverged")
    }
  }
}
