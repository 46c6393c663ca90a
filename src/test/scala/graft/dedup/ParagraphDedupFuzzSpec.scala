package graft.dedup

import graft.SparkSuite

/** Property fuzz for paragraph dedup: [[Dedup.paragraphDedup]] against a
  * plain-Scala first-occurrence reference over seeded random corpora
  * (tiny paragraph vocabulary → heavy cross-doc duplication, including
  * whole-doc wipeouts and within-doc repeats). The reference walks docs
  * in (id, position) order keeping a seen-set — the definitional
  * semantics, independent of the engine's window-rank formulation. */
class ParagraphDedupFuzzSpec extends SparkSuite {
  import spark.implicits._

  private def reference(corpus: Seq[(Long, String)], sep: String)
      : Map[Long, (String, Long, Long)] = {
    val seen = scala.collection.mutable.Set.empty[String]
    // corpus sorted by id; positions are in-order within a doc
    corpus.sortBy(_._1).map { case (id, t) =>
      val paras = t.split(java.util.regex.Pattern.quote(sep), -1)
      val kept = paras.filter { p =>
        if (seen.contains(p)) false else { seen.add(p); true }
      }
      id -> ((kept.mkString(sep), paras.length.toLong, kept.length.toLong))
    }.toMap
  }

  test("fuzz: first-occurrence keeper set and reassembled text match the reference") {
    val rnd = new scala.util.Random(42424242L)
    val paraVocab = Vector("alpha", "beta beta", "gamma", "", "delta x", "eps")
    def doc(n: Int): String =
      Seq.fill(n)(paraVocab(rnd.nextInt(paraVocab.size))).mkString("\n\n")
    for (round <- 1 to 5) {
      val corpus = (1L to 15L).map(i => i -> doc(1 + rnd.nextInt(5)))
      val expected = reference(corpus, "\n\n")
      val got = Dedup.paragraphDedup(corpus.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"round $round mismatch")
    }
  }
}
