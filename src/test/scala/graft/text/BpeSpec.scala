package graft.text

import scala.collection.mutable

import graft.SparkSuite
import graft.sources.Tables

class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Independent single-node reference trainer: textbook quadratic BPE over
    * an in-memory word-frequency map — a deliberately different code path
    * (no DataFrames, no folds) so agreement with [[Bpe.train]] pins the
    * distributed implementation rather than restating it. */
  private def referenceTrain(texts: Seq[String], numMerges: Int,
      minFreq: Long = 2L): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    var rounds = 0
    var stop = false
    while (rounds < numMerges && !stop) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((sym, f) <- words; i <- 0 until sym.length - 1)
        counts((sym(i), sym(i + 1))) = counts.getOrElse((sym(i), sym(i + 1)), 0L) + f
      if (counts.isEmpty) stop = true
      else {
        // count DESC, then (left, right) ASC — the pinned tie-break
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l0, r0), c0) => (-c0, l0, r0) }.head
        if (c < minFreq) stop = true
        else {
          out += ((l, r, c))
          words = words.map { case (sym, f) =>
            val merged = mutable.ArrayBuffer.empty[String]
            var k = 0
            while (k < sym.length) {
              if (k < sym.length - 1 && sym(k) == l && sym(k + 1) == r) {
                merged += l + r; k += 2
              } else { merged += sym(k); k += 1 }
            }
            merged.toVector -> f
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          rounds += 1
        }
      }
    }
    out.toSeq
  }

  test("distributed training matches the independent reference on the documents corpus") {
    val docs = Tables.load(spark, sf0001, "documents")
    val texts = docs.select("text").as[String].collect().toSeq
    val ref = referenceTrain(texts, numMerges = 32)
    val got = Bpe.train(docs, "text", Bpe.Options(numMerges = 32))
      .map(m => (m.left, m.right, m.freq))
    assert(ref.nonEmpty && got == ref,
      s"first divergence at rank ${got.zip(ref).indexWhere { case (a, b) => a != b }}")
  }

  test("greedy per-round fold: overlapping runs merge left-to-right, ties break lexicographically") {
    // 'aaa' x3: pair (a,a) has weighted count 6 (two adjacent positions per
    // word, three words). After merging, ONE (aa,a) pair per word remains —
    // a merged token never re-merges within its own round.
    val d = Seq("aaa aaa aaa", "bc bc bc bc bc bc").toDF("text")
    val merges = Bpe.train(d, "text", Bpe.Options(numMerges = 2))
    // (a,a)=6 and (b,c)=6 tie -> lexicographic: (a,a) first
    assert(merges.map(m => (m.left, m.right, m.freq)) ==
      Seq(("a", "a", 6L), ("b", "c", 6L)))
  }

  test("minFreq stops training before rank budget is exhausted") {
    val d = Seq("ab ab cd").toDF("text")
    val merges = Bpe.train(d, "text", Bpe.Options(numMerges = 10, minFreq = 2))
    // (a,b)=2 qualifies; every remaining pair has count 1 < minFreq
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("encode reproduces training segmentation and round-trips the characters") {
    val docs = Tables.load(spark, sf0001, "documents")
    val merges = Bpe.train(docs, "text", Bpe.Options(numMerges = 24))
    val enc = Bpe.encode(docs.limit(50), "text", merges)
      .select("text", "tokens", "n_tokens")
      .as[(String, Seq[String], Int)].collect()
    assert(enc.nonEmpty)
    enc.foreach { case (text, tokens, n) =>
      assert(n == tokens.length)
      // lossless: token concatenation restores the whitespace-stripped text
      assert(tokens.mkString == text.split("\\s+").filter(_.nonEmpty).mkString)
    }
    // merges actually compress: fewer tokens than characters
    val chars = enc.map(_._1.replaceAll("\\s+", "").length).sum
    assert(enc.map(_._3).sum < chars)
    // rank-priority encoding of a fresh word agrees with applying the
    // training rounds in order (the equivalence the encoder relies on)
    assert(Bpe.encodeWord("aaa", Map(("a", "a") -> 0)).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("abab", Map(("a", "b") -> 0, ("ab", "ab") -> 1)).toSeq ==
      Seq("abab"))
  }

  test("driver-side training path is bit-identical to the distributed rounds") {
    // corpora chosen to stress the tie-break: repeated pairs with equal
    // counts, supplementary characters (UTF-8 byte order puts U+1F600
    // ABOVE U+FFFD; Java UTF-16 order would invert them), multi-byte BMP
    val corpora = Seq(
      Seq("aaa aaa aaa", "bc bc bc bc bc bc"),
      Seq("xy xy \uFFFD\uFFFD \uD83D\uDE00\uD83D\uDE00",
        "\uFFFD\uFFFD \uD83D\uDE00\uD83D\uDE00"),
      Seq("the cat sat on the mat", "the bat sat on the hat", "mat hat cat"),
      Tables.load(spark, sf0001, "documents")
        .select("text").as[String].take(40).toSeq)
    corpora.foreach { texts =>
      val d = texts.toDF("text")
      val opts = Bpe.Options(numMerges = 16)
      def withThreshold[T](v: String)(body: => T): T = {
        spark.conf.set("spark.graft.bpe.maxDriverVocab", v)
        try body finally spark.conf.unset("spark.graft.bpe.maxDriverVocab")
      }
      val local = withThreshold(Long.MaxValue.toString)(Bpe.train(d, "text", opts))
      val dist = withThreshold("0")(Bpe.train(d, "text", opts))
      assert(local == dist,
        s"local/distributed divergence on corpus ${texts.take(1)}: " +
          s"first diff at rank ${local.zip(dist).indexWhere { case (a, b) => a != b }} " +
          s"(local ${local.size} merges, dist ${dist.size})")
    }
  }
}
