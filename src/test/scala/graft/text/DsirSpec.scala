package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** DSIR importance weights: target-likeness ordering, bigram (order)
  * sensitivity, smoothing of unseen features, the empty-target refusal,
  * and deterministic Gumbel-top-k selection. The cross-engine leg is the
  * m10 DuckDB gate, which refits both distributions end-to-end. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def weights(corpus: Seq[(Long, String)], target: Seq[String],
      buckets: Int = 4096): Map[Long, Double] =
    Dsir.logWeights(corpus.toDF("doc_id", "text"), "doc_id", "text",
        target.toDF("text"), "text", numBuckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("target-like documents weigh above off-target ones") {
    val corpus = Seq(1L -> "alpha beta alpha beta", 2L -> "gamma delta gamma delta")
    val got = weights(corpus, target = Seq("alpha beta alpha", "beta alpha"))
    assert(got(1L) > got(2L), s"target-like should win: $got")
    assert(got.keySet == Set(1L, 2L)) // every doc scored
  }

  test("bigram features make word ORDER matter") {
    // same unigram profile, different order: the target's bigram
    // "alpha beta" appears in doc 1 but not in doc 2's reversed text
    val corpus = Seq(1L -> "alpha beta alpha beta", 2L -> "beta alpha beta alpha")
    val got = weights(corpus, target = Seq.fill(5)("alpha beta").map(identity))
    assert(got(1L) > got(2L), s"in-order should win: $got")
  }

  test("weights are finite for fully-unseen documents (smoothing)") {
    val got = weights(Seq(1L -> "zzz qqq"), target = Seq("alpha beta"))
    assert(!got(1L).isNaN && !got(1L).isInfinite)
    assert(got(1L) < 0) // unseen-in-target features are a penalty
  }

  test("NULL text is the empty document — the row is weighted, not dropped") {
    val corpus = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dsir.logWeights(corpus, "doc_id", "text",
        Seq("alpha beta").toDF("text"), "text", numBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(!got(2L).isNaN && !got(2L).isInfinite)
  }

  test("empty target refuses loudly — never a constant-weight no-op") {
    val e = intercept[IllegalArgumentException](
      weights(Seq(1L -> "a"), target = Seq.empty))
    assert(e.getMessage.contains("empty target"))
  }

  test("gumbel top-k: deterministic, k-bounded, salt-sensitive, weight-dominant") {
    val w = (1L to 100L).map(i => (i, if (i <= 3) 1000.0 else 0.0))
      .toDF("doc_id", "dsir_logw")
    def sel(salt: Int) = Dsir.gumbelTopK(w, "doc_id", "dsir_logw", k = 5, salt)
      .collect().map(_.getLong(0)).toSet
    val a = sel(0)
    assert(a == sel(0))            // reproducible
    assert(a.size == 5)            // k respected
    assert(Set(1L, 2L, 3L).subsetOf(a), // a +1000 gap dwarfs gumbel noise
      s"high-weight docs must be selected: $a")
    assert(sel(7) != a || sel(13) != a,
      "different salts should redraw the zero-weight tail")
  }

  test("gumbelTopK refuses reserved column names instead of clobbering them") {
    import org.apache.spark.sql.functions._
    val w = Seq((1L, 0.5), (2L, 0.7)).toDF("doc_id", "w")
      .withColumn("__score", lit(9.9))
    val e = intercept[IllegalArgumentException] {
      Dsir.gumbelTopK(w, "doc_id", "w", k = 1)
    }
    assert(e.getMessage.contains("__score"), e.getMessage)
  }
}
