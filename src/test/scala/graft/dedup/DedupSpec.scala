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

  test("embedding near-dup finds identical vectors") {
    val d = Seq(
      (1, Seq(1.0f, 0.0f, 0.0f)),
      (2, Seq(0.99f, 0.01f, 0.0f)),
      (3, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(d, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet
    assert(pairs == Set((1, 2)))
  }
}
