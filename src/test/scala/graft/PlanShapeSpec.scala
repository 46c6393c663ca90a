package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Plan-shape regression guards: the properties that make these operators
  * scale are asserted on the PHYSICAL plan, so a refactor that silently
  * de-optimizes (drops a pushdown, turns a broadcast into a shuffle, adds
  * an exchange or a cartesian product) fails here instead of at 100 TB. */
class PlanShapeSpec extends SparkSuite {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("filter pushdown and column pruning reach the parquet scan (q4)") {
    val plan = physical(queries.Relational.queries("q4_filter_pushdown")(spark, sf0001))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(!plan.contains("PushedFilters: []"), "filters were not pushed:\n" + plan)
  }

  test("dimension joins broadcast; no shuffle of small sides (q2)") {
    val plan = physical(queries.Relational.queries("q2_region_revenue")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("SCD2 chain rebuild uses ONE exchange for all window steps") {
    import spark.implicits._
    val ch = Seq((1, 1L, "a"), (1, 2L, "b"), (2, 1L, "x")).toDF("k", "seq", "v")
    val plan = physical(graft.operators.ScdMerge.scd2(None, ch,
      graft.operators.ScdMerge.Options(Seq("k"), Seq("seq"), scdType = 2)))
    assert(countOccurrences(plan, "Exchange ") == 1,
      s"expected exactly one exchange in the rebuild:\n$plan")
  }

  test("LSH near-dup has no cartesian product; brute-force baseline does") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val lsh = physical(graft.dedup.Dedup.embeddingNearDupLsh(
      e, "vec_id", "embedding", threshold = 0.45, dim = 64))
    assert(!lsh.contains("CartesianProduct") && !lsh.contains("BroadcastNestedLoopJoin"),
      lsh)
    val bf = physical(graft.dedup.Dedup.embeddingNearDup(e, "vec_id", "embedding", 0.45))
    assert(bf.contains("CartesianProduct") || bf.contains("BroadcastNestedLoopJoin"))
  }

  test("contamination broadcasts the probe side") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.dedup.Dedup.contamination(
      d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
      "doc_id", "text", "doc_id", "text", n = 5))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("partition-scoped merge reads carry static PartitionFilters") {
    import spark.implicits._
    val store = new graft.exec.TableStore(spark,
      java.nio.file.Files.createTempDirectory("ps-wh").toString + "/wh")
    store.overwrite("pp", (1 to 100).map(i => (i % 10L, i.toLong)).toDF("k", "seq"), Seq("k"))
    val affected = store.affectedValues(Seq((3L, 0L), (7L, 0L)).toDF("k", "seq"), Seq("k"))
    val scoped = store.read("pp")
      .filter(graft.exec.TableStore.partitionPredicate(Seq("k"), affected))
    val plan = physical(scoped)
    assert(plan.contains("PartitionFilters: [((k"), plan) // static pruning, not runtime DPP
  }

  test("as-of join plans with NO join operator — one keyed window pass") {
    val plan = physical(queries.Advanced.queries("j1_asof_join")(spark, sf0001))
    assert(!plan.contains("Join"), "as-of must not plan a join:\n" + plan)
    assert(plan.contains("Window"), plan)
    // union + window = exactly one shuffle on the key
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 1,
      s"expected one keyed exchange:\n$plan")
  }

  test("resample plans grid + fill without any join operator") {
    val plan = physical(queries.Advanced.queries("q39_resample")(spark, sf0001))
    assert(!plan.contains("Join"), "resample must stay join-free:\n" + plan)
    assert(plan.contains("Window"), plan)
  }

  test("range join is an equi-join on (key, bucket) — no nested loop, no cartesian") {
    val plan = physical(queries.Advanced.queries("j2_range_join")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join degenerated to a nested loop:\n" + plan)
  }

  test("interval overlap join is an equi-join on (key, bucket) — no nested loop") {
    val plan = physical(queries.Advanced.queries("j3_interval_overlap")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "interval join degenerated to a nested loop:\n" + plan)
  }

  test("hash sampling is a pure scan filter — no exchange at all") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.dedup.Sampling.byHash(d, "doc_id", 0.1))
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperature sampling broadcasts the rate table — corpus is filtered, never shuffled") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.dedup.Sampling.temperatureSample(d, "doc_id", "source"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges belong to the tiny per-domain aggregation feeding
    // the broadcast — the corpus side must reach its join as a plain scan
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("span dedup joins windows on the hash — no cartesian, no nested loop") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.dedup.Dedup.duplicatedSpans(d, "doc_id", "text", n = 8))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("bloom incremental dedup: ONE join total — the definitely-new branch never joins") {
    import org.apache.spark.sql.functions.md5
    val d = Tables.load(spark, sf0001, "documents")
    val ix = d.filter(col("doc_id") < 20).select(md5(col("text")).as("fp")).distinct()
    val plan = physical(graft.dedup.Dedup.incrementalExactBloom(
      d.filter(col("doc_id") >= 20), Some(ix), "doc_id", "text", expectedItems = 20))
    // the whole point of the sketch: only the maybe residue pays a join.
    // Two joins would mean the fresh branch re-verified against the index.
    val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
      .map(j => j -> plan.sliding(j.length).count(_ == j)).toMap
    assert(joins.values.sum == 1, s"$joins\n$plan")
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("word rarity: vocabulary join is keyed on the word — no cartesian") {
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.text.TextAnalysis.wordRarity(d, "doc_id", "text"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("sidecar-schema reads keep filter pushdown and pruning") {
    import spark.implicits._
    val store = new graft.exec.TableStore(spark,
      java.nio.file.Files.createTempDirectory("ss-wh").toString + "/wh")
    store.overwrite("t", (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"))
    store.append("t", Seq((101L, "w", 1.5)).toDF("k", "v", "extra")) // widen -> sidecar read path
    val plan = physical(store.read("t").filter(col("k") > 50).select("k"))
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,50)]"), plan)
    assert(plan.contains("ReadSchema: struct<k:bigint>"), plan)
  }

  test("profile approx mode is Expand-free; exact mode pays Expand knowingly") {
    // exact multi-column countDistinct plans via Expand — rows multiply by
    // the column count, which is the documented cost of `exact = true` and
    // a 100 TB non-starter for wide profiles. The approx path (HLL) must
    // stay a single-pass aggregate with NO Expand; this pins it.
    val docs = Tables.load(spark, sf0001, "documents")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val approx = physical(graft.operators.Profile.describe(docs, cols, exact = false))
    assert(!approx.contains("Expand"), "approx profile grew an Expand:\n" + approx)
    val exact = physical(graft.operators.Profile.describe(docs, cols, exact = true))
    assert(exact.contains("Expand"),
      "exact profile no longer plans via Expand — update Profile's docs:\n" + exact)
  }

  test("incremental dedup anti-joins the index — hash join, no cartesian") {
    val d = Tables.load(spark, sf0001, "documents")
    val index = d.filter(col("doc_id") < 250).select(md5(col("text")).as("fp")).distinct()
    val plan = physical(graft.dedup.Dedup.incrementalExact(
      d.filter(col("doc_id") >= 250), Some(index), "doc_id", "text"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("gopher rules are pure in-row expressions — no exchange at all") {
    // NOTE deliberately NOT asserted: whole-stage codegen. The
    // higher-order filter() signals are CodegenFallback in Spark 4.1, so
    // the Project runs interpreted per row — acceptable for a
    // scan-shaped operator (still zero exchanges, still one pass); a
    // codegen assertion here would only match the scan stage's '*(1)'
    // and pin nothing.
    val d = Tables.load(spark, sf0001, "documents")
    val plan = physical(graft.text.TextAnalysis.gopherRules(d, "text"))
    assert(!plan.contains("Exchange"), "gopher rules grew a shuffle:\n" + plan)
  }

  test("LM scoring joins are seed-keyed hash joins — no cartesian, no nested loop") {
    val d = Tables.load(spark, sf0001, "documents")
    val lm = graft.text.LanguageModel.train(
      d.filter(col("doc_id") < 50).select("text"), "text")
    val plan = physical(graft.text.LanguageModel.crossEntropy(lm, d, "doc_id", "text"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }

  test("BM25 broadcasts the query terms; postings join is term-keyed") {
    val d = Tables.load(spark, sf0001, "documents")
    val qs = d.filter(col("doc_id") < 10).select(col("doc_id").as("qid"),
      array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
    val plan = physical(graft.text.Bm25.search(d, "doc_id", "text",
      qs, "qid", "qtext", k = 5))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan)
  }
}
