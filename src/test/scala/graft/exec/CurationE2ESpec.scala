package graft.exec

import java.nio.file.Files

import graft.SparkSuite
import graft.config.YamlConfig

/** Flagship LLM-curation pipeline: the full quality → exact-dedup →
  * near-dup-cluster → decontaminate → sample chain expressed as ONE YAML
  * flowgroup over the function-plugin seam, run end-to-end twice for
  * determinism. */
class CurationE2ESpec extends SparkSuite {
  import spark.implicits._

  test("curation pipeline: five-stage corpus filter chain via YAML") {
    val (dir, wh) = (Files.createTempDirectory("curation").toString, "wh")
    val store = new TableStore(spark, s"$dir/$wh")
    val runner = new PipelineRunner(spark, store, s"$dir/ckpt")
    graft.sources.Tables.load(spark, sf0001, "documents")
      .createOrReplaceTempView("documents_raw")

    val yaml =
      """pipeline: curation
        |flowgroup: corpus_v1
        |actions:
        |  - name: load_corpus
        |    type: load
        |    source: {type: sql, sql: "SELECT doc_id, text FROM documents_raw WHERE doc_id >= 20"}
        |    target: v_corpus
        |  - name: load_benchmark
        |    type: load
        |    source: {type: sql, sql: "SELECT doc_id, text FROM documents_raw WHERE doc_id < 20"}
        |    target: v_benchmark
        |  - name: quality
        |    type: transform
        |    transform_type: python
        |    function: graft.plugins.CurationTransforms$QualityFilter
        |    source: v_corpus
        |    target: v_quality
        |  - name: exact_dedup
        |    type: transform
        |    transform_type: python
        |    function: graft.plugins.CurationTransforms$ExactDedupFilter
        |    source: v_quality
        |    target: v_exact
        |  - name: near_dedup
        |    type: transform
        |    transform_type: python
        |    function: graft.plugins.CurationTransforms$NearDupFilter
        |    source: v_exact
        |    target: v_neardup
        |    parameters: {threshold: "0.6"}
        |  - name: decontaminate
        |    type: transform
        |    transform_type: python
        |    function: graft.plugins.CurationTransforms$Decontaminate
        |    source: [v_neardup, v_benchmark]
        |    target: v_clean
        |    parameters: {ngram: "5"}
        |  - name: sample
        |    type: transform
        |    transform_type: python
        |    function: graft.plugins.CurationTransforms$HashSample
        |    source: v_clean
        |    target: v_sampled
        |    parameters: {fraction: "0.5"}
        |  - name: write
        |    type: write
        |    source: v_sampled
        |    write_target: {type: materialized_view, table: corpus_curated}
        |""".stripMargin

    runner.run(YamlConfig.parseFlowGroup(yaml))
    val out = store.read("corpus_curated")
    val ids = out.select("doc_id").as[Long].collect().toSet
    val total = 480L // docs 20..499

    // every stage strictly filters; the funnel must shrink at each gate
    assert(out.count() > 0 && out.count() < total)
    assert(ids.forall(_ >= 20)) // probes never leak into the corpus

    // determinism: a second full run lands the identical sample
    val (runner2, store2) = {
      val d2 = Files.createTempDirectory("curation2").toString
      val s2 = new TableStore(spark, s"$d2/wh")
      (new PipelineRunner(spark, s2, s"$d2/ckpt"), s2)
    }
    runner2.run(YamlConfig.parseFlowGroup(yaml))
    assert(store2.read("corpus_curated").select("doc_id").as[Long].collect().toSet == ids)
  }
}
