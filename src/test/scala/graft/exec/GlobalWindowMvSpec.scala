package graft.exec

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GlobalWindowMv

import graft.SparkSuite
import graft.config.YamlConfig
import graft.plan.Planner

/** `mode: incremental_recompute` with NO keys — global-window (leaderboard)
  * MV maintenance via range-bucket decomposition. Pins, beyond the q66
  * DuckDB gate: exactness of the two-run prefix merge against a one-shot
  * global window (ties, nulls, filter-above-window), physical byte-
  * stability of buckets sorting before the delta, the scan-pushed suffix
  * filter and bucket-parallel (never single-task) window in the plan, the
  * loud ends of the shape audit, and the meta codec. */
class GlobalWindowMvSpec extends SparkSuite {
  import spark.implicits._

  private def yamlFor(landing: String, mvSql: String,
      recompute: String = "{view: base, buckets: 4}"): String =
    s"""pipeline: gw
       |flowgroup: fg
       |actions:
       |  - name: l
       |    type: load
       |    source:
       |      type: cloudfiles
       |      path: $landing
       |      format: parquet
       |      readMode: stream
       |      table_schema: "id BIGINT, score DOUBLE"
       |    target: raw
       |  - name: w_base
       |    type: write
       |    source: raw
       |    write_target: {type: streaming_table, table: base}
       |  - name: mv
       |    type: write
       |    sql: >
       |      $mvSql
       |    write_target:
       |      type: materialized_view
       |      table: mv
       |      mode: incremental_recompute
       |      recompute: $recompute
       |""".stripMargin

  private def fresh(): (PipelineRunner, TableStore, String) = {
    val dir = Files.createTempDirectory("graft-gwmv").toString
    val store = new TableStore(spark, s"$dir/warehouse")
    (new PipelineRunner(spark, store, s"$dir/checkpoints"), store, dir)
  }

  private def writeRows(landing: String, rows: Seq[(Long, java.lang.Double)]): Unit =
    rows.toDF("id", "score").repartition(1).write.mode("append").parquet(landing)

  /** One-shot oracle: the same window SQL over the accumulated base. */
  private def oneShot(store: TableStore, sql: String): org.apache.spark.sql.DataFrame = {
    store.read("base").createOrReplaceTempView("base")
    spark.sql(sql)
  }

  private val rankSql =
    "SELECT id, score, CAST(rank() OVER (ORDER BY score DESC) AS INT) AS rnk, " +
      "CAST(dense_rank() OVER (ORDER BY score DESC) AS INT) AS drk FROM base"

  test("two-run global rank matches a one-shot window — ties and nulls included") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    // 400 rows, deliberate tie groups (score = id/4 → 4-way ties), 8 nulls
    writeRows(landing, (0L until 400L).map(i =>
      (i, if (i % 50 == 7) null else java.lang.Double.valueOf((i / 4).toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    // boundaries must have been derived and frozen (4 buckets → 3 cuts)
    val meta = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta)
    assert(meta.isDefined && meta.get.boundaries.nonEmpty, "boundaries not frozen")
    // delta interleaves: a new global top, mid-range ties, one more null
    writeRows(landing, Seq((1000L, 999.0), (1001L, 25.0), (1002L, null)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    val got = store.read("mv").select("id", "score", "rnk", "drk")
    val expected = oneShot(store, rankSql)
    assert(got.count() == 403)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "two-run global-window MV must equal the one-shot window over the base")
  }

  test("a bottom-of-the-order delta leaves higher buckets byte-stable") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 400L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    def files(bucket: Int): Map[Path, java.nio.file.attribute.FileTime] = {
      val p = Paths.get(s"$dir/warehouse/mv/__gw_bucket=$bucket")
      if (!Files.exists(p)) Map.empty
      else Files.list(p).iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(f => f -> Files.getLastModifiedTime(f)).toMap
    }
    val nCuts = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta).get.boundaries.size
    assert(nCuts >= 2, s"expected multiple buckets, got $nCuts cuts")
    val before = (0 until nCuts).map(files)
    // delta strictly below every existing score (DESC order → last bucket)
    writeRows(landing, Seq((2000L, -5.0), (2001L, -6.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    (0 until nCuts).foreach { b =>
      assert(files(b) == before(b),
        s"bucket $b sorts before the delta — its ranks are unchanged and " +
          "its partition must not be rewritten")
    }
    val got = store.read("mv").select("id", "score", "rnk", "drk")
    val expected = oneShot(store, rankSql)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("top-N idiom: a rank filter above the window maintains correctly") {
    val topSql = "SELECT * FROM (SELECT id, score, " +
      "CAST(rank() OVER (ORDER BY score DESC) AS INT) AS rnk FROM base) WHERE rnk <= 25"
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 300L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, topSql)))
    assert(store.read("mv").count() == 25)
    // new top scorers must ENTER and push old rows OUT of the top 25
    writeRows(landing, (0L until 10L).map(i => (3000L + i, java.lang.Double.valueOf(1000.0 + i))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, topSql)))
    val got = store.read("mv").select("id", "score", "rnk")
    val expected = oneShot(store, topSql)
    assert(got.count() == 25)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "rows ranked out of the top N must leave the MV")
  }

  test("tiny table: single-bucket fallback stays exact, re-buckets when grown") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, Seq((1L, 5.0), (2L, 3.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    // too small to bucket: no boundaries persisted, output still exact
    assert(store.getMeta("mv", "gwmeta").isEmpty)
    val got1 = store.read("mv").select("id", "score", "rnk", "drk")
    val exp1 = oneShot(store, rankSql)
    assert(got1.exceptAll(exp1).isEmpty && exp1.exceptAll(got1).isEmpty)
    // grow past the sampling floor → boundaries derive on the next refresh
    writeRows(landing, (10L until 400L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    assert(store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta)
      .exists(_.boundaries.nonEmpty))
    val got2 = store.read("mv").select("id", "score", "rnk", "drk")
    val exp2 = oneShot(store, rankSql)
    assert(got2.exceptAll(exp2).isEmpty && exp2.exceptAll(got2).isEmpty)
  }

  test("the rewritten plan is bucket-parallel with a scan-pushed suffix filter") {
    val dir = Files.createTempDirectory("graft-gwplan").toString
    (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "score")
      .write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").createOrReplaceTempView("gwplan_base")
    val probe = spark.sql(
      "SELECT id, score, rank() OVER (ORDER BY score DESC) AS rnk FROM gwplan_base")
    val shape = GlobalWindowMv.analyze(probe.queryExecution.analyzed)
      .toOption.get
    val blits = GlobalWindowMv.Boundaries(
      Seq("75.0", "50.0", "25.0"), org.apache.spark.sql.types.DoubleType)
    val df = GlobalWindowMv.rewrite(spark, probe.queryExecution.analyzed,
      shape, blits, Some(2),
      rowsBefore = Map(0 -> 0L, 1 -> 25L, 2 -> 50L, 3 -> 75L, 4 -> 100L),
      distinctBefore = Map.empty, totalRows = 100L)
    val physical = df.queryExecution.executedPlan.toString
    // the window partitions by the bucket — parallel per-bucket sorts,
    // never Spark's single-partition global-window plan
    assert(physical.contains("hashpartitioning(__gw_bucket"), physical)
    // the suffix restriction reaches the parquet scan as a plain
    // comparison on the order column (+ the nulls-last escape)
    assert(physical.contains("PushedFilters") &&
      physical.replaceAll("\\s+", " ").matches("(?s).*PushedFilters: \\[[^\\]]*score[^\\]]*\\].*"),
      physical)
    // and the result is the correct suffix of the leaderboard
    val out = df.collect()
    assert(out.forall(_.getInt(2) > 50), "only buckets >= 2 (rank > 50) emit")
    assert(out.length == 50)
  }

  test("computed key: the monotone pivot conjunct reaches the parquet scan") {
    // the r15 residue: a computed ORDER BY's suffix cut filtered on the
    // synthetic _w0 value, which stops at the Project — every refresh
    // re-scanned all row groups. The affine-plus-bounded-residual shape
    // (q67's floor(score)*3 + id%5) now derives a bare-pivot conjunct
    // that reaches PushedFilters, while staying exact.
    val dir = Files.createTempDirectory("graft-gwcompplan").toString
    (0L until 100L).map(i => (i, i.toDouble)).toDF("id", "score")
      .write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").createOrReplaceTempView("gwcomp_base")
    val probe = spark.sql(
      "SELECT id, score, rank() OVER (ORDER BY floor(score) * 3 + id % 5 DESC) AS rnk " +
        "FROM gwcomp_base")
    val shape = GlobalWindowMv.analyze(probe.queryExecution.analyzed).toOption.get
    assert(shape.orderExpr.isDefined, "computed key must carry orderExpr")
    // key(i) = 3i + i%5, unique per i; DESC boundaries in key space
    val bnds = Seq(225L, 150L, 75L)
    val key = (i: Long) => 3 * i + i % 5
    val bucketOf = (i: Long) => bnds.count(_ > key(i))
    val counts = (0L until 100L).groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    val offsets = (0 to 3).map(b =>
      b -> (0 until b).map(counts.getOrElse(_, 0L)).sum).toMap
    val blits = GlobalWindowMv.Boundaries(
      bnds.map(_.toString), org.apache.spark.sql.types.LongType)
    val df = GlobalWindowMv.rewrite(spark, probe.queryExecution.analyzed,
      shape, blits, Some(2), rowsBefore = offsets,
      distinctBefore = Map.empty, totalRows = 100L)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("hashpartitioning(__gw_bucket"), physical)
    // the derived conjunct on the BARE pivot column reaches the scan
    // (the plan string truncates long filter lists with an ellipsis, so
    // match up to the column name, not the closing bracket)
    assert(physical.replaceAll("\\s+", " ")
      .matches("(?s).*PushedFilters: \\[[^\\]]*score.*"), physical)
    // and the suffix stays exact: global rank = 1 + count-greater (keys
    // unique), emitted only for buckets >= 2
    val expected = (0L until 100L).filter(bucketOf(_) >= 2)
      .map(i => (i, 1 + (0L until 100L).count(j => key(j) > key(i)))).toMap
    val out = df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == expected,
      s"suffix mismatch: got ${out.toSeq.sorted.take(8)}… expected ${expected.toSeq.sorted.take(8)}…")
  }

  test("END-TO-END: a gate-path tail refresh pushes the pivot conjunct to the scan") {
    // The rewrite-level test above hand-feeds boundaries; this one drives
    // the FULL PipelineRunner refresh (the exact path the q67 CORRECTNESS
    // gate executes) and asserts the EXECUTED plan of the second run's
    // rewrite job carries (a) the bucket-parallel exchange and (b) a
    // PushedFilters entry on the BARE pivot column `score` — which only
    // the MonotoneCut conjunct can put there (the suffix cut itself
    // filters the synthetic _w0 and stops at the Project; the only other
    // base-column filter the route makes is the bucket filter on the
    // computed __gw_bucket, also unpushable). Engagement, not just
    // derivability.
    val compSql =
      "SELECT id, score, CAST(rank() OVER " +
        "(ORDER BY floor(score) * 3 + id % 5 DESC NULLS LAST) AS INT) AS rnk FROM base"
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 400L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, compSql)))
    val meta = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta)
    assert(meta.exists(_.boundaries.nonEmpty), "boundaries not frozen on run 1")
    // capture every executed plan of run 2 (the refresh)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit =
        scala.util.Try(plans.add(qe.executedPlan.toString)): Unit
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // bottom-of-the-DESC-order delta → suffix refresh of the last bucket
      writeRows(landing, Seq((2000L, -5.0), (2001L, -6.0)))
      runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, compSql)))
      // listener delivery is async — poll
      def hit: Option[String] = {
        import scala.jdk.CollectionConverters._
        plans.iterator().asScala.map(_.replaceAll("\\s+", " ")).find(p =>
          p.contains("hashpartitioning(__gw_bucket") &&
            p.matches("(?s).*PushedFilters: \\[[^\\]]*score.*"))
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (hit.isEmpty && System.nanoTime() < deadline) Thread.sleep(100)
      assert(hit.nonEmpty,
        "no executed refresh plan carried BOTH the bucket-parallel exchange " +
          "and a scan-pushed pivot conjunct; captured plans:\n" +
          plans.toArray.mkString("\n---\n").take(8000))
      // and the refresh stayed exact
      val got = store.read("mv").select("id", "score", "rnk")
      store.read("base").createOrReplaceTempView("base")
      val expected = spark.sql(compSql)
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        "pruned gate-path refresh diverged from the one-shot window")
    } finally spark.listenerManager.unregister(listener)
  }

  test("the full ranking family decomposes: percent_rank, cume_dist, ntile") {
    val famSql =
      "SELECT id, score, CAST(rank() OVER (ORDER BY score DESC) AS INT) AS rnk, " +
        "percent_rank() OVER (ORDER BY score DESC) AS prnk, " +
        "cume_dist() OVER (ORDER BY score DESC) AS cdist, " +
        "CAST(ntile(7) OVER (ORDER BY score DESC) AS INT) AS tile FROM base"
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    // unique scores → ntile deterministic; run 2's delta is BOTTOM-ONLY:
    // percent_rank/cume_dist/ntile depend on the global N, so even a
    // bottom delta changes EVERY row's value — the route must rewrite all
    // buckets (a suffix-only rewrite served run 1's stale N to the head
    // buckets, the exact bug the q66 gate caught)
    writeRows(landing, (0L until 350L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, famSql)))
    writeRows(landing, Seq((9000L, -1.0), (9001L, -2.0), (9002L, -3.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, famSql)))
    val got = store.read("mv").select("id", "score", "rnk", "prnk", "cdist", "tile")
    val expected = oneShot(store, famSql)
    assert(got.count() == 353)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "derived ranking functions must equal the one-shot window")
    // ties on a COMPUTED key: percent_rank/cume_dist stay deterministic
    // and exact through the computed-ORDER-BY route (vb has 9 distinct
    // values over 353 rows — heavy ties, and the subquery alias is the
    // shape the old plain-column refusal rejected)
    val tieSql = "SELECT id, vb, percent_rank() OVER (ORDER BY vb) AS prnk, " +
      "cume_dist() OVER (ORDER BY vb) AS cdist FROM " +
      "(SELECT id, CAST(score AS INT) % 9 AS vb FROM base)"
    writeRows(landing, Seq((9100L, 13.0))) // an edited sql refreshes with its next delta
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, tieSql)))
    val gotTie = store.read("mv").select("id", "vb", "prnk", "cdist")
    val expTie = oneShot(store, tieSql)
    assert(gotTie.exceptAll(expTie).isEmpty && expTie.exceptAll(gotTie).isEmpty,
      "computed-key ties must stay exact")
  }

  test("shape audit refuses non-decomposable sql, naming the construct") {
    val (runner, _, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, Seq((1L, 1.0)))
    def refusal(sql: String): String = intercept[Planner.PlanError](
      runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, sql)))).getMessage
    // PARTITION BY present → that's the keyed mode
    val m1 = refusal("SELECT id, score, rank() OVER (PARTITION BY id % 2 ORDER BY score) AS r FROM base")
    assert(m1.contains("ACT-011") && m1.contains("recompute.keys"), m1)
    // unsupported window function (running aggregate)
    val m2 = refusal("SELECT id, score, sum(score) OVER (ORDER BY score) AS r FROM base")
    assert(m2.contains("not prefix-decomposable") || m2.contains("sum"), m2)
    // (a non-literal ntile bucket count is refused by Spark's own
    // analyzer before the shape audit ever sees the plan)
    // computed keys are supported, but only deterministic row-local ones:
    // a nondeterministic key would re-route rows between refreshes
    val m3 = refusal(
      "SELECT id, score, rank() OVER (ORDER BY score * rand()) AS r FROM base")
    assert(m3.contains("nondeterministic"), m3)
    // ...and an aggregate-valued key has no per-delta-row evaluation
    val m3b = refusal("SELECT s, rank() OVER (ORDER BY s) AS r FROM " +
      "(SELECT sum(score) AS s FROM base GROUP BY id % 3)")
    assert(m3b.contains("aggregate"), m3b)
    // ...and current_date()-class keys are Catalyst-"deterministic" but
    // drift between refreshes — existing rows would re-route across the
    // frozen boundaries (the decayed-leaderboard trap)
    val m3c = refusal("SELECT id, rank() OVER (ORDER BY score * " +
      "datediff(current_date(), DATE'2024-01-01')) AS r FROM base")
    assert(m3c.contains("changes value between refreshes"), m3c)
    // aggregation above the window mixes buckets
    val m4 = refusal("SELECT max(r) AS mr FROM (SELECT rank() OVER (ORDER BY score) AS r FROM base)")
    assert(m4.contains("Aggregate") || m4.contains("no window function"), m4)
    // no window at all
    val m5 = refusal("SELECT id, score FROM base")
    assert(m5.contains("no window function"), m5)
    // delta must carry the order column
    val m6 = intercept[Planner.PlanError](runner.run(YamlConfig.parseFlowGroup(
      yamlFor(landing,
        "SELECT id, score, rank() OVER (ORDER BY score DESC) AS r FROM base",
        recompute = "{view: ids_only, buckets: 4}")
        .replace("  - name: w_base",
          """  - name: t_ids
            |    type: transform
            |    transform_type: sql
            |    source: raw
            |    target: ids_only
            |    sql: "SELECT id FROM raw"
            |  - name: w_base""".stripMargin)))).getMessage
    assert(m6.contains("score") && m6.contains("not in"), m6)
  }

  test("config: buckets bounds and keyed/global exclusivity refuse at parse") {
    def cfg(recompute: String): String =
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: mv
         |    type: write
         |    sql: "SELECT 1 AS x"
         |    write_target:
         |      type: materialized_view
         |      table: t
         |      mode: incremental_recompute
         |      recompute: $recompute
         |""".stripMargin
    val e1 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(cfg("{view: v, buckets: 1}")))
    assert(e1.msg.contains("[2, 4096]"))
    val e2 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(cfg("{view: v, buckets: nope}")))
    assert(e2.msg.contains("integer"))
    val e3 = intercept[YamlConfig.ConfigError](
      YamlConfig.parseFlowGroup(cfg("{keys: [k], view: v, buckets: 8}")))
    assert(e3.msg.contains("global-window"))
    // keys omitted entirely is VALID config (the global route)
    assert(YamlConfig.parseFlowGroup(cfg("{view: v}")).actions.nonEmpty)
  }

  test("gwmeta codec round-trips boundaries with hostile characters") {
    val m = GlobalWindowMv.Meta("STRING", "`s2` DESC NULLS LAST, x", true, 64,
      Seq("a,b\nc", "\"quoted\"", "=:x", ""),
      Map(0 -> 5L, 3 -> 7L), Map(-1 -> 1L),
      sampled = 4096, distinctValues = 37, topShare = 0.8125)
    val decoded = GlobalWindowMv.decodeMeta(GlobalWindowMv.encodeMeta(m))
    assert(decoded.contains(m))
    assert(GlobalWindowMv.decodeMeta("garbage").isEmpty)
    // a pre-r16 sidecar (no diagnostics keys) still decodes — zeros mean
    // "no recorded diagnostics", never a decode failure forcing a refresh
    val legacy = GlobalWindowMv.encodeMeta(m).linesIterator
      .filterNot(l => l.startsWith("sampled=") || l.startsWith("distinctvalues=")
        || l.startsWith("topshare=")).mkString("\n")
    val dLegacy = GlobalWindowMv.decodeMeta(legacy)
    assert(dLegacy.contains(m.copy(sampled = 0, distinctValues = 0, topShare = 0.0)),
      dLegacy.toString)
  }

  test("computed ORDER BY key: two-run maintenance stays exact, expression edits invalidate") {
    // real leaderboards rank by expressions (score * decay, weighted sums);
    // the route materializes nothing extra — it buckets on the in-plan
    // synthetic column and re-evaluates the expression on the delta's own
    // columns to locate touched buckets
    val compSql =
      "SELECT id, score, CAST(rank() OVER (ORDER BY score * 2 + id % 7 DESC) AS INT) AS rnk, " +
        "CAST(dense_rank() OVER (ORDER BY score * 2 + id % 7 DESC) AS INT) AS drk FROM base"
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 400L).map(i =>
      (i, java.lang.Double.valueOf((i / 4).toDouble)))) // 4-way ties pre-expression
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, compSql)))
    val meta1 = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta).get
    assert(meta1.boundaries.nonEmpty, "computed-key boundaries not frozen")
    // the signature must carry the EXPRESSION, not the synthetic _w0 name
    assert(meta1.orderSig.toLowerCase.contains("score"), meta1.orderSig)
    // delta interleaves mid-range + a new top
    writeRows(landing, Seq((1000L, 500.0), (1001L, 25.0), (1002L, 3.0)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, compSql)))
    val got = store.read("mv").select("id", "score", "rnk", "drk")
    val expected = oneShot(store, compSql)
    assert(got.count() == 403)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "computed-key two-run MV must equal the one-shot window")
    // editing the expression (same synthetic name _w0) must invalidate:
    // a name-keyed signature would silently reuse stale buckets/counts
    val editedSql = compSql.replace("score * 2 + id % 7", "score * 3 + id % 5")
    writeRows(landing, Seq((2000L, 7.5)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, editedSql)))
    val meta2 = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta).get
    assert(meta2.orderSig != meta1.orderSig,
      "the signature must track the inlined expression, not the _w0 token")
    val got2 = store.read("mv").select("id", "score", "rnk", "drk")
    val exp2 = oneShot(store, editedSql)
    assert(got2.exceptAll(exp2).isEmpty && exp2.exceptAll(got2).isEmpty)
  }

  test("tie-skew advisory fires when boundaries collapse; re-bootstrap drops stale bucket dirs") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    // bootstrap on a high-cardinality key: many cut points, many dirs
    writeRows(landing, (0L until 400L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql,
      recompute = "{view: base, buckets: 8}")))
    val cuts1 = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta).get.boundaries.size
    assert(cuts1 >= 4, s"expected a wide bucket range, got $cuts1 cuts")
    // switch to a 90%-one-value computed key: ties must share a bucket, so
    // the re-sampled boundaries collapse — the advisory must fire, the old
    // high-numbered partitions must be dropped (not stranded), and the
    // output must still be exact (degraded, never wrong)
    val skewSql = "SELECT id, vb, CAST(rank() OVER (ORDER BY vb) AS INT) AS rnk FROM " +
      "(SELECT id, CASE WHEN id % 10 < 9 THEN 0 ELSE CAST(id AS INT) END AS vb FROM base)"
    val warnings = scala.collection.mutable.ArrayBuffer[String]()
    graft.Log.route(m => warnings.synchronized { warnings += m: Unit })
    try {
      writeRows(landing, Seq((9000L, 1.0)))
      runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, skewSql,
        recompute = "{view: base, buckets: 8}")))
    } finally graft.Log.route(graft.Log.stderrAndSlf4j)
    assert(warnings.exists(w => w.contains("heavy ties") && w.contains("tie-break")),
      s"expected the tie-skew advisory, got: $warnings")
    // the advisory's evidence PERSISTS: the re-bootstrapped sidecar
    // carries the tie diagnostics, so an operator diagnosing the slow MV
    // a week later reads WHY the buckets collapsed instead of needing the
    // long-scrolled log line
    val skewMeta = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta).get
    assert(skewMeta.sampled > 0, "tie-collapsed bootstrap recorded no sample size")
    assert(skewMeta.distinctValues > 0 &&
      skewMeta.distinctValues < skewMeta.sampled / 2,
      s"expected few distinct values in the sidecar, got ${skewMeta.distinctValues}/${skewMeta.sampled}")
    assert(skewMeta.topShare > 0.5,
      s"the 90%-one-value key must record a dominant tie group, got ${skewMeta.topShare}")
    assert(skewMeta.effectiveBuckets < skewMeta.declaredBuckets / 2,
      s"effectiveBuckets ${skewMeta.effectiveBuckets} vs declared ${skewMeta.declaredBuckets}")
    // no partition dir above the new (collapsed) range may survive
    val newHi = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta)
      .map(_.boundaries.size + 1).getOrElse(1)
    val dirs = Option(new java.io.File(s"$dir/warehouse/mv").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("__gw_bucket="))
      .map(_.getName.stripPrefix("__gw_bucket=").toInt)
    assert(dirs.forall(_ <= newHi),
      s"stale bucket dirs survived the re-bootstrap: ${dirs.sorted.mkString(",")} (new hi $newHi)")
    val got = store.read("mv").select("id", "vb", "rnk")
    val expected = oneShot(store, skewSql)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "collapsed boundaries must degrade throughput, never correctness")
  }

  test("GwBucketSearch equals the comparison-chain definition across types and directions") {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(7)
    def chain(v: org.apache.spark.sql.Column, bs: Seq[org.apache.spark.sql.Column],
        asc: Boolean): org.apache.spark.sql.Column =
      bs.map(b => when(if (asc) v > b else v < b, 1).otherwise(0)).reduce(_ + _)
    def check[T](dt: DataType, gen: () => T): Unit = {
      val vals = Seq.fill(200)(gen()).distinct
      Seq(true, false).foreach { asc =>
        val cutsRaw = Seq.fill(17)(gen()).distinct
        val b = GlobalWindowMv.Boundaries(cutsRaw.map {
          case ts: java.sql.Timestamp => (ts.getTime * 1000L).toString
          case x => String.valueOf(x)
        }, dt)
        val sortedVals = {
          val ord = org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(dt)
          val s = b.values.sorted(ord.asInstanceOf[Ordering[Any]])
          if (asc) s else s.reverse
        }
        val sb = GlobalWindowMv.Boundaries(
          // re-serialize in direction order through the same repr rules
          sortedVals.map {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case x => String.valueOf(x)
          }, dt)
        val df = spark.createDataFrame(
          vals.map(v => org.apache.spark.sql.Row(v)).asJava,
          StructType(Seq(StructField("v", dt))))
        val cutCols = GlobalWindowMv.boundaryLiterals(sb.reprs, dt)
        val out = df.select(
          GlobalWindowMv.bucketColumn(col("v"), sb, asc, -999).as("bin"),
          chain(col("v"), cutCols, asc).as("ref")).collect()
        out.foreach(r => assert(r.getInt(0) == r.getInt(1),
          s"dt=$dt asc=$asc: binary search ${r.getInt(0)} != chain ${r.getInt(1)}"))
      }
    }
    check(IntegerType, () => rnd.nextInt(1000))
    check(LongType, () => rnd.nextLong() % 10000L)
    check(DoubleType, () => math.floor(rnd.nextDouble() * 500) / 8)
    check(StringType, () => rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
    check(BooleanType, () => rnd.nextBoolean())
    check(TimestampType, () =>
      new java.sql.Timestamp(1500000000000L + rnd.nextInt(1000000).toLong * 1000))
  }

  test("layout advisory: fires on an unclustered base, silent on a clustered one") {
    // the r18 probe's committed numbers: a MonotoneCut conjunct prunes to
    // ~7.7% on a pivot-range-clustered base and 0% on a hash-shuffled one
    // (PROBE_r18.json, both scales) — the advisory is the bootstrap-time
    // bridge from that measurement to the operator who can fix the layout
    val dir = Files.createTempDirectory("gw-layout").toString
    val rows = (0L until 4000L).map(i => (i, (i % 997).toDouble * 0.5))
      .toDF("id", "score")
    val compSql = "SELECT id, score, CAST(rank() OVER (ORDER BY " +
      "score * 2 + id % 7 DESC NULLS LAST) AS INT) AS rnk FROM gwlay_base"
    def adviceFor(layout: String): Option[String] = {
      val d = s"$dir/$layout"
      (if (layout == "clustered")
        rows.repartitionByRange(8, col("score")).sortWithinPartitions("score")
      else rows.repartition(8))
        .write.mode("overwrite").parquet(d)
      spark.read.parquet(d).createOrReplaceTempView("gwlay_base")
      val plan = spark.sql(compSql).queryExecution.analyzed
      val shape = GlobalWindowMv.analyze(plan).toOption.get
      val childDf = org.apache.spark.sql.graftnative.PlanBridge
        .ofRows(spark, shape.windowNode.child)
      val bs = GlobalWindowMv.sampleBoundaries(childDf, shape, 8)
      val bnds = GlobalWindowMv.Boundaries(bs.boundaries, shape.orderAttr.dataType)
      GlobalWindowMv.layoutAdvisory(spark, shape, bnds, sampleFraction = 0.5)
    }
    val unclustered = adviceFor("unclustered")
    assert(unclustered.isDefined, "hash-shuffled base must draw the advisory")
    assert(unclustered.get.contains("'score'") &&
      unclustered.get.contains("cluster_columns"),
      s"advisory must name the pivot and the fix: ${unclustered.get}")
    assert(adviceFor("clustered").isEmpty,
      "a range-clustered base must stay silent")
    // and through the PIPELINE surface: an unclustered landing bootstraps
    // the MV with the advisory on the runner's warning channel
    val (runner, store, pdir) = fresh()
    val landing = s"$pdir/landing"
    // two landing files, each spanning the whole score domain
    writeRows(landing, (0L until 300L).map(i => (i, java.lang.Double.valueOf((i % 97).toDouble))))
    writeRows(landing, (300L until 600L).map(i => (i, java.lang.Double.valueOf((i % 89).toDouble))))
    val mvSql = "SELECT id, score, CAST(rank() OVER (ORDER BY " +
      "score * 2 + id % 7 DESC NULLS LAST) AS INT) AS rnk FROM base"
    val warnings = scala.collection.mutable.ArrayBuffer[String]()
    graft.Log.route(m => warnings.synchronized { warnings += m: Unit })
    try runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, mvSql)))
    finally graft.Log.route(graft.Log.stderrAndSlf4j)
    assert(warnings.exists(w => w.contains("not clustered") &&
      w.contains("'score'") && w.contains("mv")),
      s"pipeline bootstrap over an unclustered base must advise; got: $warnings")
    // advisory is bootstrap-only: an incremental refresh stays silent
    val warnings2 = scala.collection.mutable.ArrayBuffer[String]()
    writeRows(landing, Seq((9000L, 1.0)))
    graft.Log.route(m => warnings2.synchronized { warnings2 += m: Unit })
    try runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, mvSql)))
    finally graft.Log.route(graft.Log.stderrAndSlf4j)
    assert(!warnings2.exists(_.contains("not clustered")),
      s"incremental refreshes must not re-probe the layout; got: $warnings2")
  }

  test("gapped prefix offsets refuse loudly — never rank with silent zero offsets") {
    // offsetOf's coalesce-to-0 exists for ABOVE-hi indices; an IN-RANGE
    // gap would read the same NULL and silently rank that bucket from
    // offset 0. prefixOffsets is gap-free by construction, so a gap means
    // a caller bypassed it — the rewrite must refuse by name (r17 verdict
    // review target: try_element_at boundary behavior)
    val dir = Files.createTempDirectory("gw-gap").toString
    (0L until 1000L).map(i => (i, i.toDouble)).toDF("id", "score")
      .write.parquet(s"$dir/base")
    spark.read.parquet(s"$dir/base").createOrReplaceTempView("gwgap_base")
    val plan = spark.sql("SELECT id, score, CAST(rank() OVER (ORDER BY " +
      "score DESC NULLS LAST) AS INT) AS rnk FROM gwgap_base")
      .queryExecution.analyzed
    val shape = GlobalWindowMv.analyze(plan).toOption.get
    val childDf = org.apache.spark.sql.graftnative.PlanBridge
      .ofRows(spark, shape.windowNode.child)
    val bs = GlobalWindowMv.sampleBoundaries(childDf, shape, 8)
    val bnds = GlobalWindowMv.Boundaries(bs.boundaries, shape.orderAttr.dataType)
    val lo = shape.minBucketId
    val hi = shape.maxBucketId(bnds.size)
    val counts = GlobalWindowMv.summarize(spark, shape, bnds, None)
    val good = GlobalWindowMv.prefixOffsets(lo, hi, counts.view.mapValues(_._1).toMap)
    val gapped = good - (lo + 1) // a hole strictly inside [lo, hi]
    val e = intercept[IllegalArgumentException] {
      GlobalWindowMv.rewrite(spark, plan, shape, bnds, None, gapped,
        Map.empty, totalRows = counts.values.map(_._1).sum)
    }
    assert(e.getMessage.contains("gap") && e.getMessage.contains((lo + 1).toString),
      e.getMessage)
    // and the gap-free map still rewrites fine
    assert(GlobalWindowMv.rewrite(spark, plan, shape, bnds, None, good,
      Map.empty, totalRows = counts.values.map(_._1).sum).count() == 1000)
  }

  test("an edited ORDER BY spec invalidates the frozen state — re-bootstrap, never stale ranks") {
    val (runner, store, dir) = fresh()
    val landing = s"$dir/landing"
    writeRows(landing, (0L until 400L).map(i => (i, java.lang.Double.valueOf(i.toDouble))))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, rankSql)))
    val sig1 = store.getMeta("mv", "gwmeta")
      .flatMap(GlobalWindowMv.decodeMeta).get.orderSig
    // flip the direction: bucket routing reverses, counts are stale —
    // the refresh must re-derive, and the output must match a one-shot
    val ascSql =
      "SELECT id, score, CAST(rank() OVER (ORDER BY score ASC) AS INT) AS rnk, " +
        "CAST(dense_rank() OVER (ORDER BY score ASC) AS INT) AS drk FROM base"
    writeRows(landing, Seq((9000L, 4.5)))
    runner.run(YamlConfig.parseFlowGroup(yamlFor(landing, ascSql)))
    val meta2 = store.getMeta("mv", "gwmeta").flatMap(GlobalWindowMv.decodeMeta).get
    assert(meta2.orderSig != sig1, "order signature must track the spec")
    val got = store.read("mv").select("id", "score", "rnk", "drk")
    val expected = oneShot(store, ascSql)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "a changed ORDER BY must re-bootstrap, not reuse stale buckets/counts")
  }
}
