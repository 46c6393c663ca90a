package graft

import org.apache.spark.sql.functions._

/** The bench must not be able to lie: a query that throws is recorded in the
  * errors map (and `main` exits non-zero on any), never reported as a fast
  * timing with exit 0 (round-3 verdict "What's wrong #3"). */
class BenchSpec extends SparkSuite {

  test("a broken query surfaces in errors and the JSON line") {
    val queries = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "ok" -> ((s, _) => s.range(10).toDF()),
      "broken" -> ((s, _) => s.range(10).select(col("no_such_column"))))
    val r = Bench.run(spark, sf0001, iters = 1, queries = queries)
    assert(r.errors.keySet == Set("broken"))
    assert(r.json.contains(""""errors":{"broken":"""))
    assert(r.json.contains(""""ok":"""))
  }

  test("timing action materializes every output column — no count-pruning") {
    // raise_error only fires if the column is EVALUATED; under the old
    // count() action Catalyst pruned unused columns, so a query's real work
    // (or here, its bomb) never ran and the timing measured a bare scan
    val r = Bench.run(spark, sf0001, iters = 1, queries = Map(
      "bomb" -> ((s, _) => s.range(3).toDF()
        .select(raise_error(lit("must be evaluated")).as("x")))))
    assert(r.errors.keySet == Set("bomb"),
      "output columns were pruned away instead of materialized")
  }

  test("an all-green run has no errors") {
    val r = Bench.run(spark, sf0001, iters = 1,
      queries = Map("ok" -> ((s, _) => s.range(3).toDF())))
    assert(r.errors.isEmpty)
    assert(r.json.contains(""""errors":{}"""))
  }

  test("compact line: centisecond medians, short sf, errors only when present") {
    val r = Bench.run(spark, sf0001, iters = 1,
      queries = Map("ok" -> ((s, _) => s.range(3).toDF())))
    assert(r.compact.matches(
      """\{"metric":"total","value":\d+\.\d\d,"unit":"sec","plan_cost":\d+\.\d\d,"unstable":\d+,"queries":\{"ok":\d+\.\d\d\},"sf":"sf0\.001"\}"""),
      r.compact)
    // error NAMES only in the compact line — a 300-char message per failed
    // query would blow the tail budget the line exists to fit
    val broken = Bench.run(spark, sf0001, iters = 1, queries = Map(
      "ok" -> ((s, _) => s.range(3).toDF()),
      "broken" -> ((s, _) => s.range(3).select(col("no_such_column")))))
    assert(broken.compact.contains(""""errors":["broken"]"""), broken.compact)
  }

  test("plan_cost = total minus the gate scaffolding the queries recorded") {
    val r = Bench.run(spark, sf0001, iters = 1, queries = Map(
      "gate" -> ((s, _) => {
        Thread.sleep(400) // the forged child-JVM wall clock...
        graft.tools.GateLifecycle.add(0.4) // ...recorded as scaffolding
        s.range(3).toDF()
      }),
      "plain" -> ((s, _) => s.range(3).toDF())))
    val total = """"value":(\d+\.?\d*)""".r.findFirstMatchIn(r.json).get.group(1).toDouble
    val pc = """"plan_cost":(\d+\.?\d*)""".r.findFirstMatchIn(r.json).get.group(1).toDouble
    assert(math.abs((total - pc) - 0.4) < 0.02,
      s"plan_cost must subtract exactly the recorded scaffolding: total=$total plan_cost=$pc")
    // attribution rides in the full line only (tail budget), keyed by query
    assert(r.json.contains(""""gate_lifecycle":{"gate":0.4"""), r.json)
    assert(r.compact.contains(""""plan_cost":"""), r.compact)
    // a recorder claiming MORE than the measured time caps at it — the
    // contract line can never carry a negative plan cost
    val capped = Bench.run(spark, sf0001, iters = 1, queries = Map(
      "over" -> ((s, _) => { graft.tools.GateLifecycle.add(99.0); s.range(3).toDF() })))
    val pc2 = """"plan_cost":(-?\d+\.?\d*)""".r.findFirstMatchIn(capped.json).get.group(1).toDouble
    assert(pc2 >= 0.0, capped.json)
  }

  test("unstable medians are flagged mechanically: names in full JSON, count in compact") {
    // r15's adjudication problem: untouched gates spread 4–17× across
    // iterations (c6 14.5/3.6/0.85 s) and classifying them took a manual
    // 9-iter A/B. The artifact now flags rel-spread > 1.0 (above a 0.2 s
    // median floor) itself.
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val r = Bench.run(spark, sf0001, iters = 3, queries = Map(
      "flappy" -> ((s, _) => {
        // first iteration 4× slower than the rest — an environmental mover
        Thread.sleep(if (calls.getAndIncrement() == 0) 1200 else 280)
        s.range(3).toDF()
      }),
      "steady" -> ((s, _) => s.range(3).toDF())))
    assert(r.json.contains(""""unstable":["flappy"]"""), r.json.take(400))
    assert("\"spread\":\\{[^}]*\"flappy\":\\d".r.findFirstIn(r.json).isDefined,
      r.json.take(400))
    assert(r.compact.contains(""""unstable":1,"""), r.compact)
    // sub-noise-floor queries never flag, however large their rel spread
    val fast = Bench.run(spark, sf0001, iters = 3, queries = Map(
      "tiny" -> ((s, _) => s.range(3).toDF())))
    assert(fast.json.contains(""""unstable":[]"""), fast.json.take(200))
  }

  test("compact line for the FULL suite fits the driver's ~2 KB tail capture") {
    // The whole point of the compact line is surviving truncation whole.
    // r10 proved the window in practice: the tail capture is 2048 bytes and
    // sbt's trailing "[success] Total time: …" line eats ~80 of them, so the
    // usable budget is ~1950 — and the r10 line (full names, 83 queries,
    // ~2.1 KB) was clipped mid-key while the old projection here still
    // passed (it budgeted 1950 but under-counted the frame + per-query
    // bytes). The line now uses short prefix keys; project its size from
    // the SAME construction run() uses — short key + ":" + up-to-5-char
    // value + comma — and demand ≤1600 so ~40 more queries fit before this
    // trips again.
    val perQuery = SparkEntry.queries.keys
      .map(_.takeWhile(_ != '_').length + 10).sum
    val projected = perQuery + 140 // frame: metric/value/unit/plan_cost/unstable/queries/sf
    assert(projected < 1600,
      s"compact bench line projected at $projected bytes — over the " +
        "tail-capture budget; shorten new query prefixes")
  }

  test("writeFull persists the full JSON line to a file, creating parents") {
    // the full per-iteration JSON lives in a committed repo file, not
    // stdout: 11 rounds of driver-side `parsed: null` showed the ~2 KB
    // stdout tail can't be the contract, and the clipped remainder of a
    // stdout full-line would precede (and break a first-brace parse of)
    // the compact line
    val dir = java.nio.file.Files.createTempDirectory("bench-full")
    val path = dir.resolve("nested").resolve("bench_full.json")
    val r = Bench.run(spark, sf0001, iters = 1,
      queries = Map("ok" -> ((s, _) => s.range(3).toDF())))
    Bench.writeFull(path, r.json)
    val back = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(back.trim == r.json)
    // the file content parses standalone (same shape the driver reads)
    assert(back.contains(""""queries_all":"""))
  }

  test("diag gauges ride in the full JSON, one row per timed execution") {
    // attribution data for in-bench dispersion outliers (r12 verdict #1):
    // every execution carries GC/heap/state-store/codegen gauges in the
    // durable artifact — an outlier is attributable post-hoc without a
    // reproduction run. Never in the compact stdout line (tail budget).
    val r = Bench.run(spark, sf0001, iters = 2,
      queries = Map("ok" -> ((s, _) => s.range(3).toDF())))
    assert(r.json.contains(""""diag":[{"q":"ok","it":1,"""), r.json)
    assert(r.json.contains(""""it":2"""), r.json)
    assert(r.json.contains(""""gcMsD":"""), r.json)
    assert(r.json.contains(""""heapMB":"""), r.json)
    assert(!r.compact.contains("diag"), r.compact)
    // the gauges must carry real readings, not the -1 Try-degradation —
    // pin the reflective/metric readers against the running Spark version
    // (a Spark-internal rename must surface HERE, not as silently-dead
    // gauges in a round artifact)
    val s = graft.tools.BenchDiag.snap()
    assert(s.stateProviders >= 0,
      "StateStore.loadedProviders reflective read degraded")
    assert(s.janinoClasses >= 0, "CodegenMetrics reader degraded")
    assert(s.gcCount > 0 && s.heapUsedMb > 0, s.toString)
  }

  test("short prefix keys are unique across the full suite") {
    // the compact line keys each query by its prefix before the first '_';
    // a collision would silently merge two queries' timings
    val keys = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val dups = keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"colliding bench prefixes: ${dups.mkString(", ")}")
    // and run() itself refuses to emit a colliding line
    val ex = intercept[IllegalArgumentException] {
      Bench.run(spark, sf0001, iters = 1, queries = Map(
        "x1_a" -> ((s, _) => s.range(1).toDF()),
        "x1_b" -> ((s, _) => s.range(1).toDF())))
    }
    assert(ex.getMessage.contains("x1"), ex.getMessage)
  }
}
