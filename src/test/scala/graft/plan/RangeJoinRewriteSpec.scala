package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The opt-in range-join optimizer rewrite: an inequality-only join that
  * Spark plans as BroadcastNestedLoopJoin becomes a bucketed equi-join with
  * an exact residual filter — identical results, hash-partitionable plan.
  * Injected here through `spark.experimental.extraOptimizations` (the same
  * Rule[LogicalPlan] GraftExtensions wires via injectOptimizerRule). */
class RangeJoinRewriteSpec extends SparkSuite {
  import spark.implicits._

  test("inequality join rewrites to a bucketed equi-join with identical results") {
    val r = RangeJoinRewrite()
    // long-typed ranges: the rule's supported domain (float/double are
    // deliberately excluded — NaN sorts above everything in the original
    // join but has no enumerable bucket)
    val points = (0 until 300).map(i => (i.toLong, (i * 7 % 997).toLong))
      .toDF("pid", "t")
    val intervals = (0 until 100).map { i =>
      val s = (i * 13 % 900).toLong
      (i.toLong, s, s + (i % 50))
    }.toDF("iid", "s", "e")
    val joined = points.join(intervals, $"t" >= $"s" && $"t" <= $"e")
    val expected = joined.select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(expected.nonEmpty)
    // without the conf the rule is dormant — nested loop stays
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ r
    try {
      spark.conf.unset(r.WidthKey)
      val dormant = joined.queryExecution.executedPlan.toString
      assert(dormant.contains("BroadcastNestedLoopJoin") ||
        dormant.contains("CartesianProduct"), dormant)
      // with the conf: no nested loop, and a duplicate-sensitive result match
      spark.conf.set(r.WidthKey, "25.0")
      val joined2 = points.join(intervals, $"t" >= $"s" && $"t" <= $"e")
      val plan = joined2.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "rewrite did not engage:\n" + plan)
      assert(plan.contains("Generate"), plan)
      val got = joined2.select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expected)
      // reversed intervals and null bounds behave exactly like the original
      val weird = Seq((1L, Some(10L), Some(5L)), (2L, None, Some(50L)))
        .toDF("iid", "s", "e")
      val wGot = points.join(weird, $"t" >= $"s" && $"t" <= $"e").count()
      assert(wGot == 0)
      // double-typed ranges stay on the nested-loop plan (NaN exclusion)
      val dp = Seq((1L, 5.0)).toDF("pid", "t")
      val di = Seq((9L, 0.0, 10.0)).toDF("iid", "s", "e")
      val dj = dp.join(di, $"t" >= $"s" && $"t" <= $"e")
      assert(!dj.queryExecution.executedPlan.toString.contains("Generate"))
      assert(dj.count() == 1)
      // a join that ALREADY has an equi key is left alone (hash join today)
      val keyedL = Seq((1L, 1L, 5L)).toDF("pid", "k", "t")
      val keyedR = Seq((1L, 1L, 0L, 10L)).toDF("iid", "k2", "s", "e")
      val keyed = keyedL.join(keyedR,
        $"k" === $"k2" && $"t" >= $"s" && $"t" <= $"e")
      assert(keyed.count() == 1)
      assert(!keyed.queryExecution.executedPlan.toString.contains("Generate"))
      // timestamps bucket via their epoch-second double cast
      val tp = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
        .toDF("pid", "ts")
      val ti = Seq((9L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))).toDF("iid", "ts_s", "ts_e")
      val tj = tp.join(ti, $"ts" >= $"ts_s" && $"ts" <= $"ts_e")
      assert(tj.count() == 1)
      assert(!tj.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.conf.unset(r.WidthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
  }

  test("null-safe equi key (<=>) counts as an equi-predicate — no rewrite") {
    val r = RangeJoinRewrite()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ r
    try {
      spark.conf.set(r.WidthKey, "25.0")
      // Spark plans <=> as a hash join already; the rewrite would only add
      // the explode fan-out on top
      val keyedL = Seq((1L, Option(1L), 5L)).toDF("pid", "k", "t")
      val keyedR = Seq((9L, Option(1L), 0L, 10L)).toDF("iid", "k2", "s", "e")
      val keyed = keyedL.join(keyedR,
        $"k" <=> $"k2" && $"t" >= $"s" && $"t" <= $"e")
      assert(!keyed.queryExecution.executedPlan.toString.contains("Generate"),
        keyed.queryExecution.executedPlan.toString)
      assert(keyed.count() == 1)
    } finally {
      spark.conf.unset(r.WidthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
  }

  test("outer joins rewrite when the point side is preserved — SCD2 temporal shape") {
    val r = RangeJoinRewrite()
    val points = (0 until 200).map(i => (i.toLong, (i * 7 % 997).toLong))
      .toDF("pid", "t")
    // sparse intervals: many points match nothing → null-extension matters
    val intervals = (0 until 20).map { i =>
      val s = (i * 83 % 900).toLong
      (i.toLong, s, s + 10)
    }.toDF("iid", "s", "e")
    val leftJoined = points.join(intervals, $"t" >= $"s" && $"t" <= $"e", "left")
    val expected = leftJoined.select($"pid", $"iid")
      .as[(Long, Option[Long])].collect().toSeq.sorted
    assert(expected.exists(_._2.isEmpty), "fixture must have unmatched points")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ r
    try {
      spark.conf.set(r.WidthKey, "25.0")
      // LEFT OUTER, point preserved (left): rewrites, identical results
      // including exactly-once null-extension
      val lj = points.join(intervals, $"t" >= $"s" && $"t" <= $"e", "left")
      val lPlan = lj.queryExecution.executedPlan.toString
      assert(!lPlan.contains("BroadcastNestedLoopJoin") && lPlan.contains("Generate"),
        lPlan)
      val got = lj.select($"pid", $"iid").as[(Long, Option[Long])].collect().toSeq.sorted
      assert(got == expected)
      // RIGHT OUTER, point preserved (right): same rewrite, mirrored
      val rj = intervals.join(points, $"t" >= $"s" && $"t" <= $"e", "right")
      val rPlan = rj.queryExecution.executedPlan.toString
      assert(!rPlan.contains("BroadcastNestedLoopJoin") && rPlan.contains("Generate"),
        rPlan)
      val rGot = rj.select($"pid", $"iid").as[(Long, Option[Long])].collect().toSeq.sorted
      assert(rGot == expected)
      // LEFT OUTER with the INTERVAL side preserved: NOT rewritten (the
      // exploded preserved row would null-extend once per bucket copy) —
      // stays on the nested-loop plan, results untouched
      val ij = intervals.join(points, $"t" >= $"s" && $"t" <= $"e", "left")
      assert(!ij.queryExecution.executedPlan.toString.contains("Generate"),
        ij.queryExecution.executedPlan.toString)
      assert(ij.count() >= intervals.count())
      // STRICT bounds (the acmi `>= start AND < end` shape) rewrite too,
      // with the residual keeping the original strictness: a point exactly
      // at an interval's end must NOT match
      val strictExp = points.join(intervals, $"t" >= $"s" && $"t" < $"e", "left")
        .select($"pid", $"iid")
      spark.conf.unset(r.WidthKey)
      val strictWant = strictExp.as[(Long, Option[Long])].collect().toSeq.sorted
      spark.conf.set(r.WidthKey, "25.0")
      val sj = points.join(intervals, $"t" >= $"s" && $"t" < $"e", "left")
      assert(sj.queryExecution.executedPlan.toString.contains("Generate"),
        sj.queryExecution.executedPlan.toString)
      val sGot = sj.select($"pid", $"iid").as[(Long, Option[Long])].collect().toSeq.sorted
      assert(sGot == strictWant)
      // the NULL-OPEN upper bound (SCD2 current rows) is out of scope —
      // the Or disjunct is not a range bound, so the join is left alone;
      // the documented sentinel workaround (coalesce) opts it in
      val openIv = Seq((1L, 5L, Option.empty[Long]), (2L, 0L, Some(3L)))
        .toDF("iid", "s", "e")
      val oj = points.join(openIv, $"t" >= $"s" && ($"t" < $"e" || $"e".isNull))
      assert(!oj.queryExecution.executedPlan.toString.contains("Generate"))
      // sentinel = just past the point domain's max (997), NOT Long.Max —
      // the interval explodes over (sentinel - s) / width buckets
      val cj = points.join(openIv,
        $"t" >= $"s" && $"t" < coalesce($"e", lit(1000L)))
      assert(cj.queryExecution.executedPlan.toString.contains("Generate"),
        cj.queryExecution.executedPlan.toString)
      assert(cj.count() == oj.count())
    } finally {
      spark.conf.unset(r.WidthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
  }

  test("a literal equality is NOT an equi key — the rewrite still fires") {
    val r = RangeJoinRewrite()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ r
    try {
      spark.conf.set(r.WidthKey, "25.0")
      // region = 'EU' has an empty reference set on one side — Spark can't
      // hash-join on it, so counting it as an equi key suppressed the
      // rewrite while the join stayed the nested loop the rule exists to fix
      val points = (0 until 200).map(i => (i.toLong, (i * 7 % 997).toLong, "EU"))
        .toDF("pid", "t", "region")
      val intervals = (0 until 50).map { i =>
        val st = (i * 13 % 900).toLong
        (i.toLong, st, st + (i % 50))
      }.toDF("iid", "s", "e")
      val joined = points.join(intervals,
        $"t" >= $"s" && $"t" <= $"e" && $"region" === "EU")
      assert(joined.queryExecution.executedPlan.toString.contains("Generate"),
        joined.queryExecution.executedPlan.toString)
      // results identical to the brute-force inequality join
      val brute = points.filter($"region" === "EU").as("p")
        .crossJoin(intervals.as("i"))
        .filter($"t" >= $"s" && $"t" <= $"e")
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val got = joined.select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == brute && got.nonEmpty)
    } finally {
      spark.conf.unset(r.WidthKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq r)
    }
  }
}
