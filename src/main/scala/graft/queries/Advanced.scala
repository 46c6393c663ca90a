package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin, TimeSeries}
import graft.sources.Tables

/** Round-5 operator surface: as-of join, bucketed range join, pivot /
  * unpivot reshaping, and the HLL sketch self-check — the "operators Spark
  * lacks" tier of the builder brief, each expressed through the scale-safe
  * custom operator (no nested-loop joins anywhere).
  *
  * ORACLE-AUTHORING RULE: every DuckDB aggregate output carries an explicit
  * CAST (SUM over integers yields HUGEINT → arrow decimal128 → driver hash
  * mismatch even when values agree; cost rounds 2 and 3). Computed doubles
  * aggregate through DECIMAL then cast once to DOUBLE, or summation order
  * diverges in the last ulp. */
object Advanced {

  /** As-of join via the union+window operator: for each click, the most
    * recent error by the same user at or before it (no join in the plan —
    * one shuffle, no row explosion; see [[AsOfJoin]]). */
  def j1AsOf(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("event_id").as("err_event_id"), col("ts").as("err_ts"))
    AsOfJoin(clicks, errors, on = Seq("user_id"), leftTime = "ts",
      rightTime = "ts", payload = Seq("err_event_id", "err_ts"))
  }

  /** Bucketed range join: clicks landing within 6 hours AFTER an error by
    * the same user — interval side exploded over 6h buckets, equi-join on
    * (user, bucket), exact BETWEEN post-filter (see [[RangeJoin]]). */
  def j2Range(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_event_id"),
        col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("err_end"))
    RangeJoin(clicks, errors, pointTime = "ts", start = "err_start",
      end = "err_end", bucketWidth = 21600.0, on = Seq("user_id"))
      .select("event_id", "user_id", "ts", "err_event_id")
  }

  /** The range-join OPTIMIZER RULE end-to-end (j2 gates the hand-built
    * operator; this gates [[graft.plan.RangeJoinRewrite]] itself): a
    * KEYLESS left range join — clicks against sampled 2-hour maintenance
    * windows, the SCD2/acmi strict-bound shape with no equi key, which
    * Spark can only plan as BroadcastNestedLoopJoin — rewritten by the
    * rule into the bucketed equi-join. Runs in an ISOLATED `newSession`
    * (the bucketWidth conf is session-scoped by design; the shared verify/
    * bench session must not have every qualifying join rewritten behind
    * its back). The plan is asserted in-gate: a dormant rule (conf lost,
    * rule not injected, shape regression) throws rather than silently
    * hash-matching through the nested-loop plan. */
  def j4RangeRewriteLeft(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    val rule = graft.plan.RangeJoinRewrite()
    s2.experimental.extraOptimizations =
      s2.experimental.extraOptimizations :+ rule
    s2.conf.set(rule.WidthKey, "7200.0") // = the window length, epoch seconds
    val ev = Tables.load(s2, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "ts")
    val windows = ev.filter(col("event_type") === "error" && col("event_id") % 97 === 0)
      .select(col("event_id").as("win_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    val joined = clicks.join(windows,
      clicks("ts") >= windows("w_start") && clicks("ts") < windows("w_end"), "left")
      .select(col("event_id"), col("win_id"))
    val plan = joined.queryExecution.executedPlan.toString
    if (plan.contains("BroadcastNestedLoopJoin") || !plan.contains("Generate"))
      throw new IllegalStateException(
        "range-join rewrite did not engage on the j4 shape:\n" + plan)
    joined
  }

  /** Interval-overlap join: click activity windows [ts, ts+1h] against
    * error windows [ts, ts+6h] per user — pairs whose windows intersect.
    * One bucketed shuffle, canonical-bucket dedup-free matching; no
    * nested-loop join (plan-guarded). */
  def j3IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("c_start"),
        (col("ts") + expr("INTERVAL 1 HOURS")).as("c_end"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_event_id"),
        col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("err_end"))
    RangeJoin.intervalOverlap(clicks, errors,
      lStart = "c_start", lEnd = "c_end", rStart = "err_start", rEnd = "err_end",
      bucketWidth = 21600.0, on = Seq("user_id"))
      .select("event_id", "user_id", "err_event_id")
  }

  private val priorities = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")

  /** Pivot: order revenue by status × priority, priorities widened to
    * columns. Exact DECIMAL aggregation, one cast to DOUBLE at the edge. */
  def q34Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", priorities.map(_._1))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
      .select(col("o_orderstatus") +:
        priorities.map { case (v, alias) => col(s"`$v`").as(alias) }: _*)

  /** Unpivot (melt): per-user wide spend metrics back to long
    * (user_id, metric, amount) rows via Dataset.unpivot. */
  def q35Unpivot(s: SparkSession, dir: String): DataFrame = {
    def spend(t: String) =
      sum(when(col("event_type") === t, col("value").cast("decimal(18,2)")))
        .cast("double").as(s"${t}_value")
    val wide = Tables.load(s, dir, "events")
      .groupBy("user_id")
      .agg(spend("click"), spend("purchase"), spend("view"))
    wide.unpivot(Array(col("user_id")),
      Array(col("click_value"), col("purchase_value"), col("view_value")),
      "metric", "amount")
  }

  /** HLL sketch self-check: per event type, approx_count_distinct(user_id)
    * must land within 5% of the exact distinct count — violations surface
    * as rows (empty = pass), the s3/s4 oracle pattern for engine-specific
    * estimators. rsd is pinned at 0.01, so the 5% gate sits at 5 standard
    * deviations — meaningful at any cardinality, not a coin flip at one
    * sigma (the default rsd IS 0.05). */
  def q36ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    // approx and exact are SEPARATE aggregations joined on the tiny key:
    // combined in one agg, Spark's distinct-aggregate rewrite keys the
    // partial pass by (event_type, user_id) — ONE ~100 KB HLL sketch (rsd
    // 0.01 → 2^17 registers) PER DISTINCT PAIR rides the exchange, ~50 k
    // sketches at sf0.1 and cardinality-many at scale (guide §2.3: shuffle
    // fewer bytes). Split, each pass shuffles what it needs: per-TYPE HLL
    // partials (a handful of sketches) and narrow (type, user) rows for
    // the exact count. HLL registers are max-merged — commutative and
    // associative — so the estimate is bit-identical either way.
    val ev = Tables.load(s, dir, "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"))
    // null-SAFE key: a NULL event_type group (none in TESTDATA today, but
    // the single-agg original kept it) must survive the join too
    approx.join(exact, approx("event_type") <=> exact("event_type"))
      .drop(exact("event_type"))
      .filter(abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * 0.05)
      .select("event_type", "approx_users", "exact_users")
  }

  /** Approximate-percentile self-check: per event type, the t-digest-style
    * estimator must land within 5% of the exact median (violations surface
    * as rows; empty = pass). */
  def q37ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50"))
      .filter(abs(col("approx_p50") - col("exact_p50")) >
        abs(col("exact_p50")) * 0.05)
      .select("event_type", "approx_p50", "exact_p50")

  /** Mergeable-sketch pipeline (the 100 TB distinct-count shape): build a
    * DataSketches HLL per group in one map-side-combined pass, UNION the
    * sketches (never the raw data), estimate, and self-check against the
    * exact global distinct. At scale the per-partition sketch is KBs while
    * the raw key set is TBs — this is how distinct-count rolls up without
    * a global shuffle of keys. */
  def q38SketchUnion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val unioned = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_total"))
    val exact = ev.agg(countDistinct("user_id").as("exact_total"))
    // 1-row × 1-row flag join (the ScdMerge/DataTests pattern)
    unioned.crossJoin(exact)
      .filter(abs(col("approx_total") - col("exact_total")) >
        col("exact_total") * 0.05)
      .select("approx_total", "exact_total")
  }

  /** Daily resample with forward-fill: one row per user per day between
    * that user's first and last event, carrying the as-of-latest value —
    * grid built distributed (per-key min/max + sequence explode), filled by
    * the as-of pass (see [[TimeSeries.resample]]). */
  def q39Resample(s: SparkSession, dir: String): DataFrame =
    TimeSeries.resample(
      Tables.load(s, dir, "events").select("user_id", "ts", "value"),
      keys = Seq("user_id"), time = "ts", stepSeconds = 86400L,
      payload = Seq("value"))

  /** Window navigation functions — lag/lead/first_value/ntile per user in
    * time order (ties impossible: (user_id, ts) is unique in events). */
  def q40WindowNav(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 1).over(w).as("next_value"),
        first_value(col("value")).over(w).as("first_value"),
        ntile(4).over(w).as("quartile"))
  }

  /** JSON extraction from the semi-structured props column. */
  def q41JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))

  /** Spark's NATIVE session_window operator (the streaming sessionization
    * primitive; q16 pins the equivalent gaps-and-islands construction).
    * Window end = last event + gap, half-open: an event at exactly
    * start+gap begins a new session — the oracle's `>=` mirrors that. */
  def q42SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))

  /** CUBE over status × priority (all four grouping levels in one pass). */
  def q43Cube(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))

  /** One-pass column profile of documents (the pre-curation QC report). */
  def q44Profile(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.describe(Tables.load(s, dir, "documents"),
      Seq("doc_id", "lang", "source", "n_chars"))

  /** Correlated scalar subquery (richest customer per nation) — max, not
    * an arithmetic aggregate, so both engines compare exact values. */
  def q45Correlated(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("q45_customer")
    s.sql(
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM q45_customer c
        |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM q45_customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): every supplier walks the
    * implicit binary tree `parent(n) = n div 2` up to the root — depth =
    * ⌊log₂ n⌋, but computed by actual recursive iteration, so a broken
    * recursion (no fixpoint, lost rows, wrong anchor) mismatches. The
    * oracle runs the same recursion in DuckDB dialect (`//` vs `DIV`). */
  def q56RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "supplier").createOrReplaceTempView("q56_supplier")
    s.sql(
      """WITH RECURSIVE up(start, cur, depth) AS (
        |  SELECT s_suppkey, s_suppkey, 0 FROM q56_supplier
        |  UNION ALL
        |  SELECT start, cur DIV 2, depth + 1 FROM up WHERE cur > 1
        |)
        |SELECT start AS s_suppkey, CAST(max(depth) AS INT) AS depth
        |FROM up GROUP BY start""".stripMargin)
  }

  /** Correlated LATERAL join with per-row ORDER BY + LIMIT — the top-N-per-
    * group shape expressed through the LATERAL surface rather than a window
    * (q23 covers the window form). Ties broken by custkey for determinism;
    * DuckDB runs the identical SQL. */
  def q57LateralTopN(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "nation").createOrReplaceTempView("q57_nation")
    Tables.load(s, dir, "customer").createOrReplaceTempView("q57_customer")
    s.sql(
      """SELECT n.n_nationkey, n.n_name, l.c_custkey, l.c_acctbal
        |FROM q57_nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM q57_customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) l""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_recursive_cte" -> q56RecursiveCte,
    "q57_lateral_topn" -> q57LateralTopN,
    "j1_asof_join" -> j1AsOf,
    "j3_interval_overlap" -> j3IntervalOverlap,
    "j2_range_join" -> j2Range,
    "j4_range_rewrite_left" -> j4RangeRewriteLeft,
    "q34_pivot" -> q34Pivot,
    "q35_unpivot" -> q35Unpivot,
    "q36_approx_distinct" -> q36ApproxDistinct,
    "q37_approx_percentile" -> q37ApproxPercentile,
    "q38_sketch_union" -> q38SketchUnion,
    "q39_resample" -> q39Resample,
    "q40_window_nav" -> q40WindowNav,
    "q41_json_extract" -> q41JsonExtract,
    "q42_session_window" -> q42SessionWindow,
    "q43_cube" -> q43Cube,
    "q44_profile" -> q44Profile,
    "q45_correlated" -> q45Correlated)

  val oracle: Map[String, String] = Map(
    "q56_recursive_cte" ->
      """WITH RECURSIVE up(start, cur, depth) AS (
        |  SELECT s_suppkey, s_suppkey, 0 FROM supplier
        |  UNION ALL
        |  SELECT start, cur // 2, depth + 1 FROM up WHERE cur > 1
        |)
        |SELECT start AS s_suppkey, CAST(max(depth) AS INT) AS depth
        |FROM up GROUP BY start""".stripMargin,
    "q57_lateral_topn" ->
      """SELECT n.n_nationkey, n.n_name, l.c_custkey, l.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) l""".stripMargin,
    "j1_asof_join" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |       e.event_id AS err_event_id, e.ts AS err_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON c.user_id = e.user_id AND c.ts >= e.ts""".stripMargin,
    "j2_range_join" ->
      """SELECT c.event_id, c.user_id, c.ts, e.event_id AS err_event_id
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND c.ts BETWEEN e.ts AND e.ts + INTERVAL 6 HOUR""".stripMargin,
    // j4: the rewrite must reproduce LEFT-join semantics exactly — matched
    // pairs once each, unmatched clicks null-extended exactly once
    "j4_range_rewrite_left" ->
      """SELECT c.event_id, e.event_id AS win_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events
        |           WHERE event_type = 'error' AND event_id % 97 = 0) e
        |  ON c.ts >= e.ts AND c.ts < e.ts + INTERVAL 2 HOUR""".stripMargin,
    // j3: windows [c, c+1h] × [e, e+6h] intersect iff c <= e+6h and e <= c+1h
    "j3_interval_overlap" ->
      """SELECT c.event_id, c.user_id, e.event_id AS err_event_id
        |FROM events c JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND c.ts <= e.ts + INTERVAL 6 HOUR
        | AND e.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin,
    "q34_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS p1_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE) AS p2_high,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE) AS p3_medium,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE) AS p4_not_specified,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderpriority = '5-LOW') AS DOUBLE) AS p5_low
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q35_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |         FILTER (WHERE event_type = 'click') AS DOUBLE) AS click_value,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |         FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)))
        |         FILTER (WHERE event_type = 'view') AS DOUBLE) AS view_value
        |  FROM events GROUP BY user_id)
        |SELECT user_id, 'click_value' AS metric, click_value AS amount FROM wide
        |UNION ALL
        |SELECT user_id, 'purchase_value' AS metric, purchase_value AS amount FROM wide
        |UNION ALL
        |SELECT user_id, 'view_value' AS metric, view_value AS amount FROM wide""".stripMargin,
    "q36_approx_distinct" ->
      """SELECT event_type, CAST(0 AS BIGINT) AS approx_users,
        |       CAST(0 AS BIGINT) AS exact_users
        |FROM events WHERE 1 = 0""".stripMargin,
    "q37_approx_percentile" ->
      """SELECT event_type, CAST(0 AS DOUBLE) AS approx_p50,
        |       CAST(0 AS DOUBLE) AS exact_p50
        |FROM events WHERE 1 = 0""".stripMargin,
    "q38_sketch_union" ->
      """SELECT CAST(0 AS BIGINT) AS approx_total,
        |       CAST(0 AS BIGINT) AS exact_total
        |FROM events WHERE 1 = 0""".stripMargin,
    // grid_ts stays in NAIVE timestamp arithmetic end-to-end: the obvious
    // to_timestamp(b*86400)::TIMESTAMP round-trips through TIMESTAMPTZ and
    // localizes to DuckDB's session TimeZone — which the oracle runner
    // never pins — so on any non-UTC host every grid point would shift by
    // the zone offset and the gate would false-fail (Spark's side IS
    // pinned to UTC)
    "q39_resample" ->
      """WITH bounds AS (
        |  SELECT user_id, min(ts) AS mn, max(ts) AS mx
        |  FROM events GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |         TIMESTAMP '1970-01-01' + b * INTERVAL 1 DAY AS grid_ts
        |  FROM bounds,
        |       unnest(generate_series(CAST(floor(epoch(mn) / 86400) AS BIGINT),
        |                              CAST(floor(epoch(mx) / 86400) AS BIGINT))) AS t(b))
        |SELECT g.user_id, g.grid_ts, e.value
        |FROM grid g
        |ASOF LEFT JOIN events e
        |  ON g.user_id = e.user_id AND g.grid_ts >= e.ts""".stripMargin,
    "q40_window_nav" ->
      """SELECT event_id, user_id, ts, value,
        |  lag(value, 1) OVER w AS prev_value,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER
        |    (PARTITION BY user_id ORDER BY ts
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin,
    "q41_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,
    "q42_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, sid""".stripMargin,
    "q43_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q44_profile" -> Seq("doc_id", "lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n"),
    "q45_correlated" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
}
