package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{DataTests, Expectations, ScdMerge, SchemaTransform, TimeCols}

/** Core relational query surface: the runtime shapes the reference's emitted
  * pipelines execute (SURVEY §2.2-2.5) — gold-layer aggregations and joins,
  * CDC latest-per-key, schema transforms, expectations, fan-in unions, and the
  * nine data tests.
  *
  * Determinism-for-oracle notes: computed doubles go through exact DECIMAL
  * aggregation then a final cast to DOUBLE, so Spark and DuckDB produce
  * bit-identical values regardless of summation order. Timestamp outputs are
  * truncated (the `events` table is nanosecond-precision parquet; Spark reads
  * µs, DuckDB ns).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact deterministic sum of a money-valued double expression: round each
    * term to a decimal, sum exactly, cast once to double. */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  // ---------------------------------------------------------------- queries

  /** TPC-H Q1-shaped pricing summary (gold-layer aggregation). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Gold-layer revenue by region and month — the reference acmi
    * `revenue_by_region_mv.sql` shape (4-way join + group-agg + distincts).
    * region/nation are broadcast (tiny dims at every SF). */
  def q2RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
  }

  /** CDC latest-per-key (the reference's DLQ dedup / CDC-merge window shape:
    * row_number over partitionBy(keys) orderBy(seq desc)). */
  def q3LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
  }

  /** Projection + predicate pushdown (delta-load `select_columns` +
    * `where_clause` shape). `.explain` shows PushedFilters on the scan. */
  def q4FilterPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")

  /** Schema transform: rename + cast + strict enforcement. */
  def q5SchemaTransform(s: SparkSession, dir: String): DataFrame = {
    val out = SchemaTransform(
      t(s, dir, "customer"),
      SchemaTransform.Spec(
        renames = Map(
          "c_custkey" -> "customer_id", "c_name" -> "name",
          "c_nationkey" -> "nation_id", "c_acctbal" -> "acctbal",
          "c_mktsegment" -> "mktsegment"),
        casts = Map("nation_id" -> "bigint", "acctbal" -> "decimal(12,2)"),
        declared = Seq("customer_id", "name", "nation_id", "acctbal", "mktsegment"),
        enforcement = SchemaTransform.Strict))
    // decimal → double for engine-portable comparison (same exact decimal on
    // both sides → identical double)
    out.withColumn("acctbal", col("acctbal").cast("double"))
  }

  /** Fan-in: two branches appended into one target (N append_flows → 1 table). */
  def q6UnionFanin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"), lit("purchases").as("branch"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("value"), lit("signups").as("branch"))
    purchases.unionByName(signups)
  }

  /** Expectations drop-mode: keep rows passing all constraints. */
  def q7DqDrop(s: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      Expectations.Rule("valid_quantity", "l_quantity >= 1 AND l_quantity <= 50", Expectations.Drop),
      Expectations.Rule("positive_price", "l_extendedprice > 0", Expectations.Drop),
      Expectations.Rule("known_flag", "l_returnflag IN ('A','N','R')", Expectations.Drop))
    Expectations.dropViolations(t(s, dir, "lineitem"), rules)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** Test op: uniqueness (duplicate groups). */
  def q8TestUniqueness(s: SparkSession, dir: String): DataFrame =
    DataTests.uniqueness(t(s, dir, "events"), Seq("user_id"))

  /** Test op: referential integrity via left-anti join. */
  def q9TestRefIntegrity(s: SparkSession, dir: String): DataFrame =
    DataTests.referentialIntegrity(
      t(s, dir, "events"), t(s, dir, "customer"), Seq("user_id"), Seq("c_custkey"))
      .select("event_id", "user_id")

  /** Test op: completeness (required columns non-null). */
  def q10TestCompleteness(s: SparkSession, dir: String): DataFrame =
    DataTests.completeness(t(s, dir, "orders"), Seq("o_orderkey", "o_custkey", "o_orderdate"))
      .select("o_orderkey")

  /** Test op: range violations. */
  def q11TestRange(s: SparkSession, dir: String): DataFrame =
    DataTests.range(t(s, dir, "events"), "value", 0.0, 100.0)
      .select("event_id", "user_id", "value")

  /** Test op: row-count comparison (tolerance -1 ⇒ always emit the row). */
  def q12TestRowCount(s: SparkSession, dir: String): DataFrame =
    DataTests.rowCount(
      t(s, dir, "orders"),
      t(s, dir, "lineitem").select("l_orderkey").distinct(),
      tolerance = -1)

  /** Test op: all_lookups_found — fact rows whose lookup key misses the
    * (filtered) dimension. Same anti-join plan class as q9; the filter
    * manufactures real violations so the gate row is non-trivial. */
  def q51TestLookups(s: SparkSession, dir: String): DataFrame =
    DataTests.allLookupsFound(
      t(s, dir, "lineitem"), t(s, dir, "part").filter(col("p_size") > 25),
      Seq("l_partkey"), Seq("p_partkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey")

  /** Test op: custom_sql — arbitrary SQL producing violation rows (orders
    * with no lineitems). */
  def q52TestCustomSql(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("q52_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("q52_lineitem")
    DataTests.customSql(s,
      """SELECT o_orderkey FROM q52_orders o
        |WHERE NOT EXISTS (SELECT 1 FROM q52_lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey)""".stripMargin)
  }

  /** Test op: custom_expectations — rule-based violating rows with the
    * failed-rule names attached. */
  def q53TestCustomExpectations(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations
    val rules = Seq(
      Expectations.Rule("value_le_50", "value <= 50", Expectations.Drop),
      Expectations.Rule("not_error", "event_type <> 'error'", Expectations.Drop))
    DataTests.customExpectations(t(s, dir, "events"), rules)
      .select(col("event_id"),
        array_join(col("_failed_rules"), ",").as("failed"))
  }

  /** Test op: schema_match — column-level diff of a drifted source view
    * against the reference table (type change, dropped column, extra
    * column). Deterministic output, so the oracle pins the exact rows. */
  def q54TestSchemaMatch(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("q54_reference")
    t(s, dir, "customer")
      .withColumn("c_acctbal", col("c_acctbal").cast("string")) // type drift
      .drop("c_mktsegment")                                     // dropped
      .withColumn("c_flags", lit(1))                            // added
      .createOrReplaceTempView("q54_source")
    DataTests.schemaMatch(s, "q54_source", "q54_reference")
  }

  /** SCD1 current-state table from the events change feed. */
  def q13Scd1(s: SparkSession, dir: String): DataFrame = {
    val changes = t(s, dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    ScdMerge.scd1(None, changes,
      ScdMerge.Options(keys = Seq("user_id"), sequenceBy = Seq("ts", "event_id"), scdType = 1))
      .select("user_id", "event_id", "event_type", "value")
  }

  /** SCD2 history from the events change feed: one version per change of the
    * tracked column, µs-epoch validity interval. */
  def q14Scd2(s: SparkSession, dir: String): DataFrame = {
    val changes = t(s, dir, "events")
      .select(col("user_id"), TimeCols.epochMicros(col("ts")).as("seq"), col("event_type"))
    ScdMerge.scd2(None, changes,
      ScdMerge.Options(keys = Seq("user_id"), sequenceBy = Seq("seq"), scdType = 2,
        trackHistoryColumns = Some(Seq("event_type"))))
      .select(col("user_id"), col("event_type"),
        col(ScdMerge.StartCol), col(ScdMerge.EndCol))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg,
    "q2_region_revenue" -> q2RegionRevenue,
    "q3_latest_per_key" -> q3LatestPerKey,
    "q4_filter_pushdown" -> q4FilterPushdown,
    "q5_schema_transform" -> q5SchemaTransform,
    "q6_union_fanin" -> q6UnionFanin,
    "q7_dq_drop" -> q7DqDrop,
    "q8_test_uniqueness" -> q8TestUniqueness,
    "q9_test_ref_integrity" -> q9TestRefIntegrity,
    "q10_test_completeness" -> q10TestCompleteness,
    "q11_test_range" -> q11TestRange,
    "q12_test_row_count" -> q12TestRowCount,
    "q51_test_lookups" -> q51TestLookups,
    "q52_test_custom_sql" -> q52TestCustomSql,
    "q53_test_custom_expectations" -> q53TestCustomExpectations,
    "q54_test_schema_match" -> q54TestSchemaMatch,
    "q13_scd1_current" -> q13Scd1,
    "q14_scd2_history" -> q14Scd2)

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_region_revenue" ->
      """SELECT r_name,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(DISTINCT c_custkey) AS n_customers
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, CAST(date_trunc('month', o_orderdate) AS DATE)""".stripMargin,
    "q3_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q4_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q5_schema_transform" ->
      """SELECT c_custkey AS customer_id, c_name AS name,
        |  CAST(c_nationkey AS BIGINT) AS nation_id,
        |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
        |  c_mktsegment AS mktsegment
        |FROM customer""".stripMargin,
    "q6_union_fanin" ->
      """SELECT event_id, user_id, value, 'purchases' AS branch FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, value, 'signups' AS branch FROM events WHERE event_type = 'signup'""".stripMargin,
    "q7_dq_drop" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_quantity >= 1 AND l_quantity <= 50 AND l_extendedprice > 0
        |  AND l_returnflag IN ('A','N','R')""".stripMargin,
    "q8_test_uniqueness" ->
      """SELECT user_id, COUNT(*) AS duplicate_count FROM events
        |GROUP BY user_id HAVING COUNT(*) > 1""".stripMargin,
    "q9_test_ref_integrity" ->
      """SELECT event_id, user_id FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)""".stripMargin,
    "q10_test_completeness" ->
      """SELECT o_orderkey FROM orders
        |WHERE NOT (o_orderkey IS NOT NULL AND o_custkey IS NOT NULL AND o_orderdate IS NOT NULL)""".stripMargin,
    "q11_test_range" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE NOT (value >= 0.0 AND value <= 100.0)""".stripMargin,
    "q12_test_row_count" ->
      """SELECT source_count, target_count, abs(source_count - target_count) AS diff FROM
        |  (SELECT COUNT(*) AS source_count FROM orders),
        |  (SELECT COUNT(DISTINCT l_orderkey) AS target_count FROM lineitem)""".stripMargin,
    "q51_test_lookups" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p
        |                  WHERE p.p_partkey = l.l_partkey AND p.p_size > 25)""".stripMargin,
    "q52_test_custom_sql" ->
      """SELECT o_orderkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "q53_test_custom_expectations" ->
      """SELECT event_id,
        |  array_to_string(list_filter(
        |    [CASE WHEN NOT coalesce(value <= 50, FALSE) THEN 'value_le_50' END,
        |     CASE WHEN NOT coalesce(event_type <> 'error', FALSE) THEN 'not_error' END],
        |    x -> x IS NOT NULL), ',') AS failed
        |FROM events
        |WHERE NOT coalesce(value <= 50, FALSE)
        |   OR NOT coalesce(event_type <> 'error', FALSE)""".stripMargin,
    "q54_test_schema_match" ->
      """SELECT * FROM (VALUES
        |  ('c_acctbal', 'string', 'double', 'type_mismatch'),
        |  ('c_mktsegment', CAST(NULL AS VARCHAR), 'string', 'missing_in_source'),
        |  ('c_flags', 'int', CAST(NULL AS VARCHAR), 'extra_in_source'))
        |  AS t(column_name, source_type, reference_type, status)""".stripMargin,
    "q13_scd1_current" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,
    "q14_scd2_history" ->
      """WITH c AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS seq, event_type FROM events),
        |ordered AS (
        |  SELECT user_id, seq, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY seq) AS prev
        |  FROM c),
        |kept AS (
        |  SELECT user_id, seq, event_type FROM ordered
        |  WHERE prev IS NULL OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, seq AS __start_at,
        |  lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS __end_at
        |FROM kept""".stripMargin)
}
