package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Wider relational/analytic surface available through the SQL transform
  * path (SURVEY §2.5: grouping sets/rollup "come free via spark.sql" — these
  * queries prove it end-to-end against the oracle): multi-level aggregation,
  * top-k per group, existential joins, conditional/pivot aggregation, scalar
  * string functions.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** GROUPING SETS over the region/nation hierarchy. */
  def q21GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""".stripMargin)
  }

  /** ROLLUP by order year/month (DataFrame rollup API). */
  def q22Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("y", year(col("o_orderdate")))
      .withColumn("m", month(col("o_orderdate")))
      .rollup("y", "m")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))

  /** Top-3 orders by price per priority (dense window top-k). */
  def q23TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
  }

  /** Customers with ≥1 order but no order above a threshold (semi + anti). */
  def q24ExistsAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(o.filter(col("o_totalprice") > 400000.0), c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
  }

  /** Conditional (pivot-style) aggregation by return flag. */
  def q25ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("l_returnflag") === "A", col("l_quantity")).otherwise(0.0))
          .cast("double").as("qty_a"),
        sum(when(col("l_returnflag") === "N", col("l_quantity")).otherwise(0.0))
          .cast("double").as("qty_n"),
        sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0))
          .cast("double").as("qty_r"),
        count(lit(1)).as("n"))

  /** Scalar string-function projection. */
  def q26StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))

  /** Exact percentiles (continuous interpolation — Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition). */
  def q27Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"),
        round(expr("percentile(l_quantity, 0.99)"), 6).as("p99"))

  /** Date/time function surface: truncation, extraction, arithmetic. */
  def q28Datetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit(java.sql.Date.valueOf("2026-01-01")),
          col("o_orderdate").cast("date")).as("days_to_2026"))

  /** RANGE-frame window: per customer, the sum of order totals within the
    * preceding 30 days of each order (event-time sliding aggregate). */
  def q29RangeWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").cast("timestamp").cast("long").as("ts"),
        col("o_totalprice"))
    val w = Window.partitionBy("o_custkey").orderBy(col("ts"))
      .rangeBetween(-30L * 86400, 0)
    o.select(col("o_orderkey"), col("o_custkey"),
        round(sum(col("o_totalprice")).over(w), 4).as("sum_30d"),
        count(lit(1)).over(w).as("n_30d"))
  }

  /** Array aggregation surface: per order, the sorted quantity list (joined
    * to a string for engine-portable comparison), its size, and a
    * higher-order-function fold over it. */
  def q30ArrayAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .groupBy("l_orderkey")
      .agg(collect_list(col("q")).as("qs"))
      .select(
        col("l_orderkey"),
        array_join(sort_array(col("qs")), ",").as("quantities"),
        size(col("qs")).as("n_items"),
        aggregate(col("qs"), lit(0L), (acc, x) => acc + x).as("total_qty"))

  /** Set-operation surface: INTERSECT and EXCEPT between customer
    * populations (order-holders vs high-balance). */
  def q31SetOps(s: SparkSession, dir: String): DataFrame = {
    val withOrders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey")).distinct()
    val highBal = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val both = withOrders.intersect(highBal)
    val highBalNoOrders = highBal.except(withOrders)
    both.withColumn("segment", lit("active_high_balance"))
      .unionByName(highBalNoOrders.withColumn("segment", lit("dormant_high_balance")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_set_ops" -> q31SetOps,
    "q30_array_agg" -> q30ArrayAgg,
    "q27_percentiles" -> q27Percentiles,
    "q28_datetime" -> q28Datetime,
    "q29_range_window" -> q29RangeWindow,
    "q21_grouping_sets" -> q21GroupingSets,
    "q22_rollup" -> q22Rollup,
    "q23_topk_per_group" -> q23TopKPerGroup,
    "q24_exists_anti" -> q24ExistsAnti,
    "q25_conditional_agg" -> q25ConditionalAgg,
    "q26_string_funcs" -> q26StringFuncs)

  // ORACLE-AUTHORING RULE: every DuckDB aggregate output must carry an
  // explicit CAST — SUM over integers yields HUGEINT (arrow decimal128),
  // which hash-mismatches Spark's int64 even when values agree. This class
  // of bug cost two rounds (q16 in r2, q30 in r3). Write
  // `CAST(SUM(...) AS BIGINT)` / `CAST(count(*) AS INT)` etc., always.
  val oracle: Map[String, String] = Map(
    "q31_set_ops" ->
      """WITH with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
        |high_bal AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT c_custkey, 'active_high_balance' AS segment
        |FROM (SELECT c_custkey FROM with_orders INTERSECT SELECT c_custkey FROM high_bal)
        |UNION ALL
        |SELECT c_custkey, 'dormant_high_balance' AS segment
        |FROM (SELECT c_custkey FROM high_bal EXCEPT SELECT c_custkey FROM with_orders)""".stripMargin,
    "q30_array_agg" ->
      """SELECT l_orderkey,
        |  list_aggregate(list_sort(list(CAST(l_quantity AS BIGINT))),
        |                 'string_agg', ',') AS quantities,
        |  CAST(count(*) AS INT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q28_datetime" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INT)
        |    AS days_to_2026
        |FROM orders""".stripMargin,
    "q29_range_window" ->
      """SELECT o_orderkey, o_custkey,
        |  round(SUM(o_totalprice) OVER w, 4) AS sum_30d,
        |  COUNT(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""".stripMargin,
    "q27_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        |  round(quantile_cont(l_quantity, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q21_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""".stripMargin,
    "q22_rollup" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))""".stripMargin,
    "q23_topk_per_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,
    "q24_exists_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin,
    "q25_conditional_agg" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END) AS DOUBLE) AS qty_r,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q26_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  length(p_name) AS name_len,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin)
}
