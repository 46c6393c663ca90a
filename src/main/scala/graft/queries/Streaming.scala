package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Expectations, ScdMerge, SnapshotCdc, TimeCols}

/** Event-stream shapes run in batch mode: tumbling-window aggregation (the
  * Structured Streaming `window()` operator), gap-based sessionization
  * (the mapGroupsWithState-style shape expressed as window functions),
  * quarantine routing, SCD1-with-deletes, and the snapshot-CDC differ.
  * All are the same DataFrame programs the streaming engine runs per batch.
  */
object Streaming {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** Tumbling 1-hour window aggregation via the native `window()` operator —
    * identical code works under `readStream` with a watermark. */
  def q15HourlyAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity): lag → new-session flag →
    * running sum = session index; one shuffle by user. */
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us")
    events(s, dir)
      .withColumn("us", TimeCols.epochMicros(col("ts")))
      .withColumn("gap", col("us") - lag("us", 1).over(byUser))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min("us").as("session_start"), max("us").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Quarantine routing: violating rows annotated with their failed rules
    * (the DLQ feed of the reference's quarantine mode, SURVEY §2.2). */
  def q17Quarantine(s: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      Expectations.Rule("value_in_range", "value >= 0 AND value <= 100", Expectations.Drop),
      Expectations.Rule("known_type",
        "event_type IN ('click','view','signup','purchase')", Expectations.Drop))
    Expectations.quarantine(events(s, dir), rules)
      .select(col("event_id"), col("user_id"),
        array_join(col("_failed_rules"), ",").as("failed"))
  }

  /** SCD1 with apply_as_deletes: 'error' events delete the key. */
  def q18Scd1Deletes(s: SparkSession, dir: String): DataFrame = {
    val changes = events(s, dir).select(
      col("user_id"), TimeCols.epochMicros(col("ts")).as("seq"), col("event_id"),
      col("event_type"), col("value"))
    ScdMerge.scd1(None, changes,
      ScdMerge.Options(keys = Seq("user_id"), sequenceBy = Seq("seq"), scdType = 1,
        applyAsDeletes = Some("event_type = 'error'")))
      .select("user_id", "event_id", "event_type", "value")
  }

  /** Snapshot-CDC differ against an independent SQL oracle: snapshot = the
    * customer table with +100.00 acctbal for custkey%10=0 and custkey%7=0
    * rows removed; target = current customer state. */
  def q19SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(s, dir, "customer")
    val snapshot = customer
      .filter(col("c_custkey") % 7 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, round(col("c_acctbal") + 100.0, 2))
          .otherwise(col("c_acctbal")))
      .withColumn("version", lit(2L))
    val opts = ScdMerge.Options(keys = Seq("c_custkey"), sequenceBy = Seq("version"), scdType = 1)
    SnapshotCdc.diff(Some(customer), snapshot, opts)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("version"), col(SnapshotCdc.OpCol).as("op"))
  }

  /** SCD2 temporal range join — the reference acmi gold-layer shape
    * (`o.order_date >= c.__start_at AND (o.order_date < c.__end_at OR
    * c.__end_at IS NULL)`, SQL/gld/revenue_by_region_mv.sql:8-27): each event
    * joined to the dimension version active at its timestamp. The join is
    * equi on the key + range residual, so Catalyst executes it as a hash join
    * on user_id with a filtered probe — no cross product. */
  def q20TemporalJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = q14Scd2Hist(s, dir) // SCD2 versions of event_type per user
    val facts = events(s, dir)
      .select(col("user_id"), col("event_id"), TimeCols.epochMicros(col("ts")).as("us"))
    facts.join(dim,
      facts("user_id") === dim("user_id") &&
        facts("us") >= dim(ScdMerge.StartCol) &&
        (facts("us") < dim(ScdMerge.EndCol) || dim(ScdMerge.EndCol).isNull))
      .groupBy(dim("event_type"))
      .agg(count(lit(1)).as("n_facts"))
  }

  private def q14Scd2Hist(s: SparkSession, dir: String): DataFrame = {
    val changes = events(s, dir)
      .select(col("user_id"), TimeCols.epochMicros(col("ts")).as("seq"), col("event_type"))
    ScdMerge.scd2(None, changes,
      ScdMerge.Options(keys = Seq("user_id"), sequenceBy = Seq("seq"), scdType = 2,
        trackHistoryColumns = Some(Seq("event_type"))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_temporal_join" -> q20TemporalJoin,
    "q15_hourly_agg" -> q15HourlyAgg,
    "q16_sessionize" -> q16Sessionize,
    "q17_quarantine" -> q17Quarantine,
    "q18_scd1_deletes" -> q18Scd1Deletes,
    "q19_snapshot_diff" -> q19SnapshotDiff)

  val oracle: Map[String, String] = Map(
    "q20_temporal_join" ->
      """WITH c AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS seq, event_type FROM events),
        |ordered AS (
        |  SELECT user_id, seq, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY seq) AS prev
        |  FROM c),
        |dim AS (
        |  SELECT user_id, event_type, seq AS s_at,
        |    lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS e_at
        |  FROM ordered WHERE prev IS NULL OR event_type IS DISTINCT FROM prev),
        |facts AS (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events)
        |SELECT d.event_type, COUNT(*) AS n_facts
        |FROM facts f JOIN dim d
        |  ON f.user_id = d.user_id AND f.us >= d.s_at
        |  AND (f.us < d.e_at OR d.e_at IS NULL)
        |GROUP BY d.event_type""".stripMargin,
    "q15_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q16_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS gap
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, us,
        |    CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sess AS (
        |  SELECT user_id, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  min(us) AS session_start,
        |  max(us) AS session_end, count(*) AS n_events
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,
    "q17_quarantine" ->
      """SELECT event_id, user_id,
        |  array_to_string(list_filter(
        |    [CASE WHEN NOT coalesce(value >= 0 AND value <= 100, FALSE) THEN 'value_in_range' END,
        |     CASE WHEN NOT coalesce(event_type IN ('click','view','signup','purchase'), FALSE) THEN 'known_type' END],
        |    x -> x IS NOT NULL), ',') AS failed
        |FROM events
        |WHERE NOT coalesce(value >= 0 AND value <= 100, FALSE)
        |   OR NOT coalesce(event_type IN ('click','view','signup','purchase'), FALSE)""".stripMargin,
    "q18_scd1_deletes" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC) AS rn
        |  FROM events) WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q19_snapshot_diff" ->
      """WITH snap AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 100.0, 2)
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 7 <> 0)
        |SELECT s.c_custkey, s.c_name, s.c_acctbal, 2 AS version,
        |  'update' AS op
        |FROM snap s JOIN customer c USING (c_custkey)
        |WHERE s.c_acctbal <> c.c_acctbal
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal, 2 AS version, 'delete' AS op
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin)
}
