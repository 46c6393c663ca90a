package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; each map entry is one operator from
  * SURVEY.md §2 (pipeline ops) or the LLM-data-pipeline extension set. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.LlmData.queries ++ graft.queries.Streaming.queries ++ graft.queries.Analytics.queries ++ graft.queries.Extras.queries ++ graft.queries.Advanced.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++ graft.queries.LlmData.oracle ++ graft.queries.Streaming.oracle ++ graft.queries.Analytics.oracle ++ graft.queries.Extras.oracle ++ graft.queries.Advanced.oracle
}
