package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Test-data catalog: one parquet file per TPC-H-ish table (see TESTDATA.md).
  *
  * Scale notes: `spark.read.parquet` is the vectorized columnar scan —
  * filter/projection pushdown reaches the file scan (verified via
  * `.explain("formatted")` → `PushedFilters`/`ReadSchema`). At 100 TB the same
  * call pattern holds: the directory would be a partitioned table and Catalyst
  * prunes partitions from `WHERE` clauses; nothing here assumes single-file
  * inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale factor
    * (region=5, nation=25 rows at every SF). */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Required session conf: parquet TIMESTAMP(NANOS) columns (events.ts) are
    * unreadable by Spark's vectorized reader; with this flag they surface as
    * LongType ns which [[load]] converts to a µs timestamp — the same
    * truncation DuckDB applies reading the file, so both engines see
    * identical values. */
  val nanosAsLongConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` queries and the YAML
    * interpreter can reference them by name. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
