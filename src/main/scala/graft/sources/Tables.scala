package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The fixture columns that are timestamps by TESTDATA contract. A bare
    * LongType carries no unit, so nanos-as-long recovery (encoding 1 below)
    * must be declared per column — and declared for EVERY known timestamp
    * column, not just the one that has drifted so far: if a future driver
    * regeneration writes TIMESTAMP(NANOS) for all tables, the date columns
    * would otherwise surface as raw longs and every date filter would
    * break the same way events.ts did in round 9. */
  private val knownTimestampCols: Map[String, Set[String]] = Map(
    "events" -> Set("ts"),
    "lineitem" -> Set("l_shipdate"),
    "orders" -> Set("o_orderdate"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$dir/$name.parquet"),
      nanosLongCols = knownTimestampCols.getOrElse(name, Set.empty))

  /** Absorb the three timestamp encodings parquet files carry in the wild so
    * every downstream operator sees one canonical type, `TimestampType`:
    *
    *   1. TIMESTAMP(NANOS) — unreadable by the vectorized reader; with
    *      [[nanosAsLongConf]] it surfaces as LongType nanoseconds, which we
    *      truncate to µs (the same truncation DuckDB applies, so both engines
    *      see identical values).
    *   2. TIMESTAMP(MICROS, isAdjustedToUTC=false) — what pandas/pyarrow
    *      write by default; Spark 4 reads it as TIMESTAMP_NTZ, which rejects
    *      `unix_micros`/numeric casts. Cast to TimestampType — value-
    *      preserving under the UTC session every graft entrypoint pins.
    *   3. TIMESTAMP(MICROS, isAdjustedToUTC=true) — already TimestampType;
    *      pass through.
    *
    * The loader owns this so fixture-encoding drift never reaches operators.
    *
    * @param nanosLongCols columns KNOWN to be nanos-as-long timestamps (a
    *   bare LongType carries no unit, so encoding 1 is opt-in per column;
    *   encodings 2 and 3 are self-describing and always normalized) */
  private[graft] def normalizeTimestamps(df: DataFrame,
      nanosLongCols: Set[String] = Set.empty): DataFrame = {
    // both branches reference the column by PARSED name, so quote it the
    // same way in both — a field named "a.b" or carrying a backtick must
    // resolve as the top-level field, not fail analysis or hit a struct
    def quoted(n: String): String = "`" + n.replace("`", "``") + "`"
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampNTZType =>
          d.withColumn(f.name, col(quoted(f.name)).cast(TimestampType))
        case LongType if nanosLongCols.contains(f.name) =>
          d.withColumn(f.name, timestamp_micros(expr(s"${quoted(f.name)} div 1000")))
        case _ => d
      }
    }
  }

  /** Register every table as a temp view so `spark.sql` queries and the YAML
    * interpreter can reference them by name. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
