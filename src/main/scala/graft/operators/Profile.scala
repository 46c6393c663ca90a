package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — row count, null count, distinct count, and
  * string-cast min/max per column, as rows. The standard QC step before
  * curation ("which columns are usable?") done as a SINGLE aggregate over
  * the data: no per-column scans, no driver-side describe loops.
  *
  * `exact = true` uses exact distinct counts (Catalyst plans the multi-
  * distinct aggregate via expand — rows multiply by the column count, fine
  * up to a handful of columns); at 100 TB or for wide profiles pass
  * `exact = false` for HLL distinct (single pass, no expand). Min/max cast
  * to string AFTER aggregation, so ordering is the column's native order.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val distinctOf = (c: String) =>
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), 0.01)
    val row = df.agg(count(lit(1)).as("__n"), cols.flatMap(c => Seq(
      sum(when(col(c).isNotNull, 0L).otherwise(1L)).as(s"__nulls_$c"),
      distinctOf(c).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"))): _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("__p"))
      .select("__p.*")
  }
}
