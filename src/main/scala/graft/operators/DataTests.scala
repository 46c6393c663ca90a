package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's nine data-test operators (reference:
  * src/lhp/generators/test/{row_count,uniqueness,referential_integrity,
  * completeness,range,schema_match,all_lookups_found,custom_sql,
  * custom_expectations}.py). Each produces a *violations* DataFrame — empty ⇔
  * test passes — mirroring the emitted temp-table + expectation pattern
  * (src/lhp/generators/test/_base.py:22-96).
  *
  * Scale: every shape here is a single aggregate or an anti-join — Catalyst
  * broadcasts the small side automatically; none of them materialize more than
  * the violating rows.
  */
object DataTests {

  /** `abs(source_count - target_count) <= tolerance` as a one-row DataFrame
    * (cross join of two scalar counts — reference test/row_count.py.j2:18-22). */
  def rowCount(source: DataFrame, target: DataFrame, tolerance: Long = 0): DataFrame = {
    val s = source.agg(count(lit(1)).as("source_count"))
    val t = target.agg(count(lit(1)).as("target_count"))
    s.crossJoin(t)
      .withColumn("diff", abs(col("source_count") - col("target_count")))
      .filter(col("diff") > tolerance)
  }

  /** Duplicate groups: `GROUP BY cols HAVING COUNT(*) > 1`. */
  def uniqueness(df: DataFrame, cols: Seq[String], filter: Option[String] = None): DataFrame = {
    val base = filter.map(df.filter).getOrElse(df)
    base.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("duplicate_count"))
      .filter(col("duplicate_count") > 1)
  }

  /** Source rows whose key has no match in the reference table (left anti).
    * Both sides are ALIASED so shared-lineage inputs (a self-referential FK
    * check, a view over the reference's own table) resolve to distinct
    * attributes instead of Spark's ambiguous-self-join error — or worse, a
    * silent within-row rewrite. NULL source keys count as violations (an
    * equality never matches them), matching the q9 oracle's NOT EXISTS
    * semantics: a null FK still references no row; use [[completeness]]
    * for the null-specific test. */
  def referentialIntegrity(source: DataFrame, reference: DataFrame,
      sourceCols: Seq[String], refCols: Seq[String]): DataFrame = {
    val s = source.alias("__ri_s")
    val r = reference.alias("__ri_r")
    val cond = sourceCols.zip(refCols)
      .map { case (sc, rc) => col(s"__ri_s.$sc") === col(s"__ri_r.$rc") }
      .reduce(_ && _)
    s.join(r, cond, "left_anti")
  }

  /** Rows with any required column null. */
  def completeness(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(!required.map(c => col(c).isNotNull).reduce(_ && _))

  /** Rows outside [min, max] on a column. A NULL value PASSES (the
    * predicate evaluates NULL and the row stays out of the violations
    * frame) — deliberately matching the reference's generated range test
    * (`WHERE col < min OR col > max` keeps NULL rows out too) and the q11
    * oracle; this differs from [[Expectations]]' constraint semantics
    * (NULL = violation), where the reference differs the same way. Nulls
    * are the [[completeness]] test's domain. */
  def range(df: DataFrame, column: String, min: Any, max: Any): DataFrame =
    df.filter(!(col(column) >= lit(min) && col(column) <= lit(max)))

  /** Column-level schema diff between two tables — compares `StructType`s
    * directly instead of information_schema (SURVEY §2.4). */
  def schemaMatch(spark: SparkSession, sourceTable: String, referenceTable: String): DataFrame = {
    import spark.implicits._
    def cols(t: String) = spark.table(t).schema.fields.map(f => (f.name, f.dataType.simpleString))
    val s = cols(sourceTable).toSeq.toDF("column_name", "source_type")
    val r = cols(referenceTable).toSeq.toDF("column_name", "reference_type")
    s.join(r, Seq("column_name"), "full_outer")
      .withColumn("status",
        when(col("source_type").isNull, lit("missing_in_source"))
          .when(col("reference_type").isNull, lit("extra_in_source"))
          .when(col("source_type") =!= col("reference_type"), lit("type_mismatch"))
          .otherwise(lit("match")))
      .filter(col("status") =!= "match")
  }

  /** Source rows whose lookup columns are absent from the lookup table. */
  def allLookupsFound(source: DataFrame, lookup: DataFrame,
      lookupCols: Seq[String], lookupRefCols: Seq[String]): DataFrame =
    referentialIntegrity(source, lookup, lookupCols, lookupRefCols)

  /** Arbitrary SQL producing violation rows. */
  def customSql(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** `SELECT * FROM source` + expectation rules: returns violating rows. */
  def customExpectations(df: DataFrame, rules: Seq[Expectations.Rule]): DataFrame =
    Expectations.quarantine(df, rules)
}
