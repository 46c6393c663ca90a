package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operational metadata columns — auto-injectable audit columns matching the
  * reference's default catalog (core/codegen/operational_metadata/
  * metadata.py:28-54): `_ingestion_timestamp`, `_source_file` (loads only),
  * `_pipeline_run_id`, `_pipeline_name`, `_flowgroup_name`, plus arbitrary
  * project-defined expression columns (metadata.py:100-119).
  *
  * `input_file_name()` is `_metadata.file_path` on Spark 4 file sources.
  * Pure projections — zero cost beyond the bytes written.
  */
object OperationalMetadata {

  final case class Context(
      pipelineName: String,
      flowgroupName: String,
      runId: String,
      isFileLoad: Boolean = false)

  /** The default column catalog; `custom` adds/overrides with arbitrary
    * Spark SQL expressions (strings). */
  def columns(ctx: Context, custom: Map[String, String] = Map.empty): Map[String, Column] = {
    val base = Map(
      "_ingestion_timestamp" -> current_timestamp(),
      "_pipeline_run_id" -> lit(ctx.runId),
      "_pipeline_name" -> lit(ctx.pipelineName),
      "_flowgroup_name" -> lit(ctx.flowgroupName)) ++
      (if (ctx.isFileLoad) Map("_source_file" -> col("_metadata.file_path")) else Map.empty)
    base ++ custom.map { case (k, v) => k -> expr(v) }
  }

  def inject(df: DataFrame, ctx: Context, custom: Map[String, String] = Map.empty,
      select: Seq[String] = Nil): DataFrame = {
    val cols = columns(ctx, custom)
    val chosen = if (select.nonEmpty) cols.view.filterKeys(select.contains).toMap else cols
    chosen.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }
}
