package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operational metadata columns — auto-injectable audit columns matching the
  * reference's default catalog (core/codegen/operational_metadata/
  * metadata.py:28-54): `_ingestion_timestamp`, `_source_file` (loads only),
  * `_pipeline_run_id`, `_pipeline_name`, `_flowgroup_name`, plus arbitrary
  * project-defined expression columns (metadata.py:100-119).
  *
  * Every column carries an `applies_to` target-type scope
  * (models/_operational_metadata.py MetadataColumnConfig): `view` (load /
  * transform outputs), `streaming_table`, `materialized_view`. A selected
  * column whose scope excludes the target is filtered, not injected — the
  * reference default for PROJECT-defined columns is the two WRITE types
  * only, so a custom column must opt into `view` explicitly (the reference
  * example projects do exactly that for their `_source_file_path`).
  *
  * `input_file_name()` is `_metadata.file_path` on Spark 4 file sources.
  * Pure projections — zero cost beyond the bytes written.
  */
object OperationalMetadata {

  /** Project-defined column config (reference MetadataColumnConfig):
    * `expression` in Spark SQL (the loader translates the manifest's
    * PySpark spelling), `applies_to` scope, `enabled` kill-switch.
    * `description` / `additional_imports` are manifest-documentation /
    * codegen-only fields with no runtime effect. */
  final case class ColumnDef(
      expression: String,
      appliesTo: Set[String] = Set("streaming_table", "materialized_view"),
      enabled: Boolean = true)

  val TargetTypes: Set[String] =
    Set("view", "streaming_table", "materialized_view")
  private val AllTargets = TargetTypes

  final case class Context(
      pipelineName: String,
      flowgroupName: String,
      runId: String,
      isFileLoad: Boolean = false,
      /** Which applies_to scope this injection site is: loads/transforms
        * produce `view`, writes their table kind. */
      targetType: String = "view")

  /** The columns available at this context's target type; `custom`
    * adds/overrides with project-defined [[ColumnDef]]s. */
  def columns(ctx: Context,
      custom: Map[String, ColumnDef] = Map.empty): Map[String, Column] = {
    val base: Map[String, (Column, Set[String])] = Map(
      "_ingestion_timestamp" -> (current_timestamp(), AllTargets),
      "_pipeline_run_id" -> (lit(ctx.runId), AllTargets),
      "_pipeline_name" -> (lit(ctx.pipelineName), AllTargets),
      "_flowgroup_name" -> (lit(ctx.flowgroupName), AllTargets)) ++
      // `_source_file` is view-scoped in the reference catalog AND only
      // materializable where a `_metadata` struct exists (file loads)
      (if (ctx.isFileLoad)
        Map("_source_file" -> ((col("_metadata.file_path"), Set("view"))))
      else Map.empty)
    val customCols = custom.collect {
      case (name, d) if d.enabled => name -> ((expr(d.expression), d.appliesTo))
    }
    (base ++ customCols).collect {
      case (name, (c, scope)) if scope.contains(ctx.targetType) => name -> c
    }
  }

  def inject(df: DataFrame, ctx: Context,
      custom: Map[String, ColumnDef] = Map.empty,
      select: Seq[String] = Nil): DataFrame = {
    val cols = columns(ctx, custom)
    val chosen = if (select.nonEmpty) cols.view.filterKeys(select.contains).toMap else cols
    chosen.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }
  }
}
