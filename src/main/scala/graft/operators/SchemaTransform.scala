package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema transform: column renames, type casts, and strict/permissive
  * enforcement (reference: src/lhp/generators/transform/schema.py:18-119,
  * templates/transform/schema.py.j2:10-47).
  *
  * All three steps are pure projections — Catalyst collapses them into the
  * scan's ReadSchema, so at 100 TB this costs nothing beyond the columns
  * actually kept.
  */
object SchemaTransform {

  sealed trait Enforcement
  /** Select exactly the declared columns (plus any present operational
    * metadata columns, which are prefixed `_`). */
  case object Strict extends Enforcement
  /** Keep all columns; renames/casts applied where declared. */
  case object Permissive extends Enforcement

  final case class Spec(
      renames: Map[String, String] = Map.empty,       // old -> new
      casts: Map[String, String] = Map.empty,          // new name -> Spark SQL type
      declared: Seq[String] = Seq.empty,               // declared output columns
      enforcement: Enforcement = Permissive)

  def apply(df: DataFrame, spec: Spec): DataFrame = {
    // withColumnsRenamed silently no-ops on a missing source column — the
    // reference's generated withColumnRenamed does the same, so staying
    // lenient is faithful, but a typo'd rename should at least be VISIBLE
    // (the declared-schema/cast error it causes downstream points at the
    // wrong step)
    spec.renames.keys.filterNot(df.columns.contains).foreach(c =>
      graft.Log.warn(s"schema transform: rename source column '$c' is not " +
        s"in the input (columns: ${df.columns.mkString(", ")}) — the " +
        "rename is a no-op"))
    val renamed = df.withColumnsRenamed(spec.renames)
    val casted = spec.casts.foldLeft(renamed) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
    spec.enforcement match {
      case Permissive => casted
      case Strict =>
        val meta = casted.columns.filter(c => c.startsWith("_") && !spec.declared.contains(c))
        casted.select((spec.declared ++ meta).map(col): _*)
    }
  }
}
