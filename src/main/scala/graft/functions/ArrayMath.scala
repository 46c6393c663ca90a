package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, sqrt, when}
import org.apache.spark.sql.graftnative.ArrayMathBridge

/** Column-level entry points for the native array math (see
  * [[org.apache.spark.sql.graftnative.DotProduct]] for the codegen'd
  * Catalyst expression and the rationale). */
object ArrayMath {
  /** Dot product of two `array<double>` columns (codegen'd, sequential sum). */
  def dot(a: Column, b: Column): Column = ArrayMathBridge.dotColumn(a, b)

  /** L2 norm via the same kernel. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity from precomputed norms — NULL when either norm is
    * 0: a zero-norm vector has no direction, the bare division THROWS
    * under ANSI mode (Spark 4 default), and pre-ANSI it yielded NaN,
    * which desc-sorts above every real cosine. A NULL cosine fails every
    * `>= threshold` filter, so degenerate rows simply have no neighbors
    * (the [[graft.similarity.Similarity]] convention). */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(dot(a, b) / (na * nb))
}
