package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftnative.ArrayMathBridge

/** Column-level entry points for the native array math (see
  * [[org.apache.spark.sql.graftnative.DotProduct]] for the codegen'd
  * Catalyst expression and the rationale). */
object ArrayMath {
  /** Dot product of two `array<double>` columns (codegen'd, sequential sum). */
  def dot(a: Column, b: Column): Column = ArrayMathBridge.dotColumn(a, b)

  /** L2 norm via the same kernel. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity from precomputed norms. */
  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
