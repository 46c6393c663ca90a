package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column bridge to Spark's OWN bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * the `InjectRuntimeFilter` rule plants for runtime row-group pruning,
  * deliberately absent from the public function registry). Same
  * package-access seam as [[ArrayMathExpressions]].
  *
  * The aggregate consumes an XXH64 LONG (hash first — the aggregate
  * accepts long input) and yields the sketch as `binary`; the probe tests
  * a long against that binary. One sketch is a few hundred KB at
  * fpp≈1% for millions of items — driver-collectable metadata, not data. */
object BloomFunctions {

  /** `bloom_filter_agg(xxhash64-long, estimatedItems, numBits)` — build
    * the sketch over a column of 64-bit hashes. */
  def bloomAgg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashed),
      org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** `might_contain(sketchBinary, xxhash64-long)` — false means DEFINITELY
    * absent; true means maybe present (verify exactly). */
  def mightContain(sketch: Column, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(sketch),
      ExpressionUtils.expression(hashed)))
}
