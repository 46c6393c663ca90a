package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftnative.DotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * functions into the SQL function registry, so YAML SQL transforms can call
  * them directly (`SELECT graft_dot(a, b)`), and the range-join optimizer
  * rewrite ([[graft.plan.RangeJoinRewrite]] — opt-in via
  * `spark.graft.rangeJoin.bucketWidth`). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.plan.RangeJoinRewrite())
  }
}
