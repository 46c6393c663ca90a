package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSessionExtensions

import graft.exec.TableStore

class GraftExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("extension injects graft_dot; callable from SQL") {
    // verify the extension wires a function builder into the registry
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // and that the same builder evaluates correctly through SQL in the
    // session registry (shared test session predates extension config)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      children => org.apache.spark.sql.graftnative.DotProduct(children.head, children(1)),
      "built-in")
    Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").as[Double].head() == 11.0)
    assert(spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(5.0d,5.0d)) AS d")
      .as[Double].head() == 15.0)
  }

  test("extension injects the range-join optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // the builder buffer is private — reflect the field and run the
    // builders against the shared session
    val f = classOf[SparkSessionExtensions].getDeclaredFields
      .find(_.getName.contains("optimizerRules")).get
    f.setAccessible(true)
    val builders = f.get(ext)
      .asInstanceOf[scala.collection.mutable.Buffer[
        org.apache.spark.sql.SparkSession => AnyRef]]
    val rules = builders.map(_.apply(spark))
    assert(rules.exists(_.isInstanceOf[graft.plan.RangeJoinRewrite]),
      s"RangeJoinRewrite not injected; got: ${rules.map(_.getClass.getSimpleName)}")
  }

  test("TableStore sandbox name mapping prefixes physical paths") {
    val wh = Files.createTempDirectory("sandbox-wh").toString
    val store = new TableStore(spark, wh, nameMap = t => s"dev_$t")
    store.overwrite("orders", Seq(1, 2).toDF("x"))
    assert(new java.io.File(s"$wh/dev_orders").exists())
    assert(store.read("orders").count() == 2) // logical name still works
  }
}
