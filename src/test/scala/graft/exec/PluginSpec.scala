package graft.exec

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.config.YamlConfig

/** Plugin classes loaded reflectively by class name (the reference's
  * python-function load/transform surface). */
class RangeSource extends SourceFunction {
  def apply(spark: SparkSession, parameters: Map[String, Any]): DataFrame =
    spark.range(parameters.get("n").map(_.toString.toLong).getOrElse(5L)).toDF("id")
}

class DoubleIt extends TransformFunction {
  def apply(inputs: Seq[DataFrame], spark: SparkSession, parameters: Map[String, Any]): DataFrame =
    inputs.head.withColumn("doubled", col("id") * 2)
}

class PluginSpec extends SparkSuite {
  import spark.implicits._

  test("function load + transform plugins resolve by class name from YAML") {
    val dir = Files.createTempDirectory("plugin").toString
    val store = new TableStore(spark, s"$dir/wh")
    val runner = new PipelineRunner(spark, store, s"$dir/cp")
    runner.run(YamlConfig.parseFlowGroup(
      """pipeline: p
        |flowgroup: f
        |actions:
        |  - name: l
        |    type: load
        |    source: {type: function, function: graft.exec.RangeSource, parameters: {n: 4}}
        |    target: v_in
        |  - name: t
        |    type: transform
        |    transform_type: function
        |    source: v_in
        |    function: graft.exec.DoubleIt
        |    target: v_out
        |  - name: w
        |    type: write
        |    source: v_out
        |    write_target: {type: materialized_view, table: plugin_out}
        |""".stripMargin))
    val out = store.read("plugin_out").select("id", "doubled")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L)))
  }
}
