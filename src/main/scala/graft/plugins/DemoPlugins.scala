package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-shaped function plugins (generators/load/python.py:12,
  * generators/transform/python.py:14 — user code looked up by name and
  * invoked with (spark, parameters)). These two ship in the engine jar so
  * the plugin DISPATCH path itself is oracle-gated end-to-end (c4): a real
  * deployment registers its own classes the same way. */
final class ParquetTableSource extends graft.exec.SourceFunction {
  def apply(spark: SparkSession, parameters: Map[String, Any]): DataFrame =
    spark.read.parquet(parameters.getOrElse("path",
      throw graft.config.YamlConfig.ConfigError(
        "ParquetTableSource: missing 'path' parameter")).toString)
}

/** 1-ary transform: adds `net_price = o_totalprice * (1 - rate)`. One
  * double multiply so the DuckDB oracle reproduces it bit-exactly. */
final class NetRevenueTransform extends graft.exec.TransformFunction {
  def apply(inputs: Seq[DataFrame], spark: SparkSession,
      parameters: Map[String, Any]): DataFrame = {
    val rate = parameters.get("rate").map(_.toString.toDouble).getOrElse(0.05)
    inputs.head.withColumn("net_price", col("o_totalprice") * lit(1.0 - rate))
  }
}
