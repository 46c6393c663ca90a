package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Monitoring: union N pipeline event logs into one table — the runtime of
  * the reference's generated monitoring notebook
  * (core/coordination/monitoring_pipeline_builder.py:177-266,
  * templates/monitoring/union_event_logs.py.j2:1-50): one independent
  * checkpointed stream per source, all appending to a single table.
  */
object Monitoring {

  /** Batch union of event-log directories with a source tag. */
  def unionEventLogs(spark: SparkSession, logs: Map[String, String]): DataFrame =
    logs.map { case (pipeline, path) =>
      spark.read.parquet(path).withColumn("_pipeline", lit(pipeline))
    }.reduce(_ unionByName (_, allowMissingColumns = true))

  /** Streaming variant: one AvailableNow flow per source into `targetPath`,
    * each with its own checkpoint (per-stream checkpoints, as the reference
    * generates). Serialized per-table to respect the one-writer discipline. */
  def streamEventLogs(spark: SparkSession, logs: Map[String, String],
      targetPath: String, checkpointRoot: String): Unit =
    logs.foreach { case (pipeline, path) =>
      val schema = spark.read.parquet(path).schema
      spark.readStream.schema(schema).parquet(path)
        .withColumn("_pipeline", lit(pipeline))
        .writeStream
        .format("parquet")
        .option("path", targetPath)
        .option("checkpointLocation", s"$checkpointRoot/monitor_$pipeline")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
}
