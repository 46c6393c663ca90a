package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Task-side filesystem opener: the Hadoop `Configuration` is not
  * serializable, so Spark's own file sources broadcast it wrapped in
  * `SerializableConfiguration` (`private[spark]` — hence this bridge,
  * the same package-access seam as [[PlanBridge]]). Construct on the
  * driver, use `open(path)` inside task closures — the wrapper itself is
  * serializable and carries only the broadcast handle. */
final class FsInput(@transient spark: SparkSession) extends Serializable {
  private val bc = spark.sparkContext.broadcast(
    new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))

  def open(path: String): java.io.InputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(bc.value.value).open(p)
  }
}
