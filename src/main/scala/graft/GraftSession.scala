package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * The settings encode the 100 TB posture (see SURVEY §7 / builder notes):
  *   - AQE on (runtime shuffle-partition coalescing, broadcast-join demotion/
  *     promotion, skew-join splitting) — the knob that makes one static
  *     `shuffle.partitions` value survive a 1000× data-size range.
  *   - `maxPartitionBytes` 128 MiB — scan tasks sized for executor memory.
  *   - shuffle partitions default to the core count locally; on a cluster
  *     callers pass ~2-3× total executor cores and AQE coalesces down.
  *   - nanosAsLong for parquet TIMESTAMP(NANOS) inputs (TESTDATA events).
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      master match {
        case s if s.startsWith("local[") && !s.contains("*") =>
          s.stripPrefix("local[").stripSuffix("]").toInt
        case _ => 200
      })
    SparkSession.builder()
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def create(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]"): SparkSession =
    builder(master).getOrCreate()
}
