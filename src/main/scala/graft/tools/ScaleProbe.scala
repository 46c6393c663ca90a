package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: replicate the `documents` fixture K× (unique ids,
  * per-replica text perturbation so replicas are NOT near-duplicates of each
  * other) and time the scan-heaviest operators at 1× and K×. Complements the
  * per-round bench: the sf0.01→sf0.1 ratios are overhead-dominated (median
  * 1.14× for 10× data), so this probe pushes the two worst-ratio operators
  * another 10× to confirm the data-linear regime before anything ships to a
  * real cluster.
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe [reps]"` (default 10) with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")

    // ids offset per replica (dedup semantics need uniqueness); text gets a
    // per-replica suffix so the replicas aren't one giant near-dup cluster —
    // THAT would measure pathological candidate density, not scale
    def corpus(k: Int): DataFrame =
      (0 until k).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text")))
        .reduce(_ unionByName _)

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)

    println(f"""{"probe":"t6_d2_linearity","sf":"$sfDir","reps":$reps}""")
    for (k <- Seq(1, reps)) {
      val c = corpus(k).persist()
      c.count() // materialize outside the timed region
      val t6 = med(time(graft.text.TextAnalysis.repetition(c, "doc_id", "text", n = 2)))
      val d2 = med(time(graft.dedup.Dedup.ngramJaccard(c, "doc_id", "text",
        n = 3, threshold = 0.6)))
      println(f"""{"k":$k,"rows":${c.count()},"t6_repetition":$t6%.2f,"d2_ngram_jaccard":$d2%.2f}""")
      c.unpersist(): Unit
    }
    spark.stop()
  }
}
