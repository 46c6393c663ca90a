package graft

import java.nio.file.Files

import graft.exec.TableStore

class MaintainSpec extends SparkSuite {
  import spark.implicits._

  test("listTables finds flat, partitioned, and schema-qualified tables only") {
    val wh = Files.createTempDirectory("graft-maint").toString + "/wh"
    val store = new TableStore(spark, wh)
    store.overwrite("flat", Seq((1, "a")).toDF("k", "v"))
    store.overwrite("part", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    store.overwrite("bronze.events", Seq((1, "a")).toDF("k", "v"))
    // internal dirs must not be listed
    new java.io.File(s"$wh/.staging/x").mkdirs()
    new java.io.File(s"$wh/_sinks/y").mkdirs()
    assert(Maintain.listTables(wh).toSet == Set("flat", "part", "bronze.events"))
  }

  test("compact with zorder strategy re-clusters and round-trips the data") {
    val wh = Files.createTempDirectory("graft-maintz").toString + "/wh"
    val store = new TableStore(spark, wh)
    val rows = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
    // write fragmented (many small files)
    store.overwrite("grid", rows.toDF("x", "y").repartition(16))
    store.compact("grid", targetBytesPerFile = 1024L * 1024 * 1024,
      sortBy = Seq("x", "y"), strategy = "zorder")
    val out = store.read("grid")
    assert(out.select("x", "y").as[(Long, Long)].collect().toSet == rows.toSet)
    // compacted toward the byte target: a single file for this tiny table
    def files(dir: java.io.File): Int =
      Option(dir.listFiles()).getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files(new java.io.File(store.path("grid"))) == 1)
  }
}
