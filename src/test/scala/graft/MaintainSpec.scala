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
}
