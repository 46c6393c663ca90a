package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.exec.TableStore

class WarehouseCatalogSpec extends SparkSuite {
  import spark.implicits._

  test("three-part SQL resolves through the warehouse catalog with pushdown") {
    val wh = Files.createTempDirectory("whcat").toString + "/wh"
    val store = new TableStore(spark, wh)
    store.overwrite("edw_bronze.customer",
      Seq((1L, "ada", "NY"), (2L, "bob", "SF"), (3L, "eve", "NY"))
        .toDF("id", "name", "city"))

    spark.conf.set("spark.sql.catalog.acme_cat",
      "org.apache.spark.sql.graftnative.WarehouseCatalog")
    spark.conf.set("spark.sql.catalog.acme_cat.warehouse", wh)

    val out = spark.sql(
      "SELECT name FROM acme_cat.edw_bronze.customer WHERE city = 'NY' ORDER BY id")
    assert(out.as[String].collect().toSeq == Seq("ada", "eve"))

    // filter/projection reach the parquet scan (V2 ParquetTable pushdown)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("city"))

    // catalog surface: SHOW TABLES / SHOW NAMESPACES work
    assert(spark.sql("SHOW NAMESPACES IN acme_cat").as[String].collect()
      .toSeq.contains("edw_bronze"))
    assert(spark.sql("SHOW TABLES IN acme_cat.edw_bronze")
      .select("tableName").as[String].collect().toSeq == Seq("customer"))

    // unknown table is a clear analysis error
    val e = intercept[Exception](spark.sql("SELECT 1 FROM acme_cat.edw_bronze.nope").collect())
    assert(e.getMessage.contains("nope") || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))

    // the catalog is read-only: writes are rejected, the pipeline store owns them
    val w = intercept[Exception](
      Seq(1).toDF("x").write.saveAsTable("acme_cat.edw_bronze.newtbl"))
    assert(w.getMessage.toLowerCase.contains("read-only"))
  }
}
