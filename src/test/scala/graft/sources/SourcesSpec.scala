package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.config.SchemaParser
import graft.streaming.Monitoring

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  test("DataSource V2 custom source reads partitioned synthetic rows") {
    val df = spark.read.format("graft.sources.v2.SyntheticSource")
      .option("rows", "100").option("partitions", "5").load()
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.columns.toSeq == Seq("id", "bucket", "payload"))
    assert(df.filter($"bucket" === 3).count() == 10)
  }

  test("schema parser maps the reference type vocabulary") {
    val doc = SchemaParser.parse(
      """name: customer
        |version: "1"
        |columns:
        |  - {name: c_custkey, type: BIGINT, nullable: false}
        |  - {name: c_acctbal, type: "DECIMAL(18,2)"}
        |  - {name: weird type, type: SOMETHING}
        |primary_key: [c_custkey]
        |""".stripMargin)
    assert(doc.schema.fields(0).dataType.typeName == "long" && !doc.schema.fields(0).nullable)
    assert(doc.schema.fields(1).dataType.simpleString == "decimal(18,2)")
    assert(doc.schema.fields(2).dataType.typeName == "string") // lenient fallback
    assert(doc.primaryKey == Seq("c_custkey"))
    val hints = SchemaParser.hints(doc.schema)
    assert(hints == "c_custkey BIGINT NOT NULL, c_acctbal DECIMAL(18,2), `weird type` STRING")
  }

  test("monitoring unions event logs with pipeline tags") {
    val d1 = Files.createTempDirectory("log1").toString
    val d2 = Files.createTempDirectory("log2").toString
    Seq(("start", 1L)).toDF("event", "ts").write.mode("overwrite").parquet(d1)
    Seq(("stop", 2L), ("start", 3L)).toDF("event", "ts").write.mode("overwrite").parquet(d2)
    val u = Monitoring.unionEventLogs(spark, Map("p1" -> d1, "p2" -> d2))
    assert(u.count() == 3)
    assert(u.filter($"_pipeline" === "p2").count() == 2)
  }
}
