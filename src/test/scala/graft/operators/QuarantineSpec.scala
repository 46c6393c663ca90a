package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.exec.TableStore

class QuarantineSpec extends SparkSuite {
  import spark.implicits._

  private val rules = Seq(
    Expectations.Rule("positive", "v > 0", Expectations.Drop))

  test("full DLQ cycle: route -> fix -> recycle -> union") {
    val store = new TableStore(spark, Files.createTempDirectory("q-wh").toString + "/wh")
    val src = Seq((1, 10), (2, -5), (3, -7)).toDF("id", "v")

    // 1. route: clean passes, violations land in the DLQ
    val clean = Quarantine.routeViolations(store, "dlq", src, rules, "src")
    assert(clean.select("id").as[Int].collect().toSet == Set(1))
    val dlq0 = store.read("dlq")
    assert(dlq0.count() == 2 && dlq0.filter(col(Quarantine.StatusCol) === "quarantined").count() == 2)

    // 2. re-routing the same violations does not duplicate DLQ rows
    Quarantine.routeViolations(store, "dlq", src, rules, "src").count()
    assert(store.read("dlq").count() == 2)

    // 3. operator fixes row id=2 (v -> 50) and flips status to 'fixed'
    val fixed = store.read("dlq").withColumn("v",
        when(col("id") === 2, lit(50)).otherwise(col("v")))
      .withColumn(Quarantine.StatusCol,
        when(col("id") === 2, lit("fixed")).otherwise(col(Quarantine.StatusCol)))
    store.replace("dlq", fixed)

    // 4. recycle: the fixed row passes re-validation and returns
    val recycled = Quarantine.recycle(store, "dlq", Seq("id", "v"), rules)
    assert(recycled.select("id", "v").as[(Int, Int)].collect().toSet == Set((2, 50)))
    val statuses = store.read("dlq").select("id", Quarantine.StatusCol)
      .as[(Int, String)].collect().toMap
    assert(statuses == Map(2 -> "recycled", 3 -> "quarantined"))

    // 5. final view = clean ∪ recycled
    val out = Quarantine.cleanWithRecycled(clean.select("id", "v"), recycled)
    assert(out.select("id").as[Int].collect().toSet == Set(1, 2))

    // 6. a still-broken fix does not recycle
    val brokenFix = store.read("dlq").withColumn(Quarantine.StatusCol,
      when(col("id") === 3, lit("fixed")).otherwise(col(Quarantine.StatusCol)))
    store.replace("dlq", brokenFix)
    assert(Quarantine.recycle(store, "dlq", Seq("id", "v"), rules).isEmpty)
  }
}
