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

  test("rescue-aware recycle re-projects typed columns from the repaired raw record") {
    val store = new TableStore(spark, Files.createTempDirectory("q-wh2").toString + "/wh")
    val rescueRules = Seq(
      Expectations.Rule("parsed", "_rescued_data IS NULL", Expectations.Fail))
    // a malformed record: typed cols null, raw payload in _rescued_data
    val src = Seq(
      (Some(1L), Some("ok"), None: Option[String]),
      (None: Option[Long], None: Option[String], Some("""{"id": "oops", "v": "bad"}""")))
      .toDF("id", "v", "_rescued_data")
    val clean = Quarantine.routeViolations(store, "dlq", src, rescueRules, "src")
    assert(clean.count() == 1)
    assert(store.read("dlq").count() == 1)

    // operator repairs the RAW record (id was unparseable -> corrected JSON)
    val fixed = store.read("dlq")
      .withColumn("_rescued_data", lit("""{"id": 2, "v": "bad"}"""))
      .withColumn(Quarantine.StatusCol, lit("fixed"))
    store.replace("dlq", fixed)

    // recycle parses the repaired payload back into the typed schema,
    // clears the consumed rescue column, and re-validation passes
    val recycled = Quarantine.recycle(store, "dlq",
      Seq("id", "v", "_rescued_data"), rescueRules, rescueCol = Some("_rescued_data"))
    val rows = recycled.select("id", "v").as[(Long, String)].collect().toSeq
    assert(rows == Seq((2L, "bad")))
    assert(recycled.filter("_rescued_data IS NULL").count() == 1)

    // an unparseable "fix" stays quarantined
    val broken = store.read("dlq")
      .withColumn("_rescued_data", lit("not json at all"))
      .withColumn(Quarantine.StatusCol, lit("fixed"))
      .withColumn("id", lit(null).cast("bigint"))
    store.replace("dlq", broken)
    assert(Quarantine.recycle(store, "dlq",
      Seq("id", "v", "_rescued_data"), rescueRules, Some("_rescued_data")).isEmpty)
  }

  test("csv-sourced DLQ recycles via from_csv (a csv payload never re-parses as json)") {
    val store = new TableStore(spark, Files.createTempDirectory("q-wh3").toString + "/wh")
    val rescueRules = Seq(
      Expectations.Rule("parsed", "_rescued_data IS NULL", Expectations.Fail))
    // the rescue payload captured by the CSV load path is a raw CSV LINE
    val src = Seq(
      (Some(1L), Some("ok"), None: Option[String]),
      (None: Option[Long], None: Option[String], Some("oops,bad")))
      .toDF("id", "v", "_rescued_data")
    assert(Quarantine.routeViolations(store, "dlq", src, rescueRules, "src").count() == 1)

    // operator repairs the raw CSV line in place
    store.replace("dlq", store.read("dlq")
      .withColumn("_rescued_data", lit("2,bad"))
      .withColumn(Quarantine.StatusCol, lit("fixed")))

    // the json-mode recycle can NEVER repair it — the row would silently
    // stay quarantined forever (the round-4 ADVICE finding)
    assert(Quarantine.recycle(store, "dlq",
      Seq("id", "v", "_rescued_data"), rescueRules, Some("_rescued_data")).isEmpty)

    // csv-mode recycle re-projects positionally and clears the payload
    val recycled = Quarantine.recycle(store, "dlq",
      Seq("id", "v", "_rescued_data"), rescueRules, Some("_rescued_data"),
      rescueFormat = "csv")
    assert(recycled.select("id", "v").as[(Long, String)].collect().toSeq == Seq((2L, "bad")))
    assert(recycled.filter("_rescued_data IS NULL").count() == 1)

    // an unknown payload format is loud, not a silent non-recycle
    intercept[IllegalArgumentException] {
      Quarantine.recycle(store, "dlq", Seq("id", "v", "_rescued_data"),
        rescueRules, Some("_rescued_data"), rescueFormat = "xml")
    }
  }

  test("csv recycle honors the load's parse options (non-default delimiter)") {
    val store = new TableStore(spark, Files.createTempDirectory("q-wh4").toString + "/wh")
    val rescueRules = Seq(
      Expectations.Rule("parsed", "_rescued_data IS NULL", Expectations.Fail))
    val src = Seq((None: Option[Long], None: Option[String], Some("oops|bad")))
      .toDF("id", "v", "_rescued_data")
    Quarantine.routeViolations(store, "dlq", src, rescueRules, "src").count()
    store.replace("dlq", store.read("dlq")
      .withColumn("_rescued_data", lit("2|bad"))
      .withColumn(Quarantine.StatusCol, lit("fixed")))
    // default-dialect parse can never repair a pipe-delimited payload
    assert(Quarantine.recycle(store, "dlq", Seq("id", "v", "_rescued_data"),
      rescueRules, Some("_rescued_data"), rescueFormat = "csv").isEmpty)
    val recycled = Quarantine.recycle(store, "dlq", Seq("id", "v", "_rescued_data"),
      rescueRules, Some("_rescued_data"), rescueFormat = "csv",
      rescueOptions = Map("sep" -> "|"))
    assert(recycled.select("id", "v").as[(Long, String)].collect().toSeq == Seq((2L, "bad")))
  }
}
