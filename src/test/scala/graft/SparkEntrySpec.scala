package graft

class SparkEntrySpec extends SparkSuite {
  test("driver contract: entry returns rows; every query has a runnable plan") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every oracle key has a matching query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every query at least analyzes at sf0.001 (cheap: schema resolution)
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf0001).schema.fields.nonEmpty, s"$name produced empty schema")
    }
  }
}
