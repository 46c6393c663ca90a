package graft.operators

import graft.SparkSuite

class DataTestsSpec extends SparkSuite {
  import spark.implicits._

  test("rowCount flags count mismatch beyond tolerance") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(1, 2).toDF("x")
    assert(DataTests.rowCount(a, b).count() == 1)
    assert(DataTests.rowCount(a, b, tolerance = 1).count() == 0)
  }

  test("uniqueness finds duplicate groups") {
    val d = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val dups = DataTests.uniqueness(d, Seq("k")).as[(Int, Long)].collect().toSet
    assert(dups == Set((1, 2L)))
  }

  test("referentialIntegrity returns orphans") {
    val src = Seq((1, "x"), (9, "y")).toDF("fk", "v")
    val ref = Seq(1, 2).toDF("pk")
    val orphans = DataTests.referentialIntegrity(src, ref, Seq("fk"), Seq("pk"))
      .select("fk").as[Int].collect().toSeq
    assert(orphans == Seq(9))
  }

  test("completeness returns rows with nulls") {
    val d = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None))
      .toDF("a", "b")
    assert(DataTests.completeness(d, Seq("a", "b")).count() == 2)
  }

  test("range returns out-of-bounds rows") {
    val d = Seq(1, 5, 11).toDF("v")
    assert(DataTests.range(d, "v", 1, 10).as[Int].collect().toSeq == Seq(11))
  }

  test("schemaMatch diffs column types") {
    Seq((1, "a")).toDF("id", "x").createOrReplaceTempView("sm_src")
    Seq((1L, "a")).toDF("id", "x").createOrReplaceTempView("sm_ref")
    val diff = DataTests.schemaMatch(spark, "sm_src", "sm_ref")
      .select("column_name", "status").as[(String, String)].collect().toSet
    assert(diff == Set(("id", "type_mismatch")))
  }
}
