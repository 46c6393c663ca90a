package graft.operators

import graft.SparkSuite
import Expectations._

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq((1, 10), (2, -5), (3, 200), (4, 50)).toDF("id", "v")

  test("drop keeps only rows passing all drop rules") {
    val rules = Seq(Rule("pos", "v > 0", Drop), Rule("small", "v <= 100", Drop))
    val out = Expectations.dropViolations(df, rules).select("id").as[Int].collect().toSet
    assert(out == Set(1, 4))
  }

  test("null predicate counts as violation") {
    val d = Seq((1, Some(10)), (2, None)).toDF("id", "v")
    val out = Expectations.dropViolations(d, Seq(Rule("pos", "v > 0", Drop)))
      .select("id").as[Int].collect().toSet
    assert(out == Set(1))
  }

  test("fail throws with violation count") {
    val rules = Seq(Rule("pos", "v > 0", Fail))
    val e = intercept[ExpectationViolation](Expectations.failViolations(df, rules))
    assert(e.rule == "pos" && e.count == 1)
  }

  test("warn observes metrics without filtering") {
    val rules = Seq(Rule("small", "v <= 100", Warn))
    val observed = Expectations.observeWarnings(df, rules, "obs1")
    assert(observed.count() == 4) // nothing dropped; metric collected on action
  }

  test("quarantine annotates failed rules") {
    val rules = Seq(Rule("pos", "v > 0", Drop), Rule("small", "v <= 100", Drop))
    val q = Expectations.quarantine(df, rules)
      .selectExpr("id", "array_join(_failed_rules, ',')").as[(Int, String)].collect().toMap
    assert(q == Map(2 -> "pos", 3 -> "small"))
  }
}
