package graft.operators

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("one-pass profile: rows, nulls, distincts, native-order min/max") {
    val df = Seq(
      (1L, Some("b"), 10.5), (2L, None, 2.0), (3L, Some("a"), 10.5))
      .toDF("id", "s", "v")
    val p = Profile.describe(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(p("id") == (("id", 3L, 0L, 3L, Some("1"), Some("3"))))
    assert(p("s") == (("s", 3L, 1L, 2L, Some("a"), Some("b"))))
    // native numeric order: 2.0 < 10.5 (a string-ordered profile would say "10.5" < "2.0")
    assert(p("v") == (("v", 3L, 0L, 2L, Some("2.0"), Some("10.5"))))
  }

  test("approx mode profiles without a distinct expand; guards are loud") {
    val df = (1L to 1000L).toDF("id")
    val approx = Profile.describe(df, Seq("id"), exact = false)
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - 1000L) <= 50L) // rsd 0.01, 5-sigma slack
    intercept[IllegalArgumentException] { Profile.describe(df, Nil) }
    intercept[IllegalArgumentException] { Profile.describe(df, Seq("nope")) }
  }
}
