package graft.exec

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.GlobalWindowMv

import graft.SparkSuite

/** Differential soundness for the computed-ORDER-BY scan conjunct
  * ([[org.apache.spark.sql.graftnative.MonotoneCut]]): the derived pivot
  * bound feeds the SAME row set as the suffix filter, so an over-tight
  * bound silently drops suffix rows. The invariant under test, per
  * (expression, direction, cut):
  *
  *     every row the suffix keeps (f cmp C, or f IS NULL under
  *     nulls-last) is also kept by the conjunct
  *
  * over a hostile fixture — NULLs in each column, NaN, ±Infinity, the
  * integer extremes that WRAP the integral intermediates (the wrap-guard
  * path), and dense values straddling every cut. Over-keeping is
  * explicitly fine (the bucket filter still applies downstream); only a
  * dropped suffix row fails. Out-of-grammar shapes must return None. */
class MonotoneCutSpec extends SparkSuite {
  import spark.implicits._

  // Run the differential under NON-ANSI semantics: Spark 4's ANSI default
  // THROWS on integral overflow, so the wrap extremes in the fixture would
  // kill the oracle-side evaluation before they could test the guard. Under
  // ANSI the guard is vacuously safe (a would-wrap row fails the query
  // whether or not the scan pruned, and the guard KEEPS such rows so even
  // the failure semantics survive pruning); under legacy wrap semantics it
  // is load-bearing — which is exactly what this spec exercises.
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.ansi.enabled", "false")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.ansi.enabled")
    super.afterAll()
  }

  // hostile fixture: value (double) and n/user_id (long) with extremes
  private lazy val df = {
    val doubles: Seq[java.lang.Double] =
      Seq[java.lang.Double](Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, null, 0.0, -0.0, 1e308, -1e308,
        3.0000000001e18, -3.1e18) ++
        (-40 until 40).map(i => java.lang.Double.valueOf(i * 0.75))
    val longs: Seq[java.lang.Long] =
      Seq[java.lang.Long](null, Long.MaxValue, Long.MinValue,
        Long.MaxValue / 3, Long.MaxValue / 3 + 1, -Long.MaxValue / 3) ++
        (-40L until 40L).map(java.lang.Long.valueOf)
    val rows = for (d <- doubles; l <- longs) yield (d, l, l)
    rows.toDF("value", "n", "user_id").cache()
  }

  /** Resolve `sqlExpr` against the fixture and return (f, childOutput). */
  private def resolved(sqlExpr: String)
      : (Expression, org.apache.spark.sql.catalyst.expressions.AttributeSet) = {
    val analyzed = df.select(expr(sqlExpr).as("f")).queryExecution.analyzed
    val f = analyzed.asInstanceOf[Project].projectList.head
      .asInstanceOf[Alias].child
    (f, analyzed.children.head.outputSet)
  }

  private def checkSound(sqlExpr: String, asc: Boolean, cuts: Seq[Any],
      nullsFirst: Boolean = false): Unit = {
    val (f, childOut) = resolved(sqlExpr)
    var derivedAtLeastOne = false
    cuts.foreach { c =>
      GlobalWindowMv.cutColumnFor(f, c, asc, nullsFirst, childOut).foreach {
        conjunct =>
          derivedAtLeastOne = true
          val fCol = expr(sqlExpr)
          val cutLit = lit(c)
          val inSuffix0 = if (asc) fCol > cutLit else fCol < cutLit
          val inSuffix =
            if (nullsFirst) inSuffix0 else inSuffix0 || fCol.isNull
          val dropped = df.filter(inSuffix && !conjunct)
          assert(dropped.isEmpty,
            s"'$sqlExpr' (asc=$asc, cut=$c): conjunct dropped suffix rows:\n" +
              dropped.limit(5).collect().mkString("\n"))
      }
    }
    assert(derivedAtLeastOne,
      s"'$sqlExpr' (asc=$asc): no cut derived for any of $cuts — " +
        "the grammar regressed (or the cuts are all out of range)")
  }

  test("q67 shape: floor(value)*3 + user_id % 5 — both directions, wrap-guarded") {
    val cuts = Seq[Any](-50L, -3L, 0L, 7L, 60L)
    checkSound("floor(value) * 3 + user_id % 5", asc = false, cuts)
    checkSound("floor(value) * 3 + user_id % 5", asc = true, cuts)
  }

  test("plain affine shapes over a double pivot") {
    val cuts = Seq[Any](-20.0, -0.5, 0.0, 3.25, 19.0)
    checkSound("value * 2", asc = true, cuts)
    checkSound("value * 2", asc = false, cuts)
    checkSound("value / 4 + 2", asc = false, cuts)
    // negative slope: ascending upper bound on a floating pivot is the
    // NaN-unsafe quadrant — must derive NOTHING there...
    val (fNeg, outNeg) = resolved("2 - value")
    assert(GlobalWindowMv.cutColumnFor(fNeg, 1.0, true, false, outNeg).isEmpty,
      "asc upper bound on a floating pivot must be skipped (NaN rows)")
    // ...but the descending lower bound derives and stays sound
    checkSound("2 - value", asc = false, cuts)
  }

  test("integral pivot: wrap extremes, div, negative slope upper bound") {
    val cuts = Seq[Any](-100L, -7L, 0L, 11L, 90L)
    checkSound("n * 3", asc = true, cuts) // wraps at |n| > Long.Max/3 — guard path
    checkSound("n * 3", asc = false, cuts)
    checkSound("n div 3 + n % 7", asc = true, cuts)
    // a < 0 upper bound is legal for integral pivots (no NaN exists)
    checkSound("0 - n", asc = true, cuts)
  }

  test("casts: widening stays in grammar, narrowing does not") {
    checkSound("cast(n as double) / 7 + 1", asc = false,
      Seq[Any](-5.0, 0.0, 2.5))
    val (f, out) = resolved("cast(value as int) * 2")
    assert(GlobalWindowMv.cutColumnFor(f, 10, true, false, out).isEmpty,
      "narrowing double->int cast wraps — must be out of grammar")
  }

  test("out-of-grammar shapes derive nothing") {
    Seq("value * value", "sqrt(value)", "abs(value)",
      "cast(value as decimal(20,2)) * 2", "value + n", // two pivots
      "greatest(value, 3.0)").foreach { s =>
      val (f, out) = resolved(s)
      assert(GlobalWindowMv.cutColumnFor(f, 5.0, true, false, out).isEmpty &&
        GlobalWindowMv.cutColumnFor(f, 5.0, false, false, out).isEmpty,
        s"'$s' must be out of grammar")
    }
  }

  test("nulls: suffix null-bucket rows survive via the is-null keeps") {
    // rows where user_id is null but value is not (and vice versa) have
    // f IS NULL — under nulls-last they sit in the suffix's null bucket
    // and must be kept by the IS NULL chain, not the pivot comparison
    val (f, out) = resolved("floor(value) * 3 + user_id % 5")
    val conj = GlobalWindowMv.cutColumnFor(f, 1000000L, false, false, out).get
    val nullF = df.filter(expr("floor(value) * 3 + user_id % 5").isNull)
    assert(nullF.count() > 0, "fixture lost its null rows")
    assert(nullF.filter(!conj).isEmpty, "null-f rows dropped by the conjunct")
  }
}
