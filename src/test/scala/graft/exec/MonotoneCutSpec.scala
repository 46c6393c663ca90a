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

  test("runtime floating rounding: tight-envelope chains get magnitude-scaled slack") {
    // The r16 slack was relative to the BOUND (1e-9·|bound0| + 1e-9) — but
    // the runtime f is evaluated in float/double, whose per-row error
    // scales with the INTERMEDIATE magnitudes. Two concrete exposures the
    // original fixture's small residuals (% 5, % 7) never reached:
    //
    // (a) float cast of a ~2^30 integral pivot inside a MULTI-OP chain
    //     whose result is double: the float ulp at 2^30 is 128, so
    //     float(n) rounds n ∈ [G−64, G+64] onto the grid point
    //     G = 2^30 − 256 — up to +64 of f-space error — while the DOUBLE
    //     result type puts the cut on a grid ~2.4e-7 fine (a single-op
    //     all-float chain can never jump a cut cell; the double tail makes
    //     the error span thousands of them). Cut placed at
    //     C = 2·(G−1) + 1e9: rows n ∈ [G−32, G−4] have runtime
    //     f = 2G + 1e9 = C + 2 (in the suffix) but exact f ≤ C − 8, so
    //     the old bound-relative slack (~1.07 on bound0 = G−1) derived
    //     `n ≥ G−3` and DROPPED all of them. The magnitude-scaled float
    //     budget (≈ 6.3e9·2^-20/2 ≈ 3000) must keep them.
    val G = 1073741568L // 2^30 − 256, a float grid point (ulp 64 in this binade)
    val floatDf = ((G - 70 to G + 5) ++
        Seq(0L, -5L, Long.MaxValue, Long.MinValue))
      .map(l => (0.0, l, l)).toDF("value", "n", "user_id")
    val fSqlF = "cast(n as float) * 2 + 1e9"
    val (fF, outF) = {
      val analyzed = floatDf.select(expr(fSqlF).as("f"))
        .queryExecution.analyzed
      val f = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      (f, analyzed.children.head.outputSet)
    }
    val cF = 2.0 * (G - 1) + 1e9 // 3147483134.0, exact in double
    val conjF = GlobalWindowMv.cutColumnFor(fF, cF, true, false, outF)
    assert(conjF.nonEmpty, "float-cast affine chain left the grammar")
    // float ulp in [2^29, 2^30) is 64, so n ∈ [G−32, G−1] round up to G —
    // ~29 of them sit below the old G−3 bound: the rows the old slack drops
    val suffixF = floatDf.filter(expr(fSqlF) > lit(cF))
    assert(suffixF.filter(col("n") < G - 3 && col("n") > 0).count() >= 25,
      "fixture regressed: the rounded-up rows stopped reaching the runtime suffix")
    val droppedF = suffixF.filter(!conjF.get)
    assert(droppedF.isEmpty,
      "float-cast rounding pushed runtime-suffix rows past the conjunct:\n" +
        droppedF.limit(5).collect().mkString("\n"))
    //
    // (b) double chain with a large TIGHT constant offset: near the cut
    //     C ≈ 3e9 the intermediates are ~1e9-scale, so fl(value + 1e9)
    //     carries up to ulp(1e9)/2 ≈ 1.2e-7 of error — 100× the old
    //     1e-9-relative slack at bound0 = 1/3. Values packed 1e-9 apart
    //     just below the bound probe the window.
    val dblDf = ((-80 to 80).map(i => 1.0 / 3 + i * 1e-9) ++
        Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
          0.0, 1e308, -1e308))
      .map(d => (d, 0L, 0L)).toDF("value", "n", "user_id")
    val (fD, outD) = {
      val analyzed = dblDf.select(expr("(value + 1e9) * 3").as("f"))
        .queryExecution.analyzed
      val f = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      (f, analyzed.children.head.outputSet)
    }
    val cD = 3.000000001e9
    val conjD = GlobalWindowMv.cutColumnFor(fD, cD, true, false, outD)
    assert(conjD.nonEmpty, "double affine chain left the grammar")
    val droppedD = dblDf
      .filter(expr("(value + 1e9) * 3") > lit(cD) && !conjD.get)
    assert(droppedD.isEmpty,
      "double rounding pushed runtime-suffix rows past the conjunct:\n" +
        droppedD.limit(5).collect().mkString("\n"))
  }

  test("envelope CANCELLATION does not hide interior magnitudes from the slack") {
    // (value + 1e12) − 1e12 has a FINAL envelope of zero (lo = hi = 0 after
    // the subtract), but at runtime the add quantizes value onto 1e12's
    // ulp grid (2^-13 ≈ 1.2e-4 near 100) — a K-sized interior magnitude a
    // final-envelope-only slack never sees. The trailing *3 carries the
    // quantized value off the cut's own grid, so rows BELOW the exact
    // bound round UP into the runtime suffix: with g = 100 − 2^-13 (a
    // grid point) and C = 3·(g − 2^-16), every x in [g − 2^-14, C/3)
    // quantizes to g, giving runtime f = 3g = C + 3·2^-16 > C while
    // x < C/3 − (old slack ~1e-7). The magnitude-max slack
    // (~1e12·2^-45/3 ≈ 0.01 in pivot space) must keep them.
    val g = 100.0 - math.pow(2, -13)
    val cC = 3.0 * (g - math.pow(2, -16))
    val xs = ((-40 to 40).map(i => g + i * 1e-6) ++
      Seq(0.0, -5.0, 1e308, -1e308, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity))
    val cancelDf = xs.map(d => (d, 0L, 0L)).toDF("value", "n", "user_id")
    val fSql = "(value + 1e12 - 1e12) * 3"
    val (fC, outC) = {
      val analyzed = cancelDf.select(expr(fSql).as("f")).queryExecution.analyzed
      val f = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      (f, analyzed.children.head.outputSet)
    }
    val conjC = GlobalWindowMv.cutColumnFor(fC, cC, true, false, outC)
    assert(conjC.nonEmpty, "cancelling affine chain left the grammar")
    val suffixC = cancelDf.filter(expr(fSql) > lit(cC))
    // fixture health: the quantized-up rows (x below the exact bound C/3,
    // runtime f above the cut) must exist, else the test pins nothing
    assert(suffixC.filter(col("value") < cC / 3 - 1e-6).count() >= 5,
      "fixture regressed: no quantized-up rows below the exact bound reach " +
        "the runtime suffix")
    val droppedC = suffixC.filter(!conjC.get)
    assert(droppedC.isEmpty,
      "interior-magnitude rounding pushed runtime-suffix rows past the conjunct:\n" +
        droppedC.limit(5).collect().mkString("\n"))
  }

  test("pivot AT typeMin: the wrap guard must cover |typeMin| = typeMax + 1") {
    // found by MonotoneCutPropertySpec (seed 20260816): `0 - n` wraps at
    // n = Long.MinValue (−Long.MinValue = Long.MinValue), but the guard
    // used to be DROPPED whenever the cap reached typeMax — and
    // |Long.MinValue| = typeMax + 1 sits just past it. Descending cut at
    // 0: the wrapped row has runtime f = Long.MinValue < 0 (in the
    // suffix) while exact f = +2^63 would be far above any lower bound —
    // without the guard the conjunct `n >= -1` drops it.
    val (f, out) = resolved("0 - n")
    val conj = GlobalWindowMv.cutColumnFor(f, 0L, false, false, out)
    assert(conj.nonEmpty, "0 - n left the grammar")
    val minRow = df.filter(col("n") === Long.MinValue &&
      expr("0 - n") < lit(0L) && !conj.get)
    assert(df.filter(col("n") === Long.MinValue).count() > 0,
      "fixture lost its Long.MinValue row")
    assert(minRow.isEmpty,
      "n = Long.MinValue wrapped past the guard and was dropped:\n" +
        minRow.limit(5).collect().mkString("\n"))
    // and the general differential over the same shape
    checkSound("0 - n", asc = false, Seq[Any](-100L, -7L, 0L, 11L, 90L))
  }

  test("float rounding can wrap an integral node just below an exact-envelope cap") {
    // r18 review bite: the wrap cap solved |a|·M + maxB <= typeMax over
    // the EXACT envelope, but the runtime value runs up to E(|x|) hotter.
    // At x ≈ 2^62 a long→double cast's half-ulp is 512: for
    // f = floor(cast(n as double)) * 2, x = 2^62 − 100 casts UP to 2^62,
    // so runtime f = 2^63 wraps to Long.MinValue while exact
    // f = 2^63 − 200 sits inside the exact cap M = (2^63−1)/2. Descending
    // cut at 0: the wrapped row (f_rt < 0) is IN the suffix, and the
    // E-blind guard left it to the upper-bound conjunct, which dropped
    // it. The E-inflated constraint shrinks M by exactly the cast's
    // half-ulp, so the guard keeps every row the rounding can wrap.
    val cap = Long.MaxValue / 2 // 2^62 − 1 (exact-envelope cap, pre-fix)
    val ns: Seq[java.lang.Long] =
      ((-512L to 512L by 64L).map(d => cap - 100L + d) ++ // straddle the cap
        Seq(0L, -5L, 1000L, -cap + 100L, Long.MaxValue, Long.MinValue))
        .map(java.lang.Long.valueOf) :+ (null: java.lang.Long)
    val wrapDf = ns.map(l => (0.0, l, l)).toDF("value", "n", "user_id")
    val fSql = "floor(cast(n as double)) * 2"
    val (fW, outW) = {
      val analyzed = wrapDf.select(expr(fSql).as("f")).queryExecution.analyzed
      val f = analyzed.asInstanceOf[Project].projectList.head
        .asInstanceOf[Alias].child
      (f, analyzed.children.head.outputSet)
    }
    val conjW = GlobalWindowMv.cutColumnFor(fW, 0L, false, false, outW)
    assert(conjW.nonEmpty, "floor(cast)*2 left the grammar")
    val suffixW = wrapDf.filter(expr(fSql) < lit(0L))
    // fixture health: rows that WRAP at runtime while sitting inside the
    // pre-fix exact cap must exist, else the test pins nothing
    assert(suffixW.filter(col("n") > 0 && col("n") <= cap).count() >= 3,
      "fixture regressed: no runtime-wrapped rows inside the exact cap " +
        "reach the descending suffix")
    val droppedW = suffixW.filter(!conjW.get)
    assert(droppedW.isEmpty,
      "runtime wrap below the exact-envelope cap escaped the guard:\n" +
        droppedW.limit(5).collect().mkString("\n"))
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
