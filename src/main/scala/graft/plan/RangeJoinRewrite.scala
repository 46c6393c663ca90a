package graft.plan

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite an inequality-only INNER join that
  * bounds one side's column between two columns of the other side — the
  * shape Spark can only plan as a BroadcastNestedLoopJoin / cartesian
  * product — into the bucketed equi-join [[graft.operators.RangeJoin]]
  * builds by hand (the logical rewrite behind Databricks' range-join
  * optimization, here as an open `Rule[LogicalPlan]`):
  *
  * {{{ point JOIN interval ON p >= s AND p <= e }}}
  * becomes
  * {{{
  *   Project(original output)
  *     Filter(p >= s AND p <= e)                      // exact residual
  *       Join(..., __graft_bucket = __graft_bucket)   // hash-partitionable
  *         Project(point.*,  floor(p/w) AS __graft_bucket)
  *         Generate(explode(sequence(floor(s/w), floor(e/w))), interval.*)
  * }}}
  *
  * The point row lives in exactly ONE bucket, so each qualifying pair meets
  * exactly once — no dedup. A reversed interval (s > e) yields a descending
  * candidate sequence whose extra rows the residual filter removes, and
  * null bounds yield a null sequence (no rows) — both matching the original
  * join's semantics exactly.
  *
  * OPT-IN: active only when `spark.graft.rangeJoin.bucketWidth` is set to a
  * positive double (units of the point column's double cast — epoch seconds
  * for timestamps; [[graft.operators.RangeJoin.inferBucketWidth]] samples
  * interval lengths to pick one). Scoped deliberately narrowly: INNER
  * joins — plus LEFT/RIGHT OUTER joins whose point side is the preserved
  * side (the SCD2 temporal-join shape `fact LEFT JOIN dim ON ts BETWEEN
  * start AND end`); for those the exact residual moves INSIDE the join
  * condition so null-extension survives, and a point row's single bucket
  * keeps the null-extension exactly-once — whose condition contains NO
  * equi-predicate (`=` or `<=>`; with one, Spark already plans a hash join
  * and this rewrite would only add work) and whose range columns are
  * integral/decimal numerics or timestamps. Bounds may be strict or
  * inclusive (`<`/`<=` in any mix — the residual keeps the original
  * strictness). A NULL-OPEN upper bound (`p < e OR e IS NULL`, SCD2's
  * current-version rows) is NOT rewritten — an unbounded interval has no
  * enumerable bucket range; close it with a sentinel JUST PAST the point
  * domain's maximum (`coalesce(end, <max point time + 1>)`) to opt such a
  * join in. Keep the sentinel tight: every current-version row explodes
  * over `(sentinel - start) / width` buckets, and a far-future sentinel
  * (year 9999) would trip Sequence's max-length guard — or worse, pay it. Float/double range columns
  * are deliberately EXCLUDED: Spark orders NaN above every value, so
  * `p <= NaN` is true in the original join, and a NaN bound's bucket
  * range cannot be enumerated — rewriting would silently drop those
  * pairs. Cast to a non-NaN domain (decimal, long, timestamp) to opt in.
  *
  * The conf is session-scoped, so it applies to EVERY qualifying join
  * while set — set it around the intended query (`spark.conf.set` /
  * `unset`). An interval spanning more than Spark's max array length in
  * buckets fails LOUDLY at runtime (Sequence's length check) rather than
  * silently truncating; size the width to the data it is enabled for.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  val BucketCol = "__graft_bucket"
  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  // `conf` (SQLConfHelper) resolves the ACTIVE thread-local SQLConf per
  // query — a constructor-captured session conf would miss thread-local
  // overrides and leave the rule dormant despite the key being set
  private def width: Option[Double] =
    conf.getConfString(WidthKey, "").toDoubleOption.filter(_ > 0)

  private def rangeCastable(e: Expression): Boolean = e.dataType match {
    // NO float/double: NaN sorts above everything in the original join's
    // comparison but has no enumerable bucket — see the class doc
    case org.apache.spark.sql.types.FloatType | DoubleType => false
    case _: org.apache.spark.sql.types.NumericType => true
    case TimestampType => true
    case _ => false
  }

  /** `a ≤ b` (or strictly `a < b`) as the canonical orientation of any of
    * the four comparisons. Strict bounds bucket identically — `s < p`
    * still implies `bucket(s) <= bucket(p)` since floor is monotone — and
    * the residual keeps the ORIGINAL strictness, so `<` vs `<=` exactness
    * is untouched (the acmi SCD2 shape uses `>= start AND < end`). */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case LessThan(a, b) => Some((a, b))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, jt @ (Inner | LeftOuter | RightOuter), Some(cond), hint)
          if j.resolved && cond.collectFirst {
            case a: Attribute if a.name == BucketCol => a }.isEmpty =>
        val parts = splitConjunctivePredicates(cond)
        // EqualNullSafe counts too: Spark's ExtractEquiJoinKeys plans `<=>`
        // as a hash join already, so rewriting would only add explode cost.
        // BOTH sides must reference a real column: a literal equality
        // (`region = 'EU'`) has one EMPTY reference set, which subsets
        // everything — counting it as an equi key suppressed the rewrite
        // while Spark still planned the nested loop this rule exists to fix
        def crossSides(a: Expression, b: Expression): Boolean =
          a.references.nonEmpty && b.references.nonEmpty &&
            ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
        val hasEqui = parts.exists {
          case EqualTo(a, b) => crossSides(a, b)
          case EqualNullSafe(a, b) => crossSides(a, b)
          case _ => false
        }
        // candidate range pair: lower `s <= p` and upper `p <= e` on the
        // same single-side expression p, with s and e both from the other
        val les = parts.flatMap(asLe)
        def sideOf(e: Expression): Option[Boolean] = // true = left
          if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
          else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
          else None
        val rewrite = if (hasEqui) None else (for {
          (s, p1) <- les
          (p2, e) <- les
          if p1.semanticEquals(p2)
          pSide <- sideOf(p1); sSide <- sideOf(s); eSide <- sideOf(e)
          if sSide == eSide && sSide != pSide
          if rangeCastable(p1) && rangeCastable(s) && rangeCastable(e)
          // OUTER joins rewrite only when the POINT side is the PRESERVED
          // side: the interval side explodes over its buckets, and an
          // exploded copy of a preserved row would null-extend once per
          // copy. A point row lives in exactly one bucket, so preserving
          // the point side null-extends exactly once — the original outer
          // semantics. (The SCD2 temporal-join shape — fact LEFT JOIN dim
          // ON ts BETWEEN start AND end — is exactly LeftOuter + point
          // left, the BNLJ the reference's gld revenue_by_region_mv.sql
          // hits.)
          if (jt == Inner) || (jt == LeftOuter && pSide) || (jt == RightOuter && !pSide)
        } yield (p1, s, e, pSide)).headOption
        rewrite match {
          case None => j
          case Some((p, s, e, pointIsLeft)) =>
            val tz = Some(conf.sessionLocalTimeZone)
            def bucketOf(x: Expression): Expression =
              Floor(Divide(Cast(x, DoubleType, tz), Literal(w)))
            val (pointPlan, intervalPlan) = if (pointIsLeft) (left, right) else (right, left)
            val pBucket = Alias(bucketOf(p), BucketCol)()
            val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)
            val seq = new Sequence(bucketOf(s), bucketOf(e), None, tz)
            val genOut = AttributeReference(BucketCol, LongType, nullable = true)()
            val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(genOut), child = intervalPlan)
            val bucketEq = EqualTo(pBucket.toAttribute, genOut)
            jt match {
              case Inner =>
                // a side-specific hint must follow its relation across the swap
                val hint2 = if (pointIsLeft) hint
                  else org.apache.spark.sql.catalyst.plans.logical.JoinHint(
                    hint.rightHint, hint.leftHint)
                val joined = Join(pointProj, gen, Inner, Some(bucketEq), hint2)
                // residual: the ORIGINAL condition, exact to the type's precision
                Project(j.output, Filter(cond, joined))
              case _ =>
                // outer: the exact residual must live INSIDE the join
                // condition — a post-filter would drop the null-extended
                // rows the outer join exists to keep. Spark's
                // ExtractEquiJoinKeys peels the bucket equality as the hash
                // key and carries the original condition as the non-equi
                // residual, so this still plans as a hash/sort-merge join.
                // No side swap happens here (the point side is already the
                // preserved side), so the hint rides along unchanged.
                val (l2, r2) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
                Project(j.output, Join(l2, r2, jt, Some(And(bucketEq, cond)), hint))
            }
        }
    }
  }
}
