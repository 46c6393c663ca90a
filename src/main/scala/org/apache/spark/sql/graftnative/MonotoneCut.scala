package org.apache.spark.sql.graftnative

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Scan-pruning conjunct derivation for COMPUTED global-window ORDER BY
  * keys (the q67-class residue): the suffix cut `f(cols) > C` filters on
  * the synthetic `_w0` value, which pushes through deterministic Projects
  * but stops at the parquet scan — the scan reads every row group even
  * when the suffix only touches the bottom of the order. When `f` has the
  * common leaderboard shape
  *
  *     f  ∈  [ a·x + lo ,  a·x + hi ]      (a ≠ 0, all non-null rows)
  *
  * — affine in ONE pivot column `x` plus statically BOUNDED residuals
  * (`score * 2`, `floor(value)`, `floor(value)*3 + user_id % 5`, …) — the
  * cut implies a one-sided range on the bare column `x`, which parquet
  * row-group statistics can prune. [[derive]] produces that implication.
  *
  * SOUNDNESS — the conjunct is NOT advisory: it feeds the same
  * summary/rewrite row set as the bucket filter, so an over-tight bound
  * would silently drop suffix rows. The invariants:
  *
  *   - Direction: an ascending cut (`f > C`) solves against the UPPER
  *     envelope — `a·x + hi ≥ f > C` keeps every row that can possibly
  *     satisfy the cut; descending (`f < C`) uses the lower envelope.
  *   - Rounding: all arithmetic runs in 40-digit decimal; the final bound
  *     is loosened by max(relative+absolute 1e-9 of the bound,
  *     magnitude-scaled runtime budget) and rounded in the LOOSE direction
  *     per pivot type (floor for a lower bound, ceil for an upper; two
  *     extra ULPs on the decimal→floating conversion). The magnitude term
  *     exists because the RUNTIME f is floating arithmetic whose per-row
  *     error scales with the intermediates (≈ envelope + cut magnitude),
  *     not with the bound: a float cast of a ~2^30 pivot is off by up to
  *     64 in f-space while a bound-relative slack is ~1 — a multi-op
  *     chain (where the error spans more than one ULP of the cut's own
  *     grid) would drop rows the runtime cut keeps. Budget: eps ×
  *     max(|C|, |rhs|, max over ALL chain nodes of |a_node|·|bound0| +
  *     max|b_node|) / |a|, with eps = 2^-20 when any FloatType node
  *     appears, 2^-45 for double-only chains, none for pure-integral
  *     chains (exact inside the wrap cap). Interior node magnitudes
  *     matter because envelopes CANCEL: (x + 1e12) − 1e12 has a zero
  *     final envelope but rounds x onto 1e12's ulp grid at runtime.
  *   - Nulls: every accepted op is null-strict, so `f IS NULL` implies a
  *     referenced column is null; the caller ORs `IS NULL` over
  *     [[Cut.nullKeep]] whenever the null bucket lives in the suffix
  *     (nulls-last), mirroring the plain-key twin. DecimalType is
  *     REJECTED everywhere — decimal overflow yields null from non-null
  *     inputs, which the is-null chain cannot see.
  *   - NaN: a NaN pivot makes `f` NaN, which sorts LARGEST. Lower-bound
  *     conjuncts keep NaN rows (NaN compares greater than any bound); an
  *     upper-bound conjunct would drop them, so upper bounds are emitted
  *     only for integral pivots (no NaN). Infinities follow the same
  *     case split and are safe under lower bounds by direct check.
  *   - Integer wrap: the envelope describes EXACT arithmetic; integral
  *     ops wrap silently in non-ANSI mode. Every node's magnitude is
  *     itself affine in |x| (|node| ≤ |a|·|x| + max|lo,hi|), so a cap `M`
  *     with |a|·M + max|b| ≤ typeMax at every integral node guarantees
  *     exactness for |x| ≤ M; the caller ORs `|x| > M` ([[Cut.wrapCap]])
  *     so rows outside the proven-exact domain are always KEPT, never
  *     reasoned about. Remainder/pmod nodes bound their result whatever
  *     the child did, so their subtrees contribute no constraints. When
  *     `M` covers the pivot type's whole range the guard is dropped.
  *
  * Anything outside the grammar (two non-constant factors, sqrt/abs,
  * decimals, a second pivot) returns None — those keys keep the
  * documented stops-at-the-Project posture. */
object MonotoneCut {

  private val MC = new MathContext(40, RoundingMode.HALF_EVEN)
  private val Slack = new JBD("1e-9")
  // Per-chain runtime rounding budget: the envelope is EXACT arithmetic,
  // but the runtime f is evaluated in float/double per row, so a row's
  // f_runtime can exceed f_exact by ~(per-op ulp) × (intermediate
  // magnitude) × ops. That error scales with the RESIDUAL envelope and
  // cut magnitude, not with the bound — when they dwarf |bound0|, a
  // relative-to-bound slack is orders of magnitude too small and the
  // derived conjunct can drop a row the runtime cut keeps
  // (MonotoneCutSpec's "runtime floating rounding" case demonstrates it).
  // Budget: float 2^-20 (per-op 2^-24, 16-op headroom) / double 2^-45
  // (per-op 2^-53, 256-op headroom); pure-integral chains are exact
  // inside the wrap cap and need no floating budget at all.
  private val EpsFloatChain = new JBD(java.lang.Math.pow(2, -20)) // exact
  private val EpsDoubleChain = new JBD(java.lang.Math.pow(2, -45)) // exact

  /** e ∈ [a·pivot + lo, a·pivot + hi]; pivot None means a = 0 (a pure
    * constant interval). */
  private final case class Iv(pivot: Option[AttributeReference],
      a: JBD, lo: JBD, hi: JBD) {
    def maxAbsB: JBD = lo.abs.max(hi.abs)
  }

  /** The derived conjunct, abstract of Column construction. */
  final case class Cut(
      pivot: AttributeReference,
      /** true = `pivot >= bound` (lower bound), false = `pivot <= bound` */
      lower: Boolean,
      /** loose-rounded exact-decimal bound; the caller types the literal
        * (with its own loose rounding per pivot type) */
      bound: JBD,
      /** columns whose IS NULL must keep the row when the null bucket is
        * in the suffix */
      nullKeep: Seq[AttributeReference],
      /** |pivot| above this may wrap an integral intermediate — such rows
        * must be kept unconditionally; None = exact everywhere */
      wrapCap: Option[JBD])

  private def bd(v: Any): Option[JBD] = v match {
    case null => None
    case i: java.lang.Integer => Some(JBD.valueOf(i.longValue))
    case l: java.lang.Long => Some(JBD.valueOf(l))
    case s: java.lang.Short => Some(JBD.valueOf(s.longValue))
    case b: java.lang.Byte => Some(JBD.valueOf(b.longValue))
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None else Some(new JBD(f.toString))
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None else Some(JBD.valueOf(d.doubleValue))
    case d: Decimal => Some(d.toJavaBigDecimal)
    case _ => None
  }

  /** Numeric and NOT decimal. */
  private def okType(dt: DataType): Boolean = dt match {
    case _: DecimalType => false
    case _: NumericType => true
    case _ => false
  }

  private def typeMax(dt: DataType): Option[JBD] = dt match {
    case ByteType => Some(JBD.valueOf(Byte.MaxValue.toLong))
    case ShortType => Some(JBD.valueOf(Short.MaxValue.toLong))
    case IntegerType => Some(JBD.valueOf(Int.MaxValue.toLong))
    case LongType => Some(JBD.valueOf(Long.MaxValue))
    case _ => None // doubles/floats saturate to ±Inf, never wrap
  }

  /** Per-derivation accumulators: `cons` = integral-node wrap constraints
    * (|a|, max|b|, typeMax); `mags` = EVERY accepted node's (|a|, max|b|)
    * — the runtime-slack bound must see interior magnitudes, because
    * envelopes CANCEL ((x + K) − K has a final envelope of zero while the
    * runtime intermediate is K-sized and rounds on K's ulp grid). */
  private final class Acc {
    val cons = ArrayBuffer.empty[(JBD, JBD, JBD)]
    val mags = ArrayBuffer.empty[(JBD, JBD)]
  }

  /** Envelope analysis; constraints/magnitudes accumulate into `acc`. */
  private def analyze(e: Expression, acc: Acc): Option[Iv] = {
    if (!okType(e.dataType)) return None
    val iv: Option[Iv] =
      if (e.foldable)
        bd(scala.util.Try(e.eval(null)).getOrElse(null))
          .map(v => Iv(None, JBD.ZERO, v, v))
      else e match {
        case ar: AttributeReference =>
          Some(Iv(Some(ar), JBD.ONE, JBD.ZERO, JBD.ZERO))
        case Add(l, r, _) => bin(l, r, acc) { (a, b) =>
          Iv(a.pivot.orElse(b.pivot), a.a.add(b.a, MC),
            a.lo.add(b.lo, MC), a.hi.add(b.hi, MC))
        }
        case Subtract(l, r, _) => bin(l, r, acc) { (a, b) =>
          Iv(a.pivot.orElse(b.pivot), a.a.subtract(b.a, MC),
            a.lo.subtract(b.hi, MC), a.hi.subtract(b.lo, MC))
        }
        case UnaryMinus(c, _) => analyze(c, acc).map(i =>
          Iv(i.pivot, i.a.negate, i.hi.negate, i.lo.negate))
        case Multiply(l, r, _) =>
          def scale(k: JBD, i: Iv): Iv = {
            val (x, y) = (k.multiply(i.lo, MC), k.multiply(i.hi, MC))
            Iv(i.pivot, k.multiply(i.a, MC), x.min(y), x.max(y))
          }
          (analyze(l, acc), analyze(r, acc)) match {
            case (Some(Iv(None, _, klo, khi)), Some(ri)) if klo == khi =>
              Some(scale(klo, ri))
            case (Some(li), Some(Iv(None, _, klo, khi))) if klo == khi =>
              Some(scale(klo, li))
            case _ => None
          }
        case Divide(l, r, _) => divIv(l, r, acc, widen = JBD.ZERO)
        case IntegralDivide(l, r, _) => divIv(l, r, acc, widen = JBD.ONE)
        case f: Floor => analyze(f.child, acc).map(i =>
          Iv(i.pivot, i.a, i.lo.subtract(JBD.ONE), i.hi))
        case c: Ceil => analyze(c.child, acc).map(i =>
          Iv(i.pivot, i.a, i.lo, i.hi.add(JBD.ONE)))
        // result bounded by the modulus WHATEVER the child evaluated to
        // (even a wrapped child) — no recursion into the child's
        // envelope, no child wrap constraints. The child must still be
        // NULL-STRICT: a hidden `a / col` nulling at col = 0 would route
        // rows to the null bucket with no null INPUT column, and the
        // is-null keep chain could not see them.
        // INTEGRAL results only: a floating remainder propagates a NaN
        // from a NON-pivot column into f, where no pivot-side comparison
        // or guard can see it — the one way a bounded residual can lie
        case Pmod(c, k, _)
            if e.dataType.isInstanceOf[IntegralType] && nullStrict(c) =>
          constVal(k).filter(_.signum != 0).map(kk =>
            Iv(None, JBD.ZERO, JBD.ZERO, kk.abs))
        case Remainder(c, k, _)
            if e.dataType.isInstanceOf[IntegralType] && nullStrict(c) =>
          constVal(k).filter(_.signum != 0).map(kk =>
            Iv(None, JBD.ZERO, kk.abs.negate, kk.abs))
        case c: Cast if okType(c.child.dataType) =>
          // value-preserving-enough casts only: integral widenings are
          // exact; →double/float rounds within relative 2^-24, covered by
          // the final slack. Narrowing integral casts wrap — rejected.
          val ok = (c.child.dataType, c.dataType) match {
            case (a: IntegralType, b: IntegralType) =>
              a.defaultSize <= b.defaultSize
            case (_: IntegralType, DoubleType | FloatType) => true
            case (FloatType, DoubleType | FloatType) => true
            case (DoubleType, DoubleType) => true
            case _ => false
          }
          if (ok) analyze(c.child, acc) else None
        case _ => None
      }
    // magnitude record for EVERY accepted node; wrap constraint for the
    // integral-typed ones
    for (i <- iv) {
      acc.mags += ((i.a.abs, i.maxAbsB))
      typeMax(e.dataType).foreach(tm => acc.cons += ((i.a.abs, i.maxAbsB, tm)))
    }
    iv
  }

  private def bin(l: Expression, r: Expression,
      acc: Acc)(f: (Iv, Iv) => Iv): Option[Iv] =
    for {
      li <- analyze(l, acc); ri <- analyze(r, acc)
      m <- (li.pivot, ri.pivot) match {
        case (Some(p), Some(q)) if p.exprId != q.exprId => None // two pivots
        case _ => Some(f(li, ri))
      }
    } yield m

  /** Conservative null-strictness: true only when `e` provably nulls ONLY
    * on a null column input — so `f IS NULL` always has an IS NULL
    * witness among the referenced columns. Decimal ARITHMETIC overflow
    * nulls from non-null inputs (bare decimal refs are fine); non-decimal
    * integral arithmetic wraps rather than nulls (wrap is acceptable
    * here — remainder/pmod bound their result whatever the child wrapped
    * to); division/modulus by a zero or null literal nulls
    * unconditionally. Anything unrecognized → false. */
  private def nullStrict(e: Expression): Boolean = {
    def divisorOk(k: Expression): Boolean = constVal(k).exists(_.signum != 0)
    e match {
      case _: AttributeReference => true
      case l: Literal => l.value != null
      case Add(l, r, _) => okType(e.dataType) && nullStrict(l) && nullStrict(r)
      case Subtract(l, r, _) => okType(e.dataType) && nullStrict(l) && nullStrict(r)
      case Multiply(l, r, _) => okType(e.dataType) && nullStrict(l) && nullStrict(r)
      case UnaryMinus(c, _) => okType(e.dataType) && nullStrict(c)
      case f: Floor => nullStrict(f.child)
      case c: Ceil => nullStrict(c.child)
      case Divide(l, k, _) =>
        okType(e.dataType) && divisorOk(k) && nullStrict(l)
      case IntegralDivide(l, k, _) =>
        okType(e.dataType) && divisorOk(k) && nullStrict(l)
      case Pmod(l, k, _) => divisorOk(k) && nullStrict(l)
      case Remainder(l, k, _) => divisorOk(k) && nullStrict(l)
      case c: Cast => okType(c.dataType) && okType(c.child.dataType) &&
        nullStrict(c.child)
      case _ => false
    }
  }

  /** A FOLDABLE numeric expression's value (literals, casts of literals) —
    * the analyzer rarely leaves a bare Literal: `% 5` arrives as
    * `cast(5 as bigint)`. */
  private def constVal(e: Expression): Option[JBD] =
    if (e.foldable && okType(e.dataType))
      bd(scala.util.Try(e.eval(null)).getOrElse(null))
    else None

  private def divIv(l: Expression, r: Expression,
      acc: Acc, widen: JBD): Option[Iv] =
    (analyze(l, acc), analyze(r, acc)) match {
      case (Some(li), Some(Iv(None, _, klo, khi)))
          if klo == khi && klo.signum != 0 =>
        val (x, y) = (li.lo.divide(klo, MC), li.hi.divide(klo, MC))
        Some(Iv(li.pivot, li.a.divide(klo, MC),
          x.min(y).subtract(widen), x.max(y).add(widen)))
      case _ => None
    }

  /** Derive the scan conjunct implied by the suffix cut on `f`:
    * ascending order cuts with `f > cutValue`, descending with
    * `f < cutValue` (the [[GlobalWindowMv]] suffix-filter convention).
    * None whenever any soundness condition above fails. */
  def derive(f: Expression, cutValue: Any, asc: Boolean): Option[Cut] = {
    val acc = new Acc
    for {
      iv <- analyze(f, acc)
      pivot <- iv.pivot
      if iv.a.signum != 0 && okType(pivot.dataType)
      c <- bd(cutValue)
      // asc:  a·x + hi ≥ f > C  →  a·x > C − hi
      // desc: a·x + lo ≤ f < C  →  a·x < C − lo
      rhs = if (asc) c.subtract(iv.hi, MC) else c.subtract(iv.lo, MC)
      bound0 = rhs.divide(iv.a, MC)
      // sign of a flips the inequality; `lower` = the conjunct keeps the
      // large side of the pivot domain
      lower = (iv.a.signum > 0) == asc
      // NaN pivots make f NaN (absent Floor/Ceil, whose NaN→0 collapse is
      // kept by the wrap guard — floor forces an integral node, hence a
      // cap, and `NaN > cap` is TRUE under Spark's NaN-sorts-largest), and
      // a NaN f sorts into the LAST ascending bucket — always in an
      // ascending suffix. An ASCENDING upper bound (a < 0) on a floating
      // pivot would drop those rows; descending suffixes never contain
      // the NaN bucket (it sorts first), so desc upper bounds are safe.
      if lower || !asc ||
        !Set[DataType](DoubleType, FloatType)(pivot.dataType)
      // Two slack regimes, take the max:
      //   decimal-arithmetic slack — relative+absolute 1e-9 of the bound,
      //     covering the 40-digit derivation's own division/cast digits;
      //   runtime floating slack — the binding rows sit NEAR the cut,
      //     where every intermediate's magnitude is ≤ ~(|C| + max|lo,hi| +
      //     |rhs|); multiply by the chain's eps budget and divide by |a|
      //     to convert the f-space error bound into pivot space. Rows far
      //     below/above the bound have proportionally larger margins than
      //     errors (both scale with |a·x|), so near-cut is the worst case.
      //   Pure-integral chains (no floating node anywhere) are exact
      //     within the wrap cap — no floating budget.
      chainEps = {
        if (f.exists(_.dataType == FloatType)) Some(EpsFloatChain)
        else if (f.exists(_.dataType == DoubleType)) Some(EpsDoubleChain)
        else None
      }
      fpSlack = chainEps.fold(JBD.ZERO) { eps =>
        // max magnitude any runtime intermediate reaches near the cut:
        // per node, |a_node|·|bound0| + max|b_node| — INTERIOR nodes, not
        // just the final envelope, because envelopes cancel ((x + K) − K
        // is zero-envelope but the runtime add rounds on K's ulp grid and
        // a later multiply carries that error off C's own grid); plus the
        // cut and rhs magnitudes themselves. Per-op error ≤ per-op-ulp ×
        // its result magnitude, and the eps budget carries the op-count
        // headroom, so eps × maxMag bounds the chain.
        val b0 = bound0.abs
        val nodeMax = acc.mags.foldLeft(JBD.ZERO) { case (m, (aAbs, bMax)) =>
          m.max(aAbs.multiply(b0, MC).add(bMax, MC)) }
        c.abs.max(rhs.abs).max(nodeMax)
          .multiply(eps, MC).divide(iv.a.abs, MC)
      }
      slack = bound0.abs.multiply(Slack, MC).add(Slack).max(fpSlack)
      bound = if (lower) bound0.subtract(slack) else bound0.add(slack)
      capOpt <- wrapCapOf(acc.cons, pivot.dataType)
    } yield Cut(pivot, lower, bound,
      f.references.toSeq.collect { case ar: AttributeReference => ar },
      capOpt)
  }

  /** Smallest per-node cap, or None-wrapped variants: Some(None) = exact
    * everywhere (no guard needed); Some(Some(m)) = guard at m; None = no
    * exact domain at all (abort the derivation). */
  private def wrapCapOf(cons: ArrayBuffer[(JBD, JBD, JBD)],
      pivotDt: DataType): Option[Option[JBD]] = {
    val caps = cons.toSeq.flatMap { case (aAbs, maxb, tm) =>
      if (aAbs.signum == 0) None // pivot-independent node: always in range
      else Some(tm.subtract(maxb, MC).divide(aAbs, MC))
    }
    caps.minOption match {
      case None => Some(None)
      case Some(m) if m.signum <= 0 => None // nothing proven exact
      case Some(m) =>
        // guard unnecessary when the cap covers the pivot type's range
        typeMax(pivotDt) match {
          case Some(r) if m.compareTo(r) >= 0 => Some(None)
          case _ => Some(Some(m))
        }
    }
  }
}
