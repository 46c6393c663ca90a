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
  *   - Rounding — COMPOSITIONAL outward-rounded interval arithmetic.
  *     The envelope above describes EXACT arithmetic, but the runtime f
  *     is float/double evaluated per row, so every node's result carries
  *     IEEE rounding that scales with that node's own magnitude — and
  *     envelopes CANCEL ((x + 1e12) − 1e12 has a zero final envelope but
  *     quantizes x onto 1e12's ulp grid), so no final-envelope slack can
  *     be sound. Instead [[analyze]] carries, per node, a runtime error
  *     bound AFFINE IN |x|:  E(|x|) = ea·|x| + eb  with the invariant
  *
  *         runtime value ∈ [a·x + lo − E(|x|), a·x + hi + E(|x|)]
  *
  *     E propagates through each op by that op's own algebra (add: sum;
  *     scale by k: |k|·E plus the constant's own conversion error against
  *     the child envelope; divide: / (|k| − err_k); floor/ceil/pmod:
  *     pass/reset), and every accepted node then widens E outward by its
  *     own rounding:  eps(type) × (|a|·|x| + max|lo,hi| + E)  with
  *     eps = 2^-24 for FloatType results, 2^-53 for DoubleType, 0 for
  *     integral (exact inside the wrap cap) — plus 1e-35 everywhere for
  *     the 40-digit decimal analysis' own digits. Soundness is therefore
  *     BY CONSTRUCTION per node — chain depth, interior magnitude, and
  *     cancellation need no enumerated budgets, and there is no op-count
  *     headroom to exhaust. [[derive]] then solves the relaxed cut
  *     `a·x ± ea·|x| ⋈ rhs` exactly (two candidate roots `rhs/(a±ea)`,
  *     loosest taken; None if ea ≥ |a|), adds a final relative+absolute
  *     1e-9 slack for the derivation's own division digits, and rounds
  *     the bound in the LOOSE direction per pivot type (floor for a lower
  *     bound, ceil for an upper; two extra ULPs on the decimal→floating
  *     literal conversion). Decimal↔binary conversion of constants and of
  *     the cut value itself ([[bd]] goes through shortest-repr strings,
  *     up to half an ulp off the runtime binary value) is covered by the
  *     same per-node eps and an explicit cut-conversion term in rhs.
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
  *   - Integer wrap: integral ops wrap silently in non-ANSI mode. Every
  *     node's RUNTIME magnitude is affine in |x| (|node_rt| ≤
  *     (|a|+ea)·|x| + max|lo,hi| + eb — the E-inflation matters: a
  *     floating ancestor can put the runtime past the exact envelope,
  *     and at 2^62 a cast's half-ulp is 512), so a cap `M` with
  *     (|a|+ea)·M + max|b|+eb ≤ typeMax at every integral node
  *     guarantees no wrap for |x| ≤ M; the caller ORs `|x| > M`
  *     ([[Cut.wrapCap]]) so rows outside the proven-exact domain are
  *     always KEPT, never reasoned about. Remainder/pmod nodes bound
  *     their result whatever the child did, so their subtrees contribute
  *     no constraints. Floor/ceil CLAMP (JLS double→long) rather than
  *     wrap, which stays inside the envelope. The guard is dropped only
  *     when `M` covers the pivot type's whole range INCLUDING typeMin
  *     (|typeMin| = typeMax + 1).
  *
  * Anything outside the grammar (two non-constant factors, sqrt/abs,
  * decimals, a second pivot) returns None — those keys keep the
  * documented stops-at-the-Project posture. */
object MonotoneCut {

  private val MC = new MathContext(40, RoundingMode.HALF_EVEN)
  // error arithmetic rounds AWAY from zero (all error terms are ≥ 0, so
  // UP = outward = sound)
  private val MCU = new MathContext(40, RoundingMode.UP)
  private val Slack = new JBD("1e-9")
  // Per-node runtime rounding: IEEE fl(y) is within eps·|y| of y.
  private val EpsFloat = new JBD(java.lang.Math.pow(2, -24)) // exact
  private val EpsDouble = new JBD(java.lang.Math.pow(2, -53)) // exact
  // The 40-digit decimal analysis itself rounds (HALF_EVEN) — cover every
  // node with a relative 1e-35 (per-op decimal error is ≤ 1e-39 relative;
  // 10^4 headroom costs nothing at these magnitudes).
  private val EpsDecimal = new JBD("1e-35")

  /** e's EXACT value ∈ [a·pivot + lo, a·pivot + hi]; its RUNTIME value is
    * within E(|pivot|) = ea·|pivot| + eb of the exact interval (ea, eb ≥
    * 0). pivot None means a = 0 (a pure constant interval). */
  private final case class Iv(pivot: Option[AttributeReference],
      a: JBD, lo: JBD, hi: JBD, ea: JBD, eb: JBD) {
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

  /** Per-node runtime rounding eps by RESULT type — float/double ops
    * round within eps·|result|; integral ops are exact inside the wrap
    * cap. [[bd]]'s shortest-repr decimal↔binary conversion of a floating
    * constant is within the same eps of the runtime binary value, so the
    * uniform per-node widening covers constants too. */
  private def nodeEps(dt: DataType): JBD = dt match {
    case FloatType => EpsFloat.add(EpsDecimal)
    case DoubleType => EpsDouble.add(EpsDecimal)
    case _ => EpsDecimal
  }

  /** Per-derivation accumulator: integral-node wrap constraints
    * (|a|, max|b|, typeMax). Runtime rounding needs no accumulator — it
    * rides inside each [[Iv]] compositionally. */
  private final class Acc {
    val cons = ArrayBuffer.empty[(JBD, JBD, JBD)]
  }

  /** Envelope + runtime-error analysis; wrap constraints accumulate into
    * `acc`. Each case arm PROPAGATES the children's E through the op's
    * exact algebra; the uniform post-step then widens E outward by the
    * node's own rounding. */
  private def analyze(e: Expression, acc: Acc): Option[Iv] = {
    if (!okType(e.dataType)) return None
    val iv: Option[Iv] =
      if (e.foldable)
        // eval gives the exact runtime constant; conversion error into
        // decimal is covered by the uniform per-node eps below
        bd(scala.util.Try(e.eval(null)).getOrElse(null))
          .map(v => Iv(None, JBD.ZERO, v, v, JBD.ZERO, JBD.ZERO))
      else e match {
        case ar: AttributeReference =>
          // the stored pivot value IS the runtime value — error 0
          Some(Iv(Some(ar), JBD.ONE, JBD.ZERO, JBD.ZERO, JBD.ZERO, JBD.ZERO))
        case Add(l, r, _) => bin(l, r, acc) { (a, b) =>
          Iv(a.pivot.orElse(b.pivot), a.a.add(b.a, MC),
            a.lo.add(b.lo, MC), a.hi.add(b.hi, MC),
            a.ea.add(b.ea, MCU), a.eb.add(b.eb, MCU))
        }
        case Subtract(l, r, _) => bin(l, r, acc) { (a, b) =>
          Iv(a.pivot.orElse(b.pivot), a.a.subtract(b.a, MC),
            a.lo.subtract(b.hi, MC), a.hi.subtract(b.lo, MC),
            a.ea.add(b.ea, MCU), a.eb.add(b.eb, MCU))
        }
        case UnaryMinus(c, _) => analyze(c, acc).map(i =>
          Iv(i.pivot, i.a.negate, i.hi.negate, i.lo.negate, i.ea, i.eb))
        case Multiply(l, r, _) =>
          // runtime: fl(k_bin · child_rt); |k_bin − k_dec| ≤ err_k, so
          //   |k_bin·child_rt − k_dec·child_exact|
          //     ≤ (|k| + err_k)·E_child + err_k·(|a_c|·|x| + maxB_c)
          def scale(k: Iv, i: Iv): Iv = {
            val kv = k.lo // == k.hi
            val (x, y) = (kv.multiply(i.lo, MC), kv.multiply(i.hi, MC))
            val kAbsUp = kv.abs.add(k.eb, MCU)
            Iv(i.pivot, kv.multiply(i.a, MC), x.min(y), x.max(y),
              kAbsUp.multiply(i.ea, MCU).add(k.eb.multiply(i.a.abs, MCU), MCU),
              kAbsUp.multiply(i.eb, MCU).add(k.eb.multiply(i.maxAbsB, MCU), MCU))
          }
          (analyze(l, acc), analyze(r, acc)) match {
            case (Some(ki @ Iv(None, _, klo, khi, _, _)), Some(ri)) if klo == khi =>
              Some(scale(ki, ri))
            case (Some(li), Some(ki @ Iv(None, _, klo, khi, _, _))) if klo == khi =>
              Some(scale(ki, li))
            case _ => None
          }
        case Divide(l, r, _) => divIv(l, r, acc, widen = JBD.ZERO)
        case IntegralDivide(l, r, _) => divIv(l, r, acc, widen = JBD.ONE)
        // floor/ceil: monotone, exact at runtime (double→long CLAMPS, not
        // wraps — clamping stays inside the envelope) — the child's E
        // passes through unchanged, the ±1 widen covers the fraction
        case f: Floor => analyze(f.child, acc).map(i =>
          Iv(i.pivot, i.a, i.lo.subtract(JBD.ONE), i.hi, i.ea, i.eb))
        case c: Ceil => analyze(c.child, acc).map(i =>
          Iv(i.pivot, i.a, i.lo, i.hi.add(JBD.ONE), i.ea, i.eb))
        // result bounded by the modulus WHATEVER the child evaluated to
        // (even a wrapped child) — no recursion into the child's
        // envelope, no child wrap constraints, and the bound is ABSOLUTE
        // so the runtime error resets to zero (integral ops are exact).
        // The child must still be NULL-STRICT: a hidden `a / col` nulling
        // at col = 0 would route rows to the null bucket with no null
        // INPUT column, and the is-null keep chain could not see them.
        // INTEGRAL results only: a floating remainder propagates a NaN
        // from a NON-pivot column into f, where no pivot-side comparison
        // or guard can see it — the one way a bounded residual can lie
        case Pmod(c, k, _)
            if e.dataType.isInstanceOf[IntegralType] && nullStrict(c) =>
          constVal(k).filter(_.signum != 0).map(kk =>
            Iv(None, JBD.ZERO, JBD.ZERO, kk.abs, JBD.ZERO, JBD.ZERO))
        case Remainder(c, k, _)
            if e.dataType.isInstanceOf[IntegralType] && nullStrict(c) =>
          constVal(k).filter(_.signum != 0).map(kk =>
            Iv(None, JBD.ZERO, kk.abs.negate, kk.abs, JBD.ZERO, JBD.ZERO))
        case c: Cast if okType(c.child.dataType) =>
          // value-preserving-enough casts only: integral widenings are
          // exact; →double/float rounds within the target type's eps,
          // applied by the uniform per-node widening below. Narrowing
          // integral casts wrap — rejected.
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
    // uniform outward widening by the node's own rounding:
    //   |fl(y) − y| ≤ eps·|y| ≤ eps·(|a|·|x| + maxAbsB + E_in(|x|))
    // (the incoming E here already includes the op's propagation), plus
    // the wrap constraint for integral-typed nodes. The constraint is
    // E-INFLATED: the cap must bound the RUNTIME value, and a floating
    // ancestor chain (fl(cast(x as double)) feeding a floor feeding long
    // arithmetic) puts the runtime up to E(|x|) past the exact envelope —
    // at 2^62 a cast's half-ulp is 512, enough for `floor(cast(n as
    // double)) * 2` to wrap just BELOW an exact-envelope cap (r18 review;
    // bite-pinned in MonotoneCutSpec). |node_rt| ≤ (|a|+ea)·|x| + maxB+eb.
    iv.map { i =>
      val eps = nodeEps(e.dataType)
      val out = i.copy(
        ea = i.ea.add(eps.multiply(i.a.abs.add(i.ea, MCU), MCU), MCU),
        eb = i.eb.add(eps.multiply(i.maxAbsB.add(i.eb, MCU), MCU), MCU))
      typeMax(e.dataType).foreach(tm =>
        acc.cons += ((out.a.abs.add(out.ea, MCU),
          out.maxAbsB.add(out.eb, MCU), tm)))
      out
    }
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
      case (Some(li), Some(ki @ Iv(None, _, klo, khi, _, _)))
          if klo == khi && klo.signum != 0 =>
        // runtime: fl(child_rt / k_bin); |k_bin| ≥ |k| − err_k =: kLo
        // (must stay positive), and |1/k_bin − 1/k_dec| ≤ err_k/(|k|·kLo)
        val kLo = klo.abs.subtract(ki.eb)
        if (kLo.signum <= 0) None
        else {
          val (x, y) = (li.lo.divide(klo, MC), li.hi.divide(klo, MC))
          val kk = klo.abs.multiply(kLo, MC)
          Some(Iv(li.pivot, li.a.divide(klo, MC),
            x.min(y).subtract(widen), x.max(y).add(widen),
            li.ea.divide(kLo, MCU)
              .add(ki.eb.multiply(li.a.abs, MCU).divide(kk, MCU), MCU),
            li.eb.divide(kLo, MCU)
              .add(ki.eb.multiply(li.maxAbsB, MCU).divide(kk, MCU), MCU)))
        }
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
      // runtime error slope must not swallow the signal (only possible
      // for pathologically deep chains — refuse rather than mis-solve)
      if iv.ea.compareTo(iv.a.abs) < 0
      c <- bd(cutValue)
      // the cut value's own decimal↔binary conversion slack
      cutErr = cutValue match {
        case _: java.lang.Double => c.abs.multiply(EpsDouble, MCU)
        case _: java.lang.Float => c.abs.multiply(EpsFloat, MCU)
        case _ => JBD.ZERO
      }
      // asc:  f_rt ≤ a·x + hi + E(|x|), C_bin ≥ C − cutErr
      //       f_rt > C_bin  ⟹  a·x + ea·|x| > C − hi − eb − cutErr
      // desc: f_rt ≥ a·x + lo − E(|x|), C_bin ≤ C + cutErr
      //       f_rt < C_bin  ⟹  a·x − ea·|x| < C − lo + eb + cutErr
      rhs = if (asc) c.subtract(iv.hi, MC).subtract(iv.eb.add(cutErr, MCU), MC)
            else c.subtract(iv.lo, MC).add(iv.eb.add(cutErr, MCU), MC)
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
      // the relaxed cut `a·x ± ea·|x| ⋈ rhs` is piecewise linear with
      // slopes a+ea and a−ea (same sign as a, since ea < |a|) — its keep
      // set is one-sided with the breakpoint at one of the two candidate
      // roots; taking the LOOSER root (min for a lower bound, max for an
      // upper) is exact in every sign quadrant
      r1 = rhs.divide(iv.a.add(iv.ea), MC)
      r2 = rhs.divide(iv.a.subtract(iv.ea), MC)
      bound0 = if (lower) r1.min(r2) else r1.max(r2)
      // final slack covers the 40-digit derivation's own division/cast
      // digits (relative+absolute 1e-9 of the bound) — the runtime
      // floating regime is already inside (ea, eb)
      slack = bound0.abs.multiply(Slack, MC).add(Slack)
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
        // guard unnecessary only when the cap covers the pivot type's
        // WHOLE range — which is typeMax + 1 in magnitude, not typeMax:
        // |typeMin| = typeMax + 1 for two's-complement integrals, and a
        // pivot AT typeMin (e.g. −Long.MinValue wraps to itself) must
        // still trip the guard when the cap is only typeMax
        typeMax(pivotDt) match {
          case Some(r) if m.compareTo(r.add(JBD.ONE)) >= 0 => Some(None)
          case _ => Some(Some(m))
        }
    }
  }
}
