package org.apache.spark.sql.graftnative

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Ascending, Cast, CumeDist, DenseRank, ExprId, Expression, Literal, NamedExpression, NTile, NullsFirst, PercentRank, Rank, RowNumber, SortOrder, UnaryExpression, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort, SubqueryAlias, Window => LWindow}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bucket id by BINARY SEARCH over the frozen boundary values: the number
  * of boundaries sorting STRICTLY before the input in the window's order
  * direction. Replaces the O(B)-term comparison chain (fine at the default
  * 8–64 buckets, a visible per-row constant at the 4096 cap) with O(log B)
  * comparisons — interpreted AND whole-stage-codegen'd, so the routing
  * expression stays inside the scan's codegen span.
  *
  * `boundaries` are CATALYST-internal values of `child`'s type (UTF8String
  * for strings, epoch micros for timestamps, …), sorted in DIRECTION order
  * (ascending for `asc`, descending otherwise — exactly
  * [[GlobalWindowMv.sampleBoundaries]]'s output order); equal adjacent
  * values are legal (the bucket between them is simply empty). Equal-to-a-
  * boundary inputs count that boundary as NOT before them, preserving the
  * ties-share-a-bucket invariant. Null-intolerant: the caller routes nulls
  * to their own end bucket first. */
case class GwBucketSearch(child: Expression, boundaries: Seq[Any], asc: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "gw_bucket"
  @transient private lazy val arr: Array[Any] = boundaries.toArray
  @transient private lazy val ord = TypeUtils.getInterpretedOrdering(child.dataType)

  override protected def nullSafeEval(v: Any): Any = {
    var lo = 0
    var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = ord.compare(arr(mid), v)
      if (if (asc) c < 0 else c > 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bnds = ctx.addReferenceObj("gwBoundaries", arr, "java.lang.Object[]")
    val jt = CodeGenerator.javaType(child.dataType)
    val bt = CodeGenerator.boxedType(child.dataType)
    nullSafeCodeGen(ctx, ev, v => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val b = ctx.freshName("b")
      val c = ctx.freshName("cmp")
      val before = if (asc) s"$c < 0" else s"$c > 0"
      s"""
         |int $lo = 0;
         |int $hi = $bnds.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  $jt $b = ($bt) $bnds[$mid];
         |  int $c = ${ctx.genComp(child.dataType, b, v)};
         |  if ($before) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GwBucketSearch =
    copy(child = newChild)
}

/** Plan surgery for GLOBAL-window materialized-view maintenance — the
  * `rank()/dense_rank()/row_number() OVER (ORDER BY …)` leaderboard shape
  * with an EMPTY `PARTITION BY`, which neither streaming maintenance
  * (unbounded state) nor key-local recompute (no key) can express, and
  * whose naive plan is the one thing this engine must never run at scale:
  * a SINGLE-TASK sort of the whole table (Spark executes an empty
  * partitionSpec window in one partition).
  *
  * The decomposition is two-level, exact, and classic distributed ranking:
  * RANGE-bucket the table on the first ORDER BY column (boundaries frozen
  * at first materialization), compute each window function LOCALLY per
  * bucket (parallel per-bucket sorts — never a global one), and convert
  * local → global with per-bucket prefix offsets from a tiny summary:
  *
  *   - `rank` / `row_number`: global = local + (# rows in buckets that
  *     sort before this bucket);
  *   - `dense_rank`: global = local + (# distinct ORDER-BY tuples in
  *     buckets before);
  *   - `percent_rank` / `cume_dist` / `ntile(k)`: pure derivations of
  *     the global rank / row count and the refresh-time total N — no
  *     additional state.
  *
  * Exactness hinges on one invariant the bucket routing guarantees: rows
  * EQUAL on the first order column always land in the same bucket (the
  * bucket id counts boundaries *strictly* before the value), so no tie
  * group ever spans a bucket boundary and the local window sees every
  * peer of each of its rows.
  *
  * Incrementality: the base is append-only, so a delta landing in bucket
  * m leaves every bucket sorting BEFORE m untouched — same rows, same
  * offsets, same ranks, byte-stable partitions. Only the suffix
  * [m, last] is recomputed, and the suffix filter doubles as a plain
  * comparison on the order column that pushes to the parquet scan.
  *
  * Reference counterpart: `generators/write/materialized_view.py:21` —
  * DLT Enzyme's declared incremental-MV surface; this closes its
  * unbounded-OVER-window residue (the "global leaderboard" gold-layer
  * MV). Package-placed for [[ExpressionUtils]]/[[PlanBridge]], the same
  * seam as [[StreamingJoinProbe]]. */
object GlobalWindowMv {

  /** Audited decomposable shape of an MV sql with one global window. */
  final case class Shape(
      windowNode: LWindow,
      orderAttr: AttributeReference,
      asc: Boolean,
      nullsFirst: Boolean,
      /** window output attribute -> rank | dense_rank | row_number */
      funcs: Seq[(Attribute, String)],
      /** Some(f) when the first ORDER BY key is a COMPUTED expression —
        * inlined down to relation-level column references (the analyzer
        * extracts `ORDER BY f(x)` into a synthetic `_w<i>` projection;
        * this is f itself). None = plain (possibly renamed) column. A
        * delta re-evaluates f on its own rows to locate touched buckets;
        * the suffix cut filters on the computed value (pushes through
        * deterministic Projects, stops at the scan) AND — when f is
        * affine in one pivot column plus bounded residuals
        * ([[MonotoneCut]]) — on a derived bare-pivot conjunct that
        * reaches the parquet row-group statistics. Keys outside that
        * grammar keep the stops-at-the-Project posture. */
      orderExpr: Option[Expression],
      /** Canonical ORDER BY signature with every synthetic/aliased sort
        * key inlined to relation-level sql — what gwmeta freezes. (Synthetic
        * `_w<i>` names are position-assigned: two different edits of the
        * sql can produce the same `_w1` token, so a name-based signature
        * would silently accept stale per-bucket distinct counts.) */
      sig: String) {
    def needsDistinct: Boolean = funcs.exists(_._2 == "dense_rank")
    /** percent_rank/cume_dist/ntile depend on the GLOBAL row count N:
      * a delta anywhere changes EVERY row's value, so no bucket is ever
      * "untouched" — each refresh rewrites all buckets (still
      * bucket-parallel; the single-task global sort is still avoided,
      * which is the scale win; only the delta-proportional rewrite and
      * byte-stability are rank/dense_rank/row_number-only properties). */
    def nDependent: Boolean = funcs.exists { case (_, k) =>
      k == "percent_rank" || k == "cume_dist" || k.startsWith("ntile:") }
    def orderSpec: Seq[SortOrder] = windowNode.orderSpec
    /** Null rows get their own bucket at the end their sort order puts
      * them: before bucket 0 (id -1) or after the last non-null bucket. */
    def nullBucketId(numBoundaries: Int): Int =
      if (nullsFirst) -1 else numBoundaries + 1
    def minBucketId: Int = if (nullsFirst) -1 else 0
    def maxBucketId(numBoundaries: Int): Int =
      if (nullsFirst) numBoundaries else numBoundaries + 1
  }

  /** Decide whether `plan` is the decomposable global-window shape.
    * Left = human-readable refusal naming the first disqualifying
    * construct (the caller wraps it in its ACT-011 convention). */
  def analyze(plan: LogicalPlan): Either[String, Shape] = {
    val windows = plan.collect { case w: LWindow => w }
    if (windows.isEmpty) return Left(
      "the sql has no window function — omitting recompute.keys selects " +
        "GLOBAL-window maintenance, which needs rank()/dense_rank()/" +
        "row_number() OVER (ORDER BY ...) with an empty PARTITION BY")
    if (windows.size > 1) return Left(
      "the sql has multiple window specifications — global-window " +
        "maintenance supports exactly ONE OVER (ORDER BY ...) spec " +
        "(all window functions sharing it)")
    val w = windows.head
    if (w.partitionSpec.nonEmpty) return Left(
      "the window has a PARTITION BY — declare those columns as " +
        "recompute.keys for partition-scoped recompute; omitting keys is " +
        "reserved for the GLOBAL window (empty PARTITION BY)")
    if (w.orderSpec.isEmpty) return Left(
      "the global window has no ORDER BY — nothing to rank on")
    // the plan ABOVE the window must be a row-local single-child chain:
    // a partition rewrite of the suffix buckets is only sound when every
    // output row is a function of one window row (SELECT / WHERE /
    // ORDER BY). Joins, aggregates, limits, set-ops above would mix
    // buckets and break the replace granularity.
    @annotation.tailrec
    def checkAbove(p: LogicalPlan): Option[String] = p match {
      case x if x eq w => None
      case _: Project | _: Filter | _: Sort | _: SubqueryAlias =>
        checkAbove(p.children.head)
      case other => Some(
        s"operator ${other.nodeName} above the global window is not " +
          "partition-rewritable — only row-local SELECT / WHERE / ORDER " +
          "BY may sit above the window (put a LIMIT-style cut as a " +
          "filter on the rank column instead)")
    }
    checkAbove(plan) match {
      case Some(msg) => return Left(msg)
      case None =>
    }
    val badName = w.child.output.find(_.name.startsWith("__gw_"))
    if (badName.isDefined) return Left(
      s"source column '${badName.get.name}' collides with the " +
        "maintenance machinery's __gw_ namespace — rename it")
    val funcsOrLeft: Seq[Either[String, (Attribute, String)]] =
      w.windowExpressions.map {
        case a @ Alias(WindowExpression(f, _), _) => f match {
          case _: Rank => Right(a.toAttribute -> "rank")
          case _: DenseRank => Right(a.toAttribute -> "dense_rank")
          case _: RowNumber => Right(a.toAttribute -> "row_number")
          case _: PercentRank => Right(a.toAttribute -> "percent_rank")
          case _: CumeDist => Right(a.toAttribute -> "cume_dist")
          case nt: NTile => nt.buckets match {
            case Literal(k: Int, _) if k >= 1 =>
              Right(a.toAttribute -> s"ntile:$k")
            case other => Left(
              s"ntile bucket count must be a positive integer literal, " +
                s"got ${other.sql}")
          }
          case other => Left(
            s"window function ${other.prettyName} over a global ORDER BY " +
              "is not prefix-decomposable here — supported: rank, " +
              "dense_rank, row_number, percent_rank, cume_dist, ntile " +
              "(running/whole-frame aggregates: omit mode for full refresh)")
        }
        case other => Left(
          s"window expression ${other.sql} is not a named window " +
            "function — unsupported shape")
      }
    funcsOrLeft.collectFirst { case Left(m) => m } match {
      case Some(m) => return Left(m)
      case None =>
    }
    // inline every synthetic/aliased sort key down to relation-level
    // columns: the analyzer extracts a COMPUTED order expression into a
    // synthetic `_w<i>` projection below the Window (a subquery alias of a
    // computation arrives the same way), and both the signature and the
    // delta routing need the real expression, not the synthetic name
    def findAlias(id: ExprId): Option[Alias] =
      w.child.collectFirst {
        case node if node.expressions.exists {
          case al: Alias => al.exprId == id; case _ => false } =>
          node.expressions.collectFirst {
            case al: Alias if al.exprId == id => al }.get
      }
    def inline(e: Expression): Expression = e.transformUp {
      case ar: AttributeReference => findAlias(ar.exprId) match {
        case Some(al) => inline(al.child)
        case None => ar
      }
    }
    val head = w.orderSpec.head
    head.child match {
      case ar: AttributeReference =>
        val resolved = inline(ar)
        val orderExpr = resolved match {
          case _: AttributeReference => None // plain (possibly renamed) column
          case e => Some(e)
        }
        // a computed key is maintainable only when a delta row can
        // re-evaluate it on its own columns: row-local, deterministic,
        // AND stable across refreshes — current_date()/now() are
        // Catalyst-"deterministic" (replaced once per query) yet drift
        // every refresh, silently re-routing EXISTING rows across the
        // frozen cut points while untouched prefix buckets keep stale
        // counts (the decayed-leaderboard trap: score * exp(-datediff(
        // current_date(), dt)))
        def timeVarying(e: Expression): Boolean = e.exists {
          case _: org.apache.spark.sql.catalyst.expressions.CurrentDate => true
          case _: org.apache.spark.sql.catalyst.expressions.CurrentTimestamp => true
          case _: org.apache.spark.sql.catalyst.expressions.Now => true
          case _: org.apache.spark.sql.catalyst.expressions.LocalTimestamp => true
          case _: org.apache.spark.sql.catalyst.expressions.CurrentTimeZone => true
          case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
          case _ => false
        }
        val exprProblem = orderExpr.flatMap {
          case e if e.exists(_.isInstanceOf[AggregateExpression]) => Some(
            s"the first ORDER BY key '${ar.name}' resolves to an " +
              s"aggregate (${e.sql}) — a delta row cannot re-evaluate it " +
              "to locate touched buckets; ranking over an aggregated base " +
              "needs mode omitted (full refresh)")
          case e if !e.deterministic => Some(
            s"the first ORDER BY key '${ar.name}' = ${e.sql} is " +
              "nondeterministic — frozen range boundaries and delta " +
              "routing need a stable ranking value; materialize it as a " +
              "base-table column upstream")
          case e if timeVarying(e) => Some(
            s"the first ORDER BY key '${ar.name}' = ${e.sql} changes " +
              "value between refreshes (current_date/current_timestamp/" +
              "subquery) — existing rows would re-route across the frozen " +
              "boundaries while untouched buckets keep stale counts; " +
              "materialize the decayed/derived value as a base-table " +
              "column that is rewritten when it changes, or omit mode " +
              "(full refresh)")
          case _ => None
        }
        exprProblem match {
          case Some(msg) => Left(msg)
          case None => ar.dataType match {
            case _: NumericType | StringType | DateType | TimestampType |
                 TimestampNTZType | BooleanType =>
              val sig = w.orderSpec.map(so =>
                so.copy(child = inline(so.child)).sql).mkString(", ")
              Right(Shape(w, ar,
                asc = head.direction == Ascending,
                nullsFirst = head.nullOrdering == NullsFirst,
                funcs = funcsOrLeft.map(_.toOption.get),
                orderExpr = orderExpr,
                sig = sig))
            case dt => Left(
              s"first ORDER BY key '${ar.name}' has type ${dt.sql} — " +
                "range bucketing needs an orderable atomic type (numeric, " +
                "string, date, timestamp)")
          }
        }
      case other => Left(
        s"first ORDER BY expression ${other.sql} must be a plain column " +
          "— it is the bucket-routing and scan-pruning key; materialize " +
          "the expression as a column upstream")
    }
  }

  /** Base-view column names the delta must carry so a refresh can locate
    * the buckets a batch touches: the order column itself, or — computed
    * ORDER BY — every column the expression reads. */
  def deltaRefNames(shape: Shape): Seq[String] = shape.orderExpr match {
    case None => Seq(shape.orderAttr.name)
    case Some(e) => e.collect { case ar: AttributeReference => ar.name }.distinct
  }

  /** The delta-side order value: the plain column cast to the order type,
    * or the computed ORDER BY expression re-evaluated over the delta's own
    * columns (matched case-insensitively). Left = the missing column names,
    * comma-joined — the caller owns the error convention. */
  def deltaOrderColumn(shape: Shape, deltaCols: Seq[String]): Either[String, Column] = {
    def find(n: String): Option[String] = deltaCols.find(_.equalsIgnoreCase(n))
    shape.orderExpr match {
      case None => find(shape.orderAttr.name)
        .map(n => col(n).cast(shape.orderAttr.dataType))
        .toRight(shape.orderAttr.name)
      case Some(e) =>
        val missing = deltaRefNames(shape).filterNot(n => find(n).isDefined)
        if (missing.nonEmpty) Left(missing.mkString(", "))
        else Right(ExpressionUtils.column(e.transformUp {
          case ar: AttributeReference => UnresolvedAttribute(Seq(find(ar.name).get))
        }).cast(shape.orderAttr.dataType))
    }
  }

  /** Rebuild stored boundary strings as typed literals (constant-folded
    * at plan time). Exact string round-tripping is NOT required for
    * correctness — boundaries are arbitrary frozen cut points; only
    * run-to-run consistency matters, and the stored string IS the
    * canonical form every run derives the literal from. */
  def boundaryLiterals(reprs: Seq[String], dt: DataType): Seq[Column] = dt match {
    // TIMESTAMP (with local time zone) casts to/from string through the
    // SESSION time zone — a zone change between runs would silently shift
    // every frozen cut; micros-since-epoch is zone-independent
    case TimestampType => reprs.map(s => timestamp_micros(lit(s).cast("long")))
    case _ => reprs.map(s => lit(s).cast(dt))
  }

  /** Frozen boundary cut points in three coordinated forms: the canonical
    * string reprs (what gwmeta persists), typed Columns (the scan-pushable
    * suffix cut), and catalyst-internal values (the binary-search routing).
    * Always in DIRECTION order ([[sampleBoundaries]]'s output order). */
  final case class Boundaries(reprs: Seq[String], dt: DataType) {
    def size: Int = reprs.size
    def isEmpty: Boolean = reprs.isEmpty
    lazy val literals: Seq[Column] = boundaryLiterals(reprs, dt)
    lazy val values: Seq[Any] = dt match {
      case TimestampType => reprs.map(s => java.lang.Long.valueOf(s.toLong))
      case _ =>
        // same string→type semantics the literal path constant-folds to;
        // zone matters for none of the audited types (timestamps persist
        // as micros), passed anyway so Cast resolves uniformly
        val zone = Some(SQLConf.get.sessionLocalTimeZone)
        reprs.map(s => Cast(Literal(UTF8String.fromString(s), StringType), dt, zone).eval(null))
    }
    /** Routing correctness rests on direction-sorted boundaries — verify
      * once per refresh (≤ 4096 comparisons) rather than trust a sidecar
      * that anything may have edited. Equal adjacents are legal. */
    def validateSorted(asc: Boolean): Unit = {
      val ord = TypeUtils.getInterpretedOrdering(dt)
      val bad = values.sliding(2).exists {
        case Seq(a, b) => if (asc) ord.compare(a, b) > 0 else ord.compare(a, b) < 0
        case _ => false
      }
      require(!bad, "global-window boundaries are not sorted in the order " +
        s"direction (asc=$asc) — the gwmeta sidecar is corrupt; run a full " +
        "refresh of the table to re-derive it")
    }
  }

  /** Bucket id of an order value: the number of boundaries sorting
    * STRICTLY before it (so equal values always share a bucket), with
    * nulls routed to their own end bucket. An O(log B) binary search over
    * the frozen values ([[GwBucketSearch]]) — codegen'd, no join, no UDF. */
  def bucketColumn(v: Column, boundaries: Boundaries, asc: Boolean,
      nullBucket: Int): Column =
    if (boundaries.isEmpty) when(v.isNull, lit(nullBucket)).otherwise(lit(0))
    else {
      boundaries.validateSorted(asc)
      when(v.isNull, lit(nullBucket)).otherwise(ExpressionUtils.column(
        GwBucketSearch(ExpressionUtils.expression(v), boundaries.values, asc)))
    }

  /** Boundary derivation result: the cut points plus the tie diagnostics
    * the caller's skew advisory needs (all driver-side, sample-bounded). */
  final case class BoundarySample(
      boundaries: Seq[String],
      /** rows actually sampled (≤ buckets*512) */
      sampled: Int,
      /** distinct order values in the sample */
      distinctValues: Int,
      /** the most frequent sampled value and its share of the sample —
        * the largest tie group, the thing that collapses boundaries */
      topRepr: Option[String],
      topShare: Double)

  /** Derive frozen range boundaries by random sampling + sorting the
    * bounded sample IN Spark (driver-side comparison would diverge from
    * Spark's ordering on e.g. non-BMP strings). Returns canonical
    * CAST-to-string forms, order-direction sorted, deduplicated, plus tie
    * diagnostics. `boundaries` is Nil when the table is too small to be
    * worth bucketing — the caller then runs single-bucket (and re-derives
    * next refresh, cheap by definition at that size). */
  def sampleBoundaries(childDf: DataFrame, shape: Shape, buckets: Int): BoundarySample = {
    require(buckets >= 2 && buckets <= 4096,
      s"recompute.buckets must be in [2, 4096], got $buckets")
    val vCol = ExpressionUtils.column(shape.orderAttr)
    val sampleN = buckets * 512
    val base = childDf.select(vCol.as("__v")).filter(col("__v").isNotNull)
    // Bound the rand-ordered top-k: its per-partition selection queue is
    // O(limit) — 2M entries per task at the 4096-bucket cap. Pre-thinning
    // with a fraction (one extra single-column count, bootstrap-only)
    // makes each task feed and retain O(sampleN × 1.5 / tasks) instead;
    // a binomial undershoot only coarsens the cuts, never breaks them.
    val n = base.count()
    val frac = if (n <= sampleN.toLong * 2) 1.0 else math.min(1.0, 1.5 * sampleN / n)
    val thinned = if (frac < 1.0) base.sample(withReplacement = false, frac, 42) else base
    val reprCol = shape.orderAttr.dataType match {
      case TimestampType => unix_micros(col("__v")).cast("string")
      case _ => col("__v").cast("string")
    }
    val sorted = thinned
      .orderBy(rand(42)).limit(sampleN)
      .orderBy(if (shape.asc) col("__v").asc else col("__v").desc)
      .select(reprCol)
      .collect().map(_.getString(0)).toSeq
    // tie diagnostics from the direction-sorted sample: equal values are
    // adjacent, so the largest tie group is the longest equal run
    var prev: String = null
    var run = 0
    var distinct = 0
    var best = 0
    var bestV: Option[String] = None
    sorted.foreach { s =>
      if (s == prev) run += 1 else { distinct += 1; run = 1; prev = s }
      if (run > best) { best = run; bestV = Some(s) }
    }
    val share = if (sorted.isEmpty) 0.0 else best.toDouble / sorted.length
    val bnds =
      if (sorted.length < buckets * 4) Nil
      else {
        val step = sorted.length.toDouble / buckets
        (1 until buckets).map(i => sorted((i * step).toInt)).distinct
      }
    BoundarySample(bnds, sorted.length, distinct, bestV, share)
  }

  /** Frozen maintenance state, persisted as one table-meta string:
    * boundary cut points (canonical string forms of the order-column
    * type) plus per-bucket row / distinct-order-tuple counts — everything
    * a refresh needs to compute prefix offsets for UNTOUCHED buckets
    * without reading them — plus the bootstrap's TIE DIAGNOSTICS
    * (`sampled`/`distinctValues`/`topShare`, zeros on pre-r16 sidecars):
    * the advisory that fires at bootstrap is one log line an operator
    * diagnosing a slow leaderboard MV a week later never saw; the sidecar
    * is where the evidence survives. */
  final case class Meta(typeDdl: String, orderSig: String,
      hasDistincts: Boolean, declaredBuckets: Int, boundaries: Seq[String],
      counts: Map[Int, Long], distincts: Map[Int, Long],
      sampled: Int = 0, distinctValues: Int = 0, topShare: Double = 0.0) {
    /** Buckets that can actually hold distinct work: ties share a bucket,
      * so collapsed cut points shrink this below `declaredBuckets`. */
    def effectiveBuckets: Int = boundaries.size + 1
  }

  /** Canonical signature of the window's ORDER BY spec — expressions
    * (synthetic sort keys inlined to relation-level sql), directions, null
    * ordering, tie-break keys. Persisted beside the frozen boundaries so
    * an edited sql (different order key, flipped direction, changed
    * secondary keys — all of which change bucket routing or distinct
    * counts) invalidates the stored state instead of silently producing
    * wrong ranks. */
  def orderSig(shape: Shape): String = shape.sig

  /** Line-based, base64-armored codec (boundary values are arbitrary user
    * data — base64 sidesteps every escaping concern). */
  def encodeMeta(m: Meta): String = {
    val b64 = java.util.Base64.getEncoder
    def pairs(kv: Map[Int, Long]) =
      kv.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")
    Seq("v=2",
      "type=" + b64.encodeToString(m.typeDdl.getBytes("UTF-8")),
      "ordersig=" + b64.encodeToString(m.orderSig.getBytes("UTF-8")),
      "hasdistincts=" + m.hasDistincts,
      "declaredbuckets=" + m.declaredBuckets,
      "boundaries=" + m.boundaries
        .map(s => b64.encodeToString(s.getBytes("UTF-8"))).mkString(","),
      "counts=" + pairs(m.counts),
      "distincts=" + pairs(m.distincts),
      "sampled=" + m.sampled,
      "distinctvalues=" + m.distinctValues,
      // fixed 6-decimal form, not toString: round-trips exactly enough for
      // a diagnostic share and never emits scientific notation. BigDecimal,
      // not the f-interpolator: f"%.6f" formats with the JVM DEFAULT locale,
      // so a comma-decimal host would emit "0,123456", decodeMeta's
      // .toDouble would throw inside Try, the whole sidecar would decode to
      // None — and every refresh on such hosts silently degrades to a full
      // rebuild. BigDecimal.toString is locale-free by spec.
      "topshare=" + BigDecimal(m.topShare)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString).mkString("\n")
  }

  def decodeMeta(s: String): Option[Meta] = scala.util.Try {
    val b64 = java.util.Base64.getDecoder
    val kv = s.linesIterator.map(_.split("=", 2)).collect {
      case Array(k, v) => k -> v }.toMap
    require(kv.get("v").contains("2"), s"unknown gwmeta version ${kv.get("v")}")
    def str(b: String) = new String(b64.decode(b), "UTF-8")
    def pairs(v: String): Map[Int, Long] =
      if (v.isEmpty) Map.empty
      else v.split(",").map { p =>
        val Array(k, n) = p.split(":", 2); k.toInt -> n.toLong }.toMap
    Meta(str(kv("type")), str(kv("ordersig")), kv("hasdistincts").toBoolean,
      kv("declaredbuckets").toInt,
      // "" = no boundaries; a lone empty SEGMENT is the base64 of the
      // empty string — a legal boundary value for STRING order columns
      kv("boundaries") match {
        case "" => Nil
        case bs => bs.split(",", -1).map(str).toSeq
      },
      pairs(kv.getOrElse("counts", "")),
      pairs(kv.getOrElse("distincts", "")),
      // absent on pre-r16 sidecars — zeros mean "no recorded diagnostics",
      // never a decode failure (a failure would force a full refresh)
      kv.getOrElse("sampled", "0").toInt,
      kv.getOrElse("distinctvalues", "0").toInt,
      kv.getOrElse("topshare", "0").toDouble)
  }.toOption

  /** Prefix offsets over the full bucket range: offsets(b) = sum of
    * counts for buckets numerically (= sort-order) before b. */
  def prefixOffsets(lo: Int, hi: Int, counts: Map[Int, Long]): Map[Int, Long] = {
    var acc = 0L
    (lo to hi).map { b => val r = b -> acc; acc += counts.getOrElse(b, 0L); r }.toMap
  }

  /** The base with its derived `__gw_bucket` column, suffix-restricted to
    * buckets >= minBucket with the scan-pushable order-column twin of the
    * bucket filter — ONE definition shared by the summary scan and the
    * window recompute, so the two jobs can never see different row sets. */
  private def bucketedChild(spark: SparkSession, shape: Shape,
      boundaries: Boundaries, minBucket: Option[Int]): DataFrame = {
    val childDf = PlanBridge.ofRows(spark, shape.windowNode.child)
    val vCol = ExpressionUtils.column(shape.orderAttr)
    val b0 = childDf.withColumn("__gw_bucket",
      bucketColumn(vCol, boundaries, shape.asc, shape.nullBucketId(boundaries.size)))
    minBucket match {
      case Some(m) =>
        // pushable twin: bucket >= m is exactly "v sorts strictly after
        // boundary m-1" — one comparison on the bare order column, so the
        // parquet scan prunes row groups before the bucket expression
        // runs. For a COMPUTED order key that comparison pushes through
        // the projection but stops at the scan, so a SECOND conjunct is
        // derived on the bare pivot column when the expression has the
        // affine-plus-bounded-residual shape ([[MonotoneCut]]) — that one
        // reaches the parquet row-group statistics. Nulls-last rows live
        // in the final bucket (always in the suffix) and must survive
        // every comparison.
        val pruned =
          if (m >= 1 && m <= boundaries.size) {
            val cut = boundaries.literals(m - 1)
            val cmp = if (shape.asc) vCol > cut else vCol < cut
            val p1 = b0.filter(if (shape.nullsFirst) cmp else cmp || vCol.isNull)
            monotoneCutColumn(shape, boundaries, m)
              .map(p1.filter).getOrElse(p1)
          } else b0
        pruned.filter(col("__gw_bucket") >= m)
      case None => b0
    }
  }

  /** Scan-pushable pivot-column conjunct for a computed ORDER BY key —
    * [[MonotoneCut.derive]]'s implication rendered as a Column, or None
    * when the shape/typing gives no sound conjunct (the suffix filter
    * above remains the only cut — correct, just unpruned). */
  private[graftnative] def monotoneCutColumn(shape: Shape,
      boundaries: Boundaries, m: Int): Option[Column] =
    shape.orderExpr.flatMap(f => cutColumnFor(f, boundaries.values(m - 1),
      shape.asc, shape.nullsFirst, shape.windowNode.child.outputSet))

  /** [[monotoneCutColumn]] with the plan context made explicit — public
    * so the differential spec can drive the derivation over arbitrary
    * resolved expressions without a full MV bootstrap. */
  def cutColumnFor(f: Expression, cutValue: Any, asc: Boolean,
      nullsFirst: Boolean,
      childOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[Column] =
    for {
      cut <- MonotoneCut.derive(f, cutValue, asc)
      // the conjunct references base columns by their resolved attrs —
      // they must pass through to the window child's output (projections
      // that drop the pivot keep the unpruned posture)
      if childOut.contains(cut.pivot) && cut.nullKeep.forall(childOut.contains)
      cmp <- typedCmp(cut)
      guarded <- cut.wrapCap match {
        case None => Some(cmp)
        case Some(cap) =>
          // |x| > cap rows sit outside the proven-no-wrap domain: keep
          // them unconditionally. The guard literal rounds the cap DOWN
          // (keeping MORE rows); if it cannot be typed, the whole
          // conjunct is withdrawn — emitting cmp without the guard would
          // be unsound.
          typedGuard(cut.pivot, cap).map { case (hiLit, loLit) =>
            val x = ExpressionUtils.column(cut.pivot)
            cmp || x > hiLit || x < loLit
          }
      }
    } yield
      if (nullsFirst) guarded
      else cut.nullKeep.foldLeft(guarded)((acc, r) =>
        acc || ExpressionUtils.column(r).isNull)

  /** `pivot >= bound` / `pivot <= bound` with the literal typed EXACTLY
    * like the pivot column (a mismatched literal wraps the column in a
    * cast, which blocks parquet pushdown), rounded in the loose
    * direction. None = no useful conjunct (bound out of the type's range
    * in the direction that would make it trivial or vacuous). */
  private def typedCmp(cut: MonotoneCut.Cut): Option[Column] = {
    val x = ExpressionUtils.column(cut.pivot)
    def intCmp(min: Long, max: Long, mk: Long => Column): Option[Column] = {
      val r = cut.bound.setScale(0,
        if (cut.lower) java.math.RoundingMode.FLOOR
        else java.math.RoundingMode.CEILING)
      // bound outside the type's range: either the conjunct is trivially
      // true (prunes nothing) or no in-range value qualifies (pruning
      // everything would be LEGAL — such rows cannot be in the suffix —
      // but a no-filter skip is equally sound and far less surprising).
      // Both → None.
      if (r.compareTo(java.math.BigDecimal.valueOf(max)) > 0 ||
          r.compareTo(java.math.BigDecimal.valueOf(min)) < 0) None
      else {
        val v = r.longValueExact()
        Some(if (cut.lower) x >= mk(v) else x <= mk(v))
      }
    }
    cut.pivot.dataType match {
      case DoubleType =>
        val d0 = cut.bound.doubleValue()
        val d = if (cut.lower) Math.nextDown(Math.nextDown(d0))
                else Math.nextUp(Math.nextUp(d0))
        Some(if (cut.lower) x >= lit(d) else x <= lit(d))
      case FloatType =>
        val f0 = cut.bound.floatValue()
        val f = if (cut.lower) Math.nextDown(Math.nextDown(f0))
                else Math.nextUp(Math.nextUp(f0))
        Some(if (cut.lower) x >= lit(f) else x <= lit(f))
      case LongType => intCmp(Long.MinValue, Long.MaxValue, lit(_))
      case IntegerType => intCmp(Int.MinValue, Int.MaxValue, v => lit(v.toInt))
      case ShortType => intCmp(Short.MinValue, Short.MaxValue, v => lit(v.toShort))
      case ByteType => intCmp(Byte.MinValue, Byte.MaxValue, v => lit(v.toByte))
      case _ => None
    }
  }

  /** Wrap-guard literals (±cap) typed like the pivot, cap rounded DOWN
    * (down = more rows kept = safe). */
  private def typedGuard(pivot: AttributeReference,
      cap: java.math.BigDecimal): Option[(Column, Column)] = {
    val r = cap.setScale(0, java.math.RoundingMode.FLOOR)
    pivot.dataType match {
      case DoubleType =>
        val d = Math.nextDown(cap.doubleValue())
        Some((lit(d), lit(-d)))
      case FloatType =>
        val f = Math.nextDown(cap.floatValue())
        Some((lit(f), lit(-f)))
      case LongType if r.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0 =>
        val v = r.longValueExact(); Some((lit(v), lit(-v)))
      case IntegerType if r.compareTo(java.math.BigDecimal.valueOf(Int.MaxValue)) <= 0 =>
        val v = r.intValueExact(); Some((lit(v), lit(-v)))
      case ShortType if r.compareTo(java.math.BigDecimal.valueOf(Short.MaxValue.toLong)) <= 0 =>
        val v = r.shortValueExact(); Some((lit(v), lit(-v)))
      case ByteType if r.compareTo(java.math.BigDecimal.valueOf(Byte.MaxValue.toLong)) <= 0 =>
        val v = r.byteValueExact(); Some((lit(v), lit(-v)))
      case _ => None
    }
  }

  /** Bootstrap-time LAYOUT advisory for computed ORDER BY keys: the
    * MonotoneCut conjunct only prunes what the base layout SEPARATES —
    * the r18 probe measured 7.7% of the scan on a pivot-range-clustered
    * base vs 100% on a hash-shuffled one, at 1× and 10× alike
    * (PROBE_r18.json). When a conjunct IS derivable but the base's data
    * files each span most of the pivot domain, every tail refresh will
    * decode the full base; say so ONCE, at bootstrap, where fixing the
    * ingest layout is cheapest. Returns the advisory text, or None when
    * no conjunct derives (nothing to exploit), the pivot doesn't reach
    * the scan, the source isn't file-backed, or the layout already
    * separates the domain.
    *
    * Cost: one pivot-column-pruned sampled scan (per-file min/max of the
    * pivot) — bootstrap already full-sorts the base, so this is noise;
    * never runs on incremental refreshes. */
  def layoutAdvisory(spark: SparkSession, shape: Shape,
      boundaries: Boundaries, sampleFraction: Double = 0.05): Option[String] =
    for {
      f <- shape.orderExpr
      probeCut <- boundaries.values.lastOption
      cut <- MonotoneCut.derive(f, probeCut, shape.asc)
      childOut = shape.windowNode.child.outputSet
      if childOut.contains(cut.pivot) && cut.nullKeep.forall(childOut.contains)
      advisory <- {
        val p = ExpressionUtils.column(cut.pivot).cast("double")
        // drop nulls, NaN and ±Inf (NaN sorts largest in Spark, so
        // `p < +Inf` excludes it; ±Inf would poison the domain width)
        val perFile = PlanBridge.ofRows(spark, shape.windowNode.child)
          .select(input_file_name().as("__gw_file"), p.as("__gw_p"))
          .filter(col("__gw_file") =!= "" &&
            col("__gw_p") > lit(Double.NegativeInfinity) &&
            col("__gw_p") < lit(Double.PositiveInfinity))
          .sample(sampleFraction)
          .groupBy("__gw_file")
          .agg(min("__gw_p").as("mn"), max("__gw_p").as("mx"))
          // the coverage metric needs a file SAMPLE, not the census — cap
          // the driver transfer (a 100 TB base can hold ~10^6 files)
          .limit(10000)
          .collect()
        val ranges = perFile.map(r => (r.getDouble(1), r.getDouble(2)))
        if (ranges.length < 2) None
        else {
          val gmin = ranges.map(_._1).min
          val gmax = ranges.map(_._2).max
          if (gmax <= gmin) None
          else {
            val avgCover = ranges.map { case (a, b) =>
              (b - a) / (gmax - gmin) }.sum / ranges.length
            if (avgCover <= 0.5) None
            else Some(
              f"the computed ORDER BY key derives a scan-pushable bound " +
                f"on column '${cut.pivot.name}', but the base layout is " +
                f"not clustered on it — each sampled data file spans " +
                f"~${avgCover * 100}%.0f%% of the '${cut.pivot.name}' " +
                f"domain (${ranges.length} files sampled), so parquet " +
                f"row-group statistics cannot prune and every tail " +
                f"refresh decodes the FULL base instead of ~one bucket. " +
                f"Cluster the base on write — cluster_columns: " +
                f"['${cut.pivot.name}'] on the upstream table, or " +
                f"range-partition the ingest by '${cut.pivot.name}'")
          }
        }
      }
    } yield advisory

  /** Per-bucket (row count, distinct-order-tuple count) for buckets >=
    * minBucket — the refresh's summary pass. Distinct is computed only
    * when a dense_rank needs it (the exact-distinct expand is not free). */
  def summarize(spark: SparkSession, shape: Shape, boundaries: Boundaries,
      minBucket: Option[Int]): Map[Int, (Long, Long)] = {
    val f = bucketedChild(spark, shape, boundaries, minBucket)
    val rows =
      if (shape.needsDistinct) {
        val tuple = struct(shape.orderSpec.map(so =>
          ExpressionUtils.column(so.child)): _*)
        f.groupBy("__gw_bucket")
          .agg(count(lit(1)).as("n"), count_distinct(tuple).as("nd"))
          .collect()
      } else
        f.groupBy("__gw_bucket").agg(count(lit(1)).as("n"))
          .withColumn("nd", lit(0L)).collect()
    rows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  /** Lowest bucket a delta batch touches — every bucket sorting before it
    * keeps its rows, counts, offsets, and therefore ranks. `orderValue` is
    * [[deltaOrderColumn]]'s result — the plain column or the re-evaluated
    * computed key. None = empty batch (skip the refresh). */
  def minDeltaBucket(batch: DataFrame, orderValue: Column, shape: Shape,
      boundaries: Boundaries): Option[Int] = {
    val r = batch.select(min(bucketColumn(orderValue, boundaries, shape.asc,
      shape.nullBucketId(boundaries.size))).as("m")).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  /** The maintenance plan: `plan` with its global-window subtree replaced
    * by bucket-local windows plus prefix-offset merge, restricted to
    * buckets >= `minBucket` (None = bootstrap, everything). Output =
    * the MV's own columns (same names, same expression ids — the
    * surrounding SELECT/WHERE resolve untouched) plus a trailing
    * `__gw_bucket` int column, the physical replace granularity. */
  def rewrite(spark: SparkSession, plan: LogicalPlan, shape: Shape,
      boundaries: Boundaries, minBucket: Option[Int],
      rowsBefore: Map[Int, Long], distinctBefore: Map[Int, Long],
      totalRows: Long): DataFrame = {
    val w = shape.windowNode
    val filtered = bucketedChild(spark, shape, boundaries, minBucket)
    // direction re-applied through the Column API: a Column wrapping a raw
    // SortOrder is NOT unwrapped by the Spark 4 WindowSpec (it wraps it in
    // another SortOrder, which then fails codegen as a value expression)
    val sortCols = shape.orderSpec.map { so =>
      val c = ExpressionUtils.column(so.child)
      (so.direction, so.nullOrdering) match {
        case (Ascending, NullsFirst) => c.asc_nulls_first
        case (Ascending, _) => c.asc_nulls_last
        case (_, NullsFirst) => c.desc_nulls_first
        case (_, _) => c.desc_nulls_last
      }
    }
    val wspec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__gw_bucket")).orderBy(sortCols: _*)
    // O(1) per row: bucket ids are CONTIGUOUS ints, so the offsets embed
    // as an array literal indexed by (bucket − lo + 1) — element_at on an
    // ARRAY is a direct index. The previous map-literal form scanned the
    // ArrayBasedMapData linearly per row: O(B) × N rows = 4·10¹²
    // comparisons at the 4096-bucket cap on a 10⁹-row table, all inside
    // the window projection. Buckets below lo (impossible in production —
    // prefixOffsets spans [lo, hi]) and above hi read 0 via the guard +
    // try_element_at's out-of-bounds NULL.
    def offsetOf(offsets: Map[Int, Long]): Column =
      if (offsets.isEmpty) lit(0L)
      else {
        val lo = offsets.keys.min
        val hi = offsets.keys.max
        val arr: Seq[Option[Long]] = (lo to hi).map(offsets.get)
        // the coalesce-to-0 is for ABOVE-hi indices only; an IN-RANGE gap
        // would also read NULL and coalesce to offset 0 — silently wrong
        // ranks for that bucket. prefixOffsets always emits a contiguous
        // [lo, hi] map, so a gap here means a caller bypassed it — refuse
        // rather than rank with zero offsets
        require(arr.forall(_.isDefined),
          s"global-window prefix offsets have gaps inside [$lo, $hi] " +
            s"(missing: ${(lo to hi).filterNot(offsets.contains).mkString(", ")}) — " +
            "offsets must come from prefixOffsets, which is gap-free")
        when(col("__gw_bucket") >= lit(lo), coalesce(
          try_element_at(typedlit(arr), col("__gw_bucket") - lit(lo) + lit(1)),
          lit(0L))).otherwise(lit(0L))
      }
    var cur = filtered
    val offRows = offsetOf(rowsBefore)
    shape.funcs.zipWithIndex.foreach { case ((_, kind), i) =>
      // each kind keeps its stock Spark output type (the spliced
      // attribute must match); int ranks past 2^31 rows overflow in
      // stock Spark too, and ANSI mode makes that loud here
      val global: Column = kind match {
        case "rank" =>
          (rank().over(wspec).cast("long") + offRows).cast("int")
        case "dense_rank" =>
          (dense_rank().over(wspec).cast("long") + offsetOf(distinctBefore)).cast("int")
        case "row_number" =>
          (row_number().over(wspec).cast("long") + offRows).cast("int")
        case "percent_rank" =>
          // (globalRank - 1) / (N - 1); one row total → 0.0 (stock Spark)
          if (totalRows <= 1L) lit(0.0)
          else (rank().over(wspec).cast("long") + offRows - 1L).cast("double") /
            lit((totalRows - 1L).toDouble)
        case "cume_dist" =>
          // rows at-or-before current INCLUDING ties: count over the
          // default RANGE frame is exact-integer (no float round-trip
          // through the local cume_dist fraction)
          (count(lit(1)).over(wspec) + offRows).cast("double") /
            lit(totalRows.toDouble)
        case nt if nt.startsWith("ntile:") =>
          // stock ntile: the first N mod k tiles hold ceil(N/k) rows.
          // Derived from the GLOBAL row number + the (refresh-time
          // literal) N and k — no extra state
          val k = nt.stripPrefix("ntile:").toLong
          val n = math.max(totalRows, 1L)
          val q = n / k
          val r = n % k
          val cut = r * (q + 1)
          val rn = row_number().over(wspec).cast("long") + offRows
          (if (q == 0L) rn // fewer rows than tiles: each row its own tile
           else when(rn <= cut, (rn - 1L) / (q + 1L) + 1L)
             .otherwise(lit(r) + (rn - cut - 1L) / q + 1L)).cast("int")
      }
      cur = cur.withColumn(s"__gw_g$i", global)
    }
    val analyzed = cur.queryExecution.analyzed
    val out = analyzed.output
    def byName(n: String): Attribute = out.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"global-window rewrite lost $n"))
    // splice: same output attributes (by exprId) as the original Window
    // node, so Filters/Projects above resolve against the replacement
    // without rewriting them; __gw_bucket rides along as an extra column
    val projList: Seq[NamedExpression] =
      w.child.output.map(a => out.find(_.exprId == a.exprId).getOrElse(
        throw new IllegalStateException(
          s"global-window rewrite lost child column ${a.name}"))) ++
      shape.funcs.zipWithIndex.map { case ((attr, _), i) =>
        Alias(byName(s"__gw_g$i"), attr.name)(exprId = attr.exprId) } :+
      byName("__gw_bucket")
    val replacement = Project(projList, analyzed)
    val bucketAttr = replacement.output.last
    val full = plan.transformUp {
      case x: LWindow if x eq w => replacement
      // carry __gw_bucket through every Project above the window (Filter/
      // Sort/SubqueryAlias pass all child output through untouched)
      case p: Project
          if p.child.output.exists(_.exprId == bucketAttr.exprId) &&
            !p.projectList.exists(_.toAttribute.exprId == bucketAttr.exprId) =>
        p.copy(projectList = p.projectList :+
          p.child.output.find(_.exprId == bucketAttr.exprId).get)
    }
    PlanBridge.ofRows(spark, full)
  }
}
