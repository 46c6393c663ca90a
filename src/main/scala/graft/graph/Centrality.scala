package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.{truncate, IterCheckpoint, LocalCheckpoint}

/** Link-graph centrality for corpus curation — the web-graph quality signal
  * large-scale pretraining pipelines rank crawl pages/domains by (Common
  * Crawl publishes exactly this class of ranking for its host graph;
  * PageRank is the scalable member of the family). Beyond-reference
  * operator set, same first-class posture as graft.dedup / graft.text.
  *
  * Arithmetic is EXACT INTEGER over BIGINTs scaled by `scale` (the
  * graft.text.TextAnalysis.wordRarity trick): every division is an
  * integer `div`, never a double — doubles lose exactness past 2^53,
  * which a rank sum on a large graph exceeds. A fixed iteration count
  * therefore yields bit-identical ranks on any engine and any
  * partitioning — the property that lets the d15 gate hash-compare
  * against a DuckDB recomputation and makes the operator deterministic
  * across cluster sizes at 100 TB. The cost is ≤1 scaled unit lost per
  * floor — relative error ≤ ~1/scale per hop, far below any ranking use. */
object Centrality {

  import org.apache.spark.sql.Column

  /** BIGINT `div` — Catalyst's IntegralDivide, NOT Column./ (which is
    * double division and loses exactness past 2^53). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** PageRank over a directed edge list, exact-integer, fixed iterations.
    *
    * `edges` carries `(srcCol, dstCol)`; node ids are any orderable type.
    * Nodes = every id appearing on either side. Each node starts with
    * `scale` units of mass; one iteration is
    *   rank'(v) = (scale·(den−num)) div den           (teleport)
    *            + (num·(dangling div N)) div den       (dangling share)
    *            + (num · Σ_{u→v} (rank(u) div deg(u))) div den
    * with damping num/den kept RATIONAL so the damping multiply is integer
    * too. Dangling nodes (no out-edges) redistribute uniformly — the
    * standard correction, floored for determinism.
    *
    * Overflow contract: the conservative bound on any intermediate is
    * num · N · scale (a star graph can concentrate all mass on one node),
    * guarded loudly; size `scale` to the graph (1e12 to ~10⁵ nodes, 1e9 to
    * ~10⁸, 1e7 at web scale — rank resolution degrades only to 1e-7/hop).
    *
    * Scale posture: one iteration is ONE shuffle pair — ranks⋈out-degree
    * on node id (both sides pre-partitioned on the same key), contributions
    * rekeyed by dst into a map-side-combinable SUM. Out-degrees and the
    * node set are computed once; lineage is truncated per iteration via the
    * shared CC checkpoint seam so plans stay O(1) deep. Driver state is two
    * scalars (N, dangling mass) per iteration — no collect of data. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingNum: Long = 85, dampingDen: Long = 100,
      scale: Long = 1000000000000L,
      checkpoint: IterCheckpoint = LocalCheckpoint): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingNum >= 0 && dampingNum <= dampingDen && dampingDen > 0,
      s"damping $dampingNum/$dampingDen is not in [0, 1]")
    require(scale > 0, s"scale must be positive, got $scale")
    // null endpoints are dropped — the labelPropagation contract the three
    // operators share so they compose over one edge list. Without the
    // filter a null dst key survives the contribs groupBy but never joins
    // back to a node: the contributing node's out-degree is inflated and
    // its rank mass silently vanishes every iteration.
    val e = truncate(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull).distinct(),
      checkpoint)
    val nodes = truncate(
      e.select(col("__src").as("__id"))
        .unionByName(e.select(col("__dst").as("__id"))).distinct(), checkpoint)
    val n = nodes.count()
    if (n == 0)
      return e.select(col("__src").as("node"), lit(0L).as("rank_scaled"))
    require(java.math.BigInteger.valueOf(dampingNum)
        .multiply(java.math.BigInteger.valueOf(n))
        .multiply(java.math.BigInteger.valueOf(scale))
        .bitLength() <= 62,
      s"pageRank: dampingNum*N*scale = $dampingNum*$n*$scale can overflow " +
        "BIGINT on a mass-concentrating graph — lower `scale` (rank " +
        "resolution degrades only to 1/scale per hop)")
    val outDeg = e.groupBy(col("__src").as("__id"))
      .agg(count(lit(1)).as("__deg")).cache()
    // exact in BigInteger: the intermediate scale*(dampingDen - dampingNum)
    // can wrap Long for extreme ratios (scale = 1e12, dampingDen = 1e7
    // makes it ~1e19 > Long.MaxValue) even though the QUOTIENT always fits
    // (it is <= scale) — the guard above covers the per-iteration rank
    // terms, not this one-off teleport constant
    val base = java.math.BigInteger.valueOf(scale)
      .multiply(java.math.BigInteger.valueOf(dampingDen - dampingNum))
      .divide(java.math.BigInteger.valueOf(dampingDen))
      .longValueExact()

    var ranks = truncate(nodes.withColumn("__rank", lit(scale)), checkpoint)
    var i = 0
    while (i < iterations) {
      // cached: the dangling-mass action and the contribs leg both read
      // this join — uncached, the lazy contribs side would re-execute the
      // identical ranks⋈outDeg shuffle, doubling per-iteration cost (the
      // shape the "ONE shuffle pair" contract above forbids)
      val withDeg = ranks.join(outDeg, Seq("__id"), "left").cache()
      // dangling mass: a metadata-scale scalar, the one driver-side value
      val dangling = withDeg.filter(col("__deg").isNull)
        .agg(coalesce(sum(col("__rank")), lit(0L))).first().getLong(0)
      val share = dampingNum * (dangling / n) / dampingDen
      val contribs = withDeg.filter(col("__deg").isNotNull)
        .select(col("__id").as("__src"),
          idiv(col("__rank"), col("__deg")).as("__c"))
        .join(e, Seq("__src"))
        .groupBy(col("__dst").as("__id"))
        .agg(sum(col("__c")).as("__in"))
      ranks = truncate(
        nodes.join(contribs, Seq("__id"), "left")
          .select(col("__id"),
            (lit(base + share) +
              idiv(lit(dampingNum) * coalesce(col("__in"), lit(0L)),
                lit(dampingDen))).as("__rank")),
        checkpoint)
      // the truncate above is EAGER (checkpoint contract) — the new ranks
      // are materialized, so the iteration's join cache can go
      withDeg.unpersist()
      i += 1
    }
    outDeg.unpersist()
    ranks.select(col("__id").as("node"), col("__rank").as("rank_scaled"))
  }

  /** HyperBall harmonic centrality (Boldi & Vigna 2013) — the algorithm
    * behind the published Common Crawl host rankings. Harmonic centrality
    * of v is Σ_{u≠v, d(u,v)<∞} 1/d(u,v) over nodes u that can REACH v;
    * exact computation is all-pairs BFS (quadratic — [[exactHarmonic]]
    * below is that, kept as the gate/spec baseline only). HyperBall
    * replaces each node's reachability ball with a mergeable HLL sketch:
    * ball_t(v) = {v} ∪ ⋃_{u→v} ball_{t-1}(u), so one round is ONE
    * edges⋈sketches shuffle plus an `hll_union_agg` keyed by dst — O(E)
    * sketch merges per round, `maxDist` rounds, never materializing a
    * ball. The centrality accumulates (|ball_t| − |ball_{t−1}|)/t from
    * the sketch estimates; counts are approximate (DataSketches HLL,
    * ~1.6% at lgK 12 — raise `lgConfigK` for tighter balls), which is the
    * documented trade that makes the 100 TB graph feasible. Runs a FIXED
    * `maxDist` rounds (the diameter bound you care about; distances
    * beyond it contribute ≤ 1/maxDist each) — no data-dependent driver
    * loop. Lineage is truncated per round via the shared checkpoint seam.
    * Output: `(node, harmonic DOUBLE, ball_size BIGINT)`. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      maxDist: Int = 6, lgConfigK: Int = 12,
      checkpoint: IterCheckpoint = LocalCheckpoint): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    // null endpoints dropped — the shared contract with
    // pageRank/degrees/labelPropagation (one dirty edge list, four
    // composable operators)
    val e = truncate(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull).distinct(),
      checkpoint)
    val nodes = e.select(col("__src").as("__id"))
      .unionByName(e.select(col("__dst").as("__id"))).distinct()
    // ball_0 = {self}: one sketch per node over its own id
    var balls = truncate(
      nodes.groupBy("__id")
        .agg(hll_sketch_agg(col("__id"), lgConfigK).as("__sk"),
          hll_sketch_estimate(hll_sketch_agg(col("__id"), lgConfigK)).as("__est")),
      checkpoint)
    var scores = truncate(
      nodes.select(col("__id"), lit(0.0).as("__h")), checkpoint)
    var t = 1
    while (t <= maxDist) {
      val contrib = e
        .join(balls.select(col("__id").as("__src"), col("__sk")), Seq("__src"))
        .select(col("__dst").as("__id"), col("__sk"))
      val merged = contrib.unionByName(balls.select(col("__id"), col("__sk")))
        .groupBy("__id").agg(hll_union_agg(col("__sk")).as("__sk"))
      val next = truncate(
        merged.select(col("__id"), col("__sk"),
          hll_sketch_estimate(col("__sk")).as("__est")), checkpoint)
      scores = truncate(
        scores.join(balls.select(col("__id"), col("__est").as("__prev")), Seq("__id"))
          .join(next.select(col("__id"), col("__est").as("__cur")), Seq("__id"))
          .select(col("__id"),
            (col("__h") + greatest(col("__cur") - col("__prev"), lit(0L))
              .cast("double") / lit(t.toDouble)).as("__h")),
        checkpoint)
      balls = next
      t += 1
    }
    scores.join(balls.select(col("__id"), col("__est")), Seq("__id"))
      .select(col("__id").as("node"), col("__h").as("harmonic"),
        col("__est").as("ball_size"))
  }

  /** Exact harmonic centrality by iterated shortest-distance joins —
    * ALL-PAIRS state (quadratic): the oracle/spec baseline for
    * [[harmonicCentrality]], never a production path at scale. */
  def exactHarmonic(edges: DataFrame, srcCol: String, dstCol: String,
      maxDist: Int = 6,
      checkpoint: IterCheckpoint = LocalCheckpoint): DataFrame = {
    val e = truncate(
      // same null-endpoint drop as every production operator in this
      // file — a baseline keeping null edges would emit a spurious
      // null-keyed node and diverge from the HyperBall it validates
      edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
        .select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .distinct(),
      checkpoint)
    val nodes = e.select(col("__src").as("__id"))
      .unionByName(e.select(col("__dst").as("__id"))).distinct()
    // dist holds the FRONTIER-complete map (u, v, d(u,v)) for d <= t
    var dist = truncate(nodes.select(col("__id").as("__u"),
      col("__id").as("__v"), lit(0).as("__d")), checkpoint)
    var t = 1
    while (t <= maxDist) {
      val grown = dist.filter(col("__d") === t - 1)
        .join(e.select(col("__src").as("__v"), col("__dst")), Seq("__v"))
        .select(col("__u"), col("__dst").as("__v"), lit(t).as("__d"))
        .join(dist.select(col("__u"), col("__v"), lit(1).as("__seen")),
          Seq("__u", "__v"), "left_anti")
        .distinct()
      dist = truncate(dist.unionByName(grown), checkpoint)
      t += 1
    }
    dist.filter(col("__d") > 0)
      .groupBy(col("__v").as("node"))
      .agg(sum(lit(1.0) / col("__d")).as("harmonic"),
        (count(lit(1)) + 1).as("ball_size"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over the undirected-ized edge list, the graph-side
    * complement to [[graft.dedup.Dedup.connectedComponents]] (components
    * ignore density; LPA splits a connected graph into densely-linked
    * communities — e.g. site/topic clusters in a crawl graph, mirror
    * groups in a near-dup graph). DETERMINISTIC by construction: every
    * node starts labeled with its own id; each round every node adopts
    * its neighbors' most frequent label with the tie broken (count DESC,
    * label ASC) — all integer comparisons, so a fixed round count yields
    * identical communities on any engine/partitioning, and the g4 gate
    * unrolls the same rounds in DuckDB and hash-matches exactly.
    * Synchronous updates can oscillate on bipartite structures — the
    * fixed `iterations` (no convergence loop) makes that a defined,
    * reproducible output rather than a hang. One shuffle pair per round
    * (edges⋈labels, then the per-(node,label) count + argmax window);
    * lineage truncated per round via the shared checkpoint seam.
    * Self-loops do not vote (a node voting for itself drowns sparse
    * neighborhoods), but a node whose ONLY edges are self-loops still
    * appears, keeping its own label — the node universe is every non-null
    * edge endpoint, matching [[degrees]]/[[pageRank]] so the three
    * compose over one edge list (null endpoints are dropped).
    * Output: `(node, community)`. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4,
      checkpoint: IterCheckpoint = LocalCheckpoint): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    import org.apache.spark.sql.expressions.Window
    val both = edges.select(col(srcCol).as("__id"), col(dstCol).as("__nbr"))
      .unionByName(edges.select(col(dstCol).as("__id"), col(srcCol).as("__nbr")))
      .filter(col("__id").isNotNull && col("__nbr").isNotNull)
    val nodes = truncate(both.select(col("__id")).distinct(), checkpoint)
    val e = truncate(
      both.filter(col("__id") =!= col("__nbr")).distinct(), checkpoint)
    var lbl = truncate(nodes.withColumn("__lbl", col("__id")), checkpoint)
    var i = 0
    while (i < iterations) {
      val counts = e
        .join(lbl.select(col("__id").as("__nbr"), col("__lbl")), Seq("__nbr"))
        .groupBy("__id", "__lbl").agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy("__id")
        .orderBy(col("__c").desc, col("__lbl").asc)
      val winners = counts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__id"), col("__lbl").as("__new"))
      // a node with no (non-self) neighbors has no winner row and keeps
      // its label — it must not vanish from the node universe
      lbl = truncate(
        lbl.join(winners, Seq("__id"), "left")
          .select(col("__id"),
            coalesce(col("__new"), col("__lbl")).as("__lbl")),
        checkpoint)
      i += 1
    }
    lbl.select(col("__id").as("node"), col("__lbl").as("community"))
  }

  /** In/out-degree per node — the zero-iteration centrality baseline (and
    * raw in-degree is itself a spam/quality signal in crawl curation).
    * One aggregation per side, full-outer-joined; no iteration. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // null endpoints dropped (the shared labelPropagation contract) — and
    // a full_outer join never merges null keys, so two null-node rows
    // would otherwise leak out of one dirty edge list
    val clean = edges.filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    val out = clean.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = clean.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
