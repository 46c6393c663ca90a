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
    val e = truncate(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")).distinct(),
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
    val base = scale * (dampingDen - dampingNum) / dampingDen

    var ranks = truncate(nodes.withColumn("__rank", lit(scale)), checkpoint)
    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(outDeg, Seq("__id"), "left")
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
      i += 1
    }
    outDeg.unpersist()
    ranks.select(col("__id").as("node"), col("__rank").as("rank_scaled"))
  }

  /** In/out-degree per node — the zero-iteration centrality baseline (and
    * raw in-degree is itself a spam/quality signal in crawl curation).
    * One aggregation per side, full-outer-joined; no iteration. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
