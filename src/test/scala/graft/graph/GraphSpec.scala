package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Centrality operators: exact-integer PageRank equivalence against an
  * independent driver-side reference, partitioning-independence (the
  * property the integer arithmetic buys), dangling redistribution, the
  * overflow guard, and degrees. The cross-engine leg is the g1/g2 DuckDB
  * gates. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Independent quadratic reference with the same integer formula. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(_ -> Scale).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(deg.contains).map(rank).sum
      val share = 85L * (dangling / n) / 100L
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum }
      rank = nodes.map(v =>
        v -> (Scale * 15 / 100 + share + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 3): Map[Long, Long] =
    Centrality.pageRank(
      edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-node cycle is a fixed point at exactly Scale") {
    val got = run(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(got == Map(1L -> Scale, 2L -> Scale))
  }

  test("matches the independent reference on a graph with a dangling node") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (0L, 3L),
      (4L, 2L), (4L, 5L)) // 5 has no out-edges → dangling mass
    for (iters <- Seq(0, 1, 4))
      assert(run(edges, iters) == refPageRank(edges, iters),
        s"diverged from reference at $iters iterations")
  }

  test("bit-identical across partitionings (the exact-integer property)") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60)))
    assert(run(edges, 4, parts = 1) == run(edges, 4, parts = 11))
    assert(run(edges, 4, parts = 1) == refPageRank(edges, 4))
  }

  test("duplicate edges collapse; self-loops feed their own node") {
    // dedup: a duplicated edge must not double its contribution
    assert(run(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 3) ==
      refPageRank(Seq((1L, 2L), (2L, 1L)), 3))
    // self-loop: 1→1 keeps its mass; 2→1 drains into it
    val self = run(Seq((1L, 1L), (2L, 1L)), 2)
    assert(self == refPageRank(Seq((1L, 1L), (2L, 1L)), 2))
    assert(self(1L) > self(2L))
  }

  test("null edge endpoints drop uniformly — the four operators compose on one dirty list") {
    // a dirty edge list (extraction misses leave null dst/src) must yield
    // the SAME result as the pre-cleaned list in every operator: before
    // the shared filter, pageRank leaked rank mass through null-keyed
    // contributions (inflated out-degree, vanished mass) and degrees
    // emitted up to TWO null-node rows (full_outer never merges null keys)
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L))
    val dirtyDf = (clean.map { case (a, b) => (Option(a), Option(b)) } ++
      Seq((Some(1L), None), (None, Some(3L)), (Option.empty[Long], Option.empty[Long])))
      .toDF("src", "dst")
    val cleanDf = clean.toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.get(0) -> r.toSeq.tail).toMap
    assert(m(Centrality.pageRank(dirtyDf, "src", "dst", 3)) ==
      m(Centrality.pageRank(cleanDf, "src", "dst", 3)))
    assert(m(Centrality.degrees(dirtyDf, "src", "dst")) ==
      m(Centrality.degrees(cleanDf, "src", "dst")))
    assert(m(Centrality.labelPropagation(dirtyDf, "src", "dst", 2)) ==
      m(Centrality.labelPropagation(cleanDf, "src", "dst", 2)))
    assert(m(Centrality.harmonicCentrality(dirtyDf, "src", "dst", maxDist = 3)) ==
      m(Centrality.harmonicCentrality(cleanDf, "src", "dst", maxDist = 3)))
    // and no null node leaks from any of them
    assert(!m(Centrality.degrees(dirtyDf, "src", "dst")).keySet.contains(null))
  }

  test("overflow guard refuses loudly instead of wrapping") {
    val e = intercept[IllegalArgumentException](
      Centrality.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
        iterations = 1, scale = Long.MaxValue / 2))
    assert(e.getMessage.contains("overflow") && e.getMessage.contains("scale"))
  }

  test("degrees counts raw edge rows per side, zero-filled") {
    val got = Centrality.degrees(
      Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((1L, 2L)), 3L -> ((0L, 1L))))
  }

  test("exact harmonic matches hand-computed values on a chain") {
    // 1→2→3→4: harmonic(v) = Σ 1/d over nodes reaching v
    val got = Centrality.exactHarmonic(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(2L, 3L, 4L)) // nothing reaches 1
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) - (1.0 + 0.5)) < 1e-12)
    assert(math.abs(got(4L) - (1.0 + 0.5 + 1.0 / 3)) < 1e-12)
  }

  test("maxDist truncates distance contributions in both implementations") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val ex = Centrality.exactHarmonic(chain, "src", "dst", maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ex == Map(2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
    val hb = Centrality.harmonicCentrality(chain, "src", "dst", maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hb(4L) == 1.0 && hb(1L) == 0.0)
  }

  test("HyperBall agrees with exact harmonic on a small dense graph (sparse-mode HLL is exact)") {
    val edges = (0L until 40L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 5) % 40)))
    val exact = Centrality.exactHarmonic(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val hyper = Centrality.harmonicCentrality(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(hyper.keySet == (0L until 40L).toSet)
    for ((n, (h, ball)) <- hyper; (eh, eball) = exact(n)) {
      assert(math.abs(h - eh) <= eh * 0.02 + 1e-9,
        s"node $n: hyperball $h vs exact $eh")
      assert(math.abs(ball - eball) <= eball * 0.02,
        s"node $n: ball $ball vs exact $eball")
    }
  }

  test("g3 gate check returns no violations at sf0.001") {
    assert(graft.queries.LlmData.g3HarmonicCheck(spark, sf0001).isEmpty)
  }

  test("label propagation: two triangles with a bridge resolve to two communities") {
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val got = Centrality.labelPropagation(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(got(1L), got(2L)).size == 1 && got(11L) == got(12L))
    assert(got(1L) != got(11L), s"bridge merged the triangles: $got")
  }

  test("label propagation keeps self-loop-only nodes (same node universe as degrees)") {
    val got = Centrality.labelPropagation(
      Seq((5L, 5L), (1L, 2L)).toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 5L), got.toString)
    assert(got(5L) == 5L) // no non-self neighbors: keeps its own label
  }

  test("label propagation is deterministic: tie-break and partitioning") {
    // node 3's neighbors {1,2,4,5} all carry distinct labels in round 1 —
    // the (count DESC, label ASC) tie-break must pick 1 deterministically
    val star = Seq((1L, 3L), (2L, 3L), (4L, 3L), (5L, 3L)).toDF("src", "dst")
    val r1 = Centrality.labelPropagation(star, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(3L) == 1L, s"tie must break to the smallest label: $r1")
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60)))
    def run(parts: Int) = Centrality.labelPropagation(
      edges.toDF("src", "dst").repartition(parts), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(11))
  }

  test("g1 gate query agrees with the reference on the derived link graph") {
    val n = graft.sources.Tables.load(spark, sf0001, "documents").count()
    val edges = (0L until n).flatMap(i =>
      (1L to 3L).map(k => (i, (i * 31 + k) % n)))
    val got = graft.queries.LlmData.g1PageRank(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 5))
  }

  test("extreme damping ratios keep the teleport term exact (no Long wrap)") {
    // scale * (dampingDen - dampingNum) = 1e12 * 9999999 ~ 1e19 overflows
    // Long; the teleport constant now computes in BigInteger, so ranks
    // stay non-negative and the near-undamped walk keeps ~all mass in the
    // uniform term
    val ranks = Centrality.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), "src", "dst",
      iterations = 2, dampingNum = 1L, dampingDen = 10000000L,
      scale = 1000000000000L)
      .collect().map(_.getLong(1))
    assert(ranks.forall(_ >= 0L), s"negative rank — teleport term wrapped: ${ranks.toSeq}")
    assert(ranks.forall(r => math.abs(r - 1000000000000L) < 1000000L),
      s"near-undamped ranks should stay ~Scale: ${ranks.toSeq}")
  }
}
