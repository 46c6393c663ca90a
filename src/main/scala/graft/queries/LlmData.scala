package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** LLM-training-data pipeline operators over the `documents` and `embeddings`
  * tables: dedup family, similarity search, text analysis. Oracle SQL is
  * provided wherever DuckDB can reproduce the math bit-for-bit (md5, exact
  * Jaccard via shingle joins, double-precision sequential dot products);
  * hash-dependent ops (MinHash/SimHash signatures) get rows-only checks but
  * their *verified outputs* are exact, so MinHash-LSH shares the exact-Jaccard
  * oracle (recall loss < 1e-7 at the chosen threshold/banding).
  */
object LlmData {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Trained-codebook sidecars, memoized per sf directory — the
    * train-once/serve-many production posture the gates now exercise END
    * TO END: the FIRST invocation trains on the bounded sample, persists
    * through the [[Similarity.savePqModel]]/[[Similarity.saveCodebook]]
    * seam, and every invocation (including the first) serves from the
    * LOADED sidecar, so the serde leg is on the measured path while the
    * M-KMeans fits are paid once per corpus — exactly how a deployment
    * amortizes them across query batches. Drift/recall floors are
    * unchanged: the loaded model reconstructs the trained one
    * bit-for-bit (SimilaritySpec pins the round trip). */
  // lazy-holder memoization (Extras.fixtureOnce's pattern, same rationale):
  // the KMeans fits must not run under the CHM bin lock — that serializes
  // unrelated same-bin builds and recursive-updates if a trainer ever
  // composes another memoized helper
  private final class CodebookHolder(train: String => Unit) {
    // Extras.gateDir registers the dir for JVM-exit cleanup — the same
    // lifecycle every gate workspace has (a bare createTempDirectory
    // here leaked a sidecar dir per JVM)
    lazy val dir: String = { val d = Extras.gateDir("graft-codebook"); train(d); d }
  }
  private val codebookDirs = new java.util.concurrent.ConcurrentHashMap[String, CodebookHolder]()
  private def codebookDir(key: String)(train: String => Unit): String =
    codebookDirs.computeIfAbsent(key, _ => new CodebookHolder(train)).dir
  // one root holds BOTH sidecars (codes are meaningless under another
  // model, so the pair lives and dies together); returning the root from
  // a single seam keeps the memo key in one place and loads the codebook
  // once per call site instead of once per helper
  private def pqRootFor(s: SparkSession, dir: String): String =
    codebookDir(s"pq|$dir") { d =>
      val model = Similarity.trainPq(embs(s, dir), "embedding", dim = 64,
        numSubspaces = 16, numCentroids = 32)
      Similarity.savePqModel(model, s"$d/pq.codebook")
      // the PQ INDEX persists beside its codebook: encode the corpus once,
      // serve every query batch from the stored codes — the production
      // posture, and what makes s8's measured region the QUERY path, not
      // corpus re-encoding
      Similarity.pqEncode(embs(s, dir), "vec_id", "embedding", model)
        .write.mode("overwrite").parquet(s"$d/pq_index")
    }
  private def pqModelFor(s: SparkSession, dir: String): Similarity.PqModel =
    Similarity.loadPqModel(s"${pqRootFor(s, dir)}/pq.codebook")
  private def pqIndexFor(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${pqRootFor(s, dir)}/pq_index")
  private def ivfCodebookFor(s: SparkSession, dir: String): DataFrame = {
    val root = codebookDir(s"ivf|$dir") { d =>
      Similarity.saveCodebook(
        Similarity.trainCentroids(embs(s, dir), "embedding", nCells = 16),
        s"$d/ivf")
    }
    Similarity.loadCodebook(s, s"$root/ivf")
  }

  // ------------------------------------------------------------------ dedup

  def d1Exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "doc_id", "text")

  def d2NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.6)

  def d3MinHashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashLsh(docs(s, dir), "doc_id", "text", n = 3,
      numHashes = 32, rowsPerBand = 2, threshold = 0.6)

  /** Portable-md5 word hashes + maxHamming 3 make the 4-band bucketing
    * EXACT (pigeonhole) and the whole pipeline DuckDB-reproducible. */
  def d4SimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHash(docs(s, dir), "doc_id", "text", maxHamming = 3, portable = true)

  def d5EmbeddingNearDup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(embs(s, dir), "vec_id", "embedding", threshold = 0.45)

  /** SemDeDup check (cluster-blocked semantic near-dup vs the exact pair
    * graph): every semantic pair must exist in the brute-force set with
    * the IDENTICAL rounded cosine (precision = 1 — exact verify), and
    * cell blocking at 16 cells must recover a meaningful fraction of the
    * exact pairs (floor 0.3; near-dup pairs concentrate inside cells by
    * construction, and a broken assignCells — every vector in one cell
    * works too, but garbage per-vector cells — collapses recall toward
    * the 1/16 chance line). Violations returned; correct output EMPTY,
    * pinned by the trivial oracle. */
  def d14SemanticCheck(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val sem = Dedup.semanticNearDup(e, "vec_id", "embedding",
      ivfCodebookFor(s, dir), threshold = 0.45)
      .select(col("id_a"), col("id_b"), col("cosine"))
    val brute = Dedup.embeddingNearDup(e, "vec_id", "embedding", threshold = 0.45)
    val precision = sem
      .join(brute.select(col("id_a"), col("id_b"), col("cosine").as("__bc")),
        Seq("id_a", "id_b"), "left")
      .filter(col("__bc").isNull || col("__bc") =!= col("cosine"))
      .select(col("id_a"), col("id_b"), lit("precision").as("reason"),
        coalesce(col("cosine"), lit(-1.0)).as("value"))
    val recall = brute.select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"))
    val semAs = sem.select(col("id_a").as("query_id"), col("id_b").as("neighbor_id"))
    val recallViol = recallGate(recall, semAs, floor = 0.3, metric = "pair_recall")
      .select(lit(null).cast("bigint").as("id_a"), lit(null).cast("bigint").as("id_b"),
        col("metric").as("reason"), col("recall").as("value"))
    precision.unionByName(recallViol)
  }

  /** The gate link graph: the documents table carries no URLs, so a
    * deterministic pseudo-link derivation stands in — every doc links to
    * `(doc_id*31 + k) mod N` for k∈{1,2,3} (N = doc count; ids are
    * contiguous 0..N-1 in the fixtures, so every target exists and every
    * node has out-degree 3). The DuckDB oracle derives the SAME edges, so
    * the gate pins the centrality ALGORITHM; production edges would come
    * from link extraction upstream. */
  private def linkGraph(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val (n, lo, hi) = {
      val r = d.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).first()
      // min/max over ZERO rows are NULL — unboxing them would NPE before
      // the contiguity require below can name the real problem
      require(r.getLong(0) > 0,
        "g1-g4 link-graph derivation needs a non-empty documents table " +
          s"(got 0 rows in $dir) — was the fixture regenerated empty?")
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // the DuckDB oracle omits the dangling-mass term, which is sound ONLY
    // while every derived dst is an existing node — guaranteed by
    // contiguous 0..N-1 ids. Pin that assumption loudly so a fixture
    // regeneration with filtered/1-based ids fails HERE, naming the
    // oracle-side assumption, instead of hash-mismatching mysteriously.
    require(lo == 0 && hi == n - 1,
      s"g1/g2 link-graph derivation needs contiguous 0..N-1 doc_ids " +
        s"(got min=$lo max=$hi n=$n) — non-contiguous ids create dangling " +
        "nodes the DuckDB oracle does not model")
    deriveLinkEdges(d, "doc_id", n)
  }

  /** The raw `(id*31+k) mod n, k∈{1,2,3}` edge derivation — ONE definition
    * shared by [[linkGraph]] (gates) and the ScaleProbe graph tier, twinned
    * by [[linkGraphCtes]] in SQL; changing it means changing all three. */
  private[graft] def deriveLinkEdges(ids: DataFrame, idCol: String,
      n: Long): DataFrame =
    ids.select(col(idCol).as("src"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
      .select(col("src"), ((col("src") * 31 + col("k")) % n).as("dst"))

  /** PageRank corpus-quality ranking (g1): 5 exact-integer iterations over
    * the pseudo-link graph — bit-identical to the DuckDB oracle's unrolled
    * recomputation because every operation is BIGINT (see
    * [[graft.graph.Centrality.pageRank]]). */
  def g1PageRank(s: SparkSession, dir: String): DataFrame =
    graft.graph.Centrality.pageRank(linkGraph(s, dir), "src", "dst",
      iterations = 5)

  /** Degree centrality baseline (g2) over the same graph. */
  def g2Degrees(s: SparkSession, dir: String): DataFrame =
    graft.graph.Centrality.degrees(linkGraph(s, dir), "src", "dst")

  /** Label-propagation communities (g4) over the undirected link graph —
    * 4 synchronous rounds, integer tie-breaks, so the DuckDB oracle's
    * unrolled recomputation hash-matches exactly (the g1 pattern for a
    * second iterative graph algorithm). */
  def g4LabelProp(s: SparkSession, dir: String): DataFrame =
    graft.graph.Centrality.labelPropagation(linkGraph(s, dir), "src", "dst",
      iterations = 4)

  /** HyperBall harmonic-centrality check (g3, the s4/s6 check pattern):
    * on a BOUNDED deterministic subgraph (nodes < 512 — the exact side is
    * all-pairs quadratic, so the gate pins accuracy at fixed cost instead
    * of exploding with sf), HyperBall's sketch-based harmonic must stay
    * within 15% relative error of the exact BFS answer for every node
    * (HLL at lgK 12 is ~1.6% per ball; 15% is the loose ceiling that
    * still catches a wrong merge direction, a dropped round, or a
    * mis-accumulated 1/t term). Violations returned; correct output
    * EMPTY, pinned by the trivial oracle. */
  def g3HarmonicCheck(s: SparkSession, dir: String): DataFrame = {
    val sub = linkGraph(s, dir)
      .filter(col("src") < 512 && col("dst") < 512)
    val hyper = graft.graph.Centrality.harmonicCentrality(
      sub, "src", "dst", maxDist = 6)
    val exact = graft.graph.Centrality.exactHarmonic(
      sub, "src", "dst", maxDist = 6)
    // LEFT join: exactHarmonic emits no row for a node nothing reaches —
    // such a node's exact value is 0.0, and HyperBall wrongly assigning
    // it mass must still be a violation, not a silently dropped row
    hyper.join(exact.select(col("node"),
        col("harmonic").as("__exact")), Seq("node"), "left")
      .withColumn("__exact", coalesce(col("__exact"), lit(0.0)))
      .filter(abs(col("harmonic") - col("__exact")) >
        col("__exact") * 0.15 + lit(1e-9))
      .select(col("node"), col("harmonic"), col("__exact").as("exact"))
  }

  /** Dup-cluster canonicalization: connected components over the exact
    * n-gram Jaccard pair graph — every clustered doc with its keeper. */
  def d6DedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.ngramJaccard(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.6),
      "id_a", "id_b")

  /** Decontamination: docs ≥ 20 sharing any 5-gram with the doc < 20
    * "benchmark" probe set. */
  def d7Contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.contamination(d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
      "doc_id", "text", "doc_id", "text", n = 5)
  }

  /** Fuzzy decontamination: corpus docs (≥ 20) whose 5-gram Jaccard
    * against any probe doc (< 20) reaches 0.2 — near-dup benchmark
    * leakage, not just shared shingles. */
  def d9FuzzyContamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.fuzzyContamination(d.filter(col("doc_id") >= 20), d.filter(col("doc_id") < 20),
      "doc_id", "text", "doc_id", "text", n = 5, threshold = 0.2)
  }

  /** Incremental dedup: docs < 250 are the "historical corpus" reduced to a
    * content-hash index; docs ≥ 250 arrive as the new batch and dedup
    * against the index + themselves without touching historical bytes. */
  def d8IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val index = d.filter(col("doc_id") < 250).select(md5(col("text")).as("fp")).distinct()
    Dedup.incrementalExact(d.filter(col("doc_id") >= 250), Some(index), "doc_id", "text")
      .select("doc_id", "text")
  }

  /** Bloom-accelerated incremental dedup — IDENTICAL semantics to d8
    * (the oracle is d8's): the sketch pre-filter is pure acceleration,
    * so a bloom bug that drops or passes a row wrongly hash-mismatches. */
  def d19BloomDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val index = d.filter(col("doc_id") < 250).select(md5(col("text")).as("fp")).distinct()
    Dedup.incrementalExactBloom(d.filter(col("doc_id") >= 250), Some(index),
      "doc_id", "text", expectedItems = 300)
      .select("doc_id", "text")
  }

  /** Incremental near-dup: docs ≥ 250 arrive as the new batch and probe the
    * < 250 "historical corpus" through its MinHash band index; survivors
    * near-dup nothing in history. Only colliding history docs are
    * re-tokenized. */
  def d13IncrementalNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.incrementalNearDup(
      d.filter(col("doc_id") >= 250), d.filter(col("doc_id") < 250),
      "doc_id", "text", n = 3, threshold = 0.6)
      .select("doc_id", "text")
  }

  /** Span-level duplication: maximal runs of 8-word windows shared by ≥ 2
    * distinct docs — the substring-dedup regime doc-level d1–d5 can't see. */
  def d10SpanDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(docs(s, dir), "doc_id", "text", n = 8, minDocs = 2)

  /** Quality-aware keeper per dup cluster: same exact-Jaccard pair graph as
    * d6, but the keeper is the cluster's LONGEST doc (tie → min id) — the
    * keep-the-best-copy curation policy. */
  def d11QualityKeeper(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.qualityKeepers(
      Dedup.ngramJaccard(d, "doc_id", "text", n = 3, threshold = 0.6),
      "id_a", "id_b", d, "doc_id", "n_chars")
  }

  /** Span-cut application (the d10 → cut pipeline): duplicated spans removed
    * from every doc; unflagged docs pass through intact. */
  def d12SpanCut(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.cutSpans(d, Dedup.duplicatedSpans(d, "doc_id", "text", n = 8, minDocs = 2),
      "doc_id", "text")
  }

  /** Keep-one-copy span dedup (the Lee et al. REMOVAL semantic): every
    * duplicated span cut everywhere except its globally-first occurrence —
    * content survives the corpus exactly once. Oracle replays detection +
    * content-keyed keeper selection + cut. */
  def d18KeepOneCut(s: SparkSession, dir: String): DataFrame =
    Dedup.keepOneSpanCut(docs(s, dir), "doc_id", "text", n = 8, minDocs = 2)

  /** Arbitrary-length exact-substring regime (Lee et al. ExactSubstr):
    * maximal duplicated substrings of ANY length ≥ 8 tokens, with exact
    * per-occurrence extent, token length, and partner-doc count — what d10's
    * fixed-window islands cannot report. Oracle replays the whole pairwise
    * run/containment pipeline on window strings. */
  def d16ExactSubstring(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSubstrings(docs(s, dir), "doc_id", "text", minLen = 8, maxDf = 1000)

  /** Re-detection after one detect→cut round — the ExactSubstr fixpoint
    * property at the arbitrary-length granularity. Cutting every covered
    * position (d10 coverage = the ExactSubstr cut set) and re-running the
    * maximal-span detector leaves nothing on natural corpora; the oracle
    * replays cut + re-detection exactly, so the gate is green whatever the
    * residue (seam-minted runs are possible in principle — Lee et al.
    * iterate to a fixpoint for the same reason). */
  def d17CutFixpoint(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = Dedup.cutSpans(d,
      Dedup.duplicatedSpans(d, "doc_id", "text", n = 8, minDocs = 2),
      "doc_id", "text")
      .select(col("doc_id"), col("text_cut").as("text"))
    Dedup.exactSubstrings(cut, "doc_id", "text", minLen = 8, maxDf = 1000)
  }

  // ------------------------------------------------------------- similarity

  def s1BruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 3)
  }

  def s2LshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 3, dim = 64, numBits = 16, bandBits = 8)
  }

  /** Self-checking verification of s2: every LSH result present in the
    * brute-force top-k must carry an identical exact cosine, and the LSH
    * ranks must be consistent with cosine order. Violations returned —
    * correct output is EMPTY, which the trivial oracle pins exactly. */
  def s3LshCheck(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bf_cosine"))
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding",
      k = 3, dim = 64, numBits = 16, bandBits = 8)
    val mismatch = lsh.join(bf, Seq("query_id", "neighbor_id"))
      .filter(abs(col("cosine") - col("bf_cosine")) > 1e-9)
      .select(col("query_id"), col("neighbor_id"), lit("cosine_mismatch").as("reason"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    val rankBroken = lsh.withColumn("rk", row_number().over(w))
      .filter(col("rk") =!= col("rank"))
      .select(col("query_id"), col("neighbor_id"), lit("rank_order").as("reason"))
    mismatch.unionByName(rankBroken)
  }

  /** Self-checking verification of the IVF ANN path (same pattern as s3):
    * every IVF result present in brute-force must carry the identical exact
    * cosine, and IVF ranks must be consistent with cosine order. Correct
    * output is EMPTY. The codebook is pinned ([[Similarity.sampledCentroids]],
    * deterministic, zero training) so this gate measures IVF LOOKUP cost —
    * the per-call KMeans retrain of the convenience path regressed the r6
    * bench 2.7× and belongs in s5, which gates the trained path's recall. */
  def s4IvfCheck(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bf_cosine"))
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 3,
      nCells = 16, nProbe = 4,
      codebook = Some(Similarity.sampledCentroids(e, "vec_id", "embedding", nCells = 16)))
    val mismatch = ivf.join(bf, Seq("query_id", "neighbor_id"))
      .filter(abs(col("cosine") - col("bf_cosine")) > 1e-9)
      .select(col("query_id"), col("neighbor_id"), lit("cosine_mismatch").as("reason"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    val rankBroken = ivf.withColumn("rk", row_number().over(w))
      .filter(col("rk") =!= col("rank"))
      .select(col("query_id"), col("neighbor_id"), lit("rank_order").as("reason"))
    mismatch.unionByName(rankBroken)
  }

  /** Shared recall-floor gate: the fraction of `exact` (query, neighbor)
    * pairs recovered by `approx`, returned as a violation row when below
    * `floor` — EMPTY output = gate met. */
  private def recallGate(exact: DataFrame, approx: DataFrame,
      floor: Double, metric: String): DataFrame =
    exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1).as("__hit")),
        Seq("query_id", "neighbor_id"), "left")
      .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("recall"))
      .filter(col("recall") < floor)
      .select(lit(metric).as("metric"), round(col("recall"), 6).as("recall"))

  /** Recall gate for the TRAINED IVF path: a KMeans codebook (bounded-sample
    * training, 5 iterations) probed at nProbe=4 of 16 cells must recover at
    * least 40% of the exact top-3 neighbors. Output is violation rows —
    * correct output is EMPTY, pinned by the trivial oracle. The floor leaves
    * margin under KMeans' partition-order float nondeterminism (observed
    * recall 0.47–0.68); a broken trainCentroids (garbage centroids → recall
    * near nProbe/nCells ≈ 0.25 or below) fails loudly. */
  def s5IvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
    val codebook = ivfCodebookFor(s, dir) // trained once, served from the sidecar
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 3,
      nCells = 16, nProbe = 4, codebook = Some(codebook))
    recallGate(bf, ivf, floor = 0.4, metric = "ivf_recall_at_3")
  }

  /** Gate for the int8-quantized path (s1's memory-scale sibling): on
    * matched (query, neighbor) pairs the quantized cosine must sit within
    * 0.05 of the exact score, and quantized top-3 must recover ≥ 70% of the
    * exact top-3. Violations returned — correct output is EMPTY; violation
    * rows name the offending pair and the drift MAGNITUDE (the s3/s4
    * debuggability contract). Zero-norm vectors cosine to NaN in both
    * paths identically — NaN==NaN pairs are not drift (Spark orders NaN
    * above every double, so a bare `abs(...) > 0.05` would flag them);
    * a NaN on one side only IS a violation. */
  def s6QuantCheck(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("exact_cosine"))
    val quant = Similarity.quantizedTopK(e, q, "vec_id", "embedding", k = 3)
    val drift = quant.join(exact, Seq("query_id", "neighbor_id"))
      .filter((isnan(col("cosine")) =!= isnan(col("exact_cosine"))) ||
        (!isnan(col("cosine")) && !isnan(col("exact_cosine")) &&
          abs(col("cosine") - col("exact_cosine")) > 0.05))
      .select(col("query_id"), col("neighbor_id"), lit("cosine_drift").as("reason"),
        round(abs(col("cosine") - col("exact_cosine")), 6).as("value"))
    val recall = recallGate(exact, quant, floor = 0.7, metric = "recall_floor")
      .select(lit(null).cast("bigint").as("query_id"),
        lit(null).cast("bigint").as("neighbor_id"),
        col("metric").as("reason"), col("recall").as("value"))
    drift.unionByName(recall)
  }

  /** Metadata-filtered ANN: exact top-3 among ENGLISH docs only (pre-filter
    * semantics — every query gets 3 qualifying neighbors; post-filtering a
    * plain top-3 would under-fill). Metadata joins by id; the lang predicate
    * restricts the corpus before any scoring. */
  def s7FilteredTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val meta = docs(s, dir).select(col("doc_id").as("vec_id"), col("lang"))
    val corpus = e.join(broadcast(meta), Seq("vec_id"))
    Similarity.filteredTopK(corpus, e.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 3, predicate = col("lang") === "en")
  }

  /** Gate for the product-quantized path (s6's coarser sibling — ~1/8 the
    * float32 corpus bytes at 16 codes + a norm): matched (query, neighbor)
    * cosines within 0.2 of exact (observed drift 0.08), and PQ top-3
    * recovers >= 20% of exact top-3 (observed 0.33, chance 0.006). Wide
    * floors: PQ error is structurally larger than int8 scalar
    * quantization, and the per-subspace KMeans carries s5's
    * partition-order float nondeterminism. Violations returned — correct
    * output is EMPTY, pinned by the trivial oracle. */
  def s8PqCheck(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("exact_cosine"))
    val model = pqModelFor(s, dir) // trained once, served from the sidecar
    val pq = Similarity.pqTopKFromCodes(pqIndexFor(s, dir), q,
      "vec_id", "embedding", k = 3, model)
    val drift = pq.join(exact, Seq("query_id", "neighbor_id"))
      .filter((isnan(col("cosine")) =!= isnan(col("exact_cosine"))) ||
        (!isnan(col("cosine")) && !isnan(col("exact_cosine")) &&
          abs(col("cosine") - col("exact_cosine")) > 0.2))
      .select(col("query_id"), col("neighbor_id"), lit("cosine_drift").as("reason"),
        round(abs(col("cosine") - col("exact_cosine")), 6).as("value"))
    val recall = recallGate(exact, pq, floor = 0.2, metric = "recall_floor")
      .select(lit(null).cast("bigint").as("query_id"),
        lit(null).cast("bigint").as("neighbor_id"),
        col("metric").as("reason"), col("recall").as("value"))
    drift.unionByName(recall)
  }

  // ------------------------------------------------------------------- text

  def t1LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.languageId(col("text")).as("predicted_lang"))

  def t2Quality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(docs(s, dir), "text")
      .select("doc_id", "n_chars", "n_words", "avg_word_len",
        "uniq_word_ratio", "digit_ratio", "stopword_ratio", "quality_keep")

  def t3Tokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(docs(s, dir), "text")
      .select("doc_id", "n_tokens_ws", "n_tokens_bpe")

  /** Trained classifier gate (t13): multinomial Naive Bayes fit on the
    * first half of the corpus (doc_id < 250, labels = `lang`) classifies
    * EVERY doc; emitted only above the decision margin, so the (id,
    * label) rows are engine-reproducible despite double log-sums (the
    * filtering analogue of d5's round-then-compare). The DuckDB oracle
    * recomputes training counts AND scoring end-to-end — a smoothing,
    * prior, unknown-word, or tie-break divergence hash-mismatches. */
  def t13NbClassify(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.NaiveBayes.classify(d, "doc_id", "text",
      d.filter(col("doc_id") < 250).select(col("lang"), col("text")),
      "text", "lang")
  }

  /** HTML→text gate (t14): every doc's text is embedded (entity-escaped)
    * into a fixed HTML shell with script/style/comment/markup noise, then
    * extracted back through [[TextAnalysis.htmlToText]]. The DuckDB
    * oracle performs the IDENTICAL wrap+strip — every operation in the
    * chain was chosen for Java-regex/RE2 semantic parity, so the result
    * is hash-exact; any engine-divergent construct sneaking into the
    * chain (a backreference, `\s`, greedy flip) mismatches. */
  def t14HtmlText(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      graft.text.TextAnalysis.htmlToText(htmlShellOf(col("text"))).as("clean"))

  /** URL-dedup gate (t15): deterministic MESSY urls fabricated per doc —
    * uppercase scheme/host, www, a default port on every third, a
    * trailing slash on every second, utm/fbclid tracking params around a
    * REAL param (so the separator repair is on the path), a fragment —
    * canonicalize to one of 125 canonical urls (doc groups of 4 whose
    * variants all differ pre-canonicalization) and dedup. The DuckDB
    * oracle rebuilds the same raw urls and recomputes the identical
    * chain; any rule or repair divergence changes group membership and
    * hash-mismatches. */
  def t15UrlDedup(s: SparkSession, dir: String): DataFrame = {
    val raw = docs(s, dir).select(col("doc_id"), concat(
      lit("HTTP://WWW.Site"), (col("doc_id") % 25).cast("string"),
      lit(".Example.COM"),
      when(col("doc_id") % 3 === 0, ":80").otherwise(""),
      lit("/Sec/p"), (col("doc_id") % 125).cast("string"),
      when(col("doc_id") % 2 === 0, "/").otherwise(""),
      lit("?utm_source=feed&id="), (col("doc_id") % 5).cast("string"),
      when(col("doc_id") % 4 === 0, "&fbclid=zz").otherwise(""),
      lit("#sec"), col("doc_id").cast("string")).as("url"))
    graft.text.UrlOps.urlDedup(raw, "doc_id", "url")
  }

  /** Bigram-LM perplexity gate (t16): the CCNet-style quality filter —
    * fit on the doc_id < 250 seed (the t13 convention), score EVERY doc.
    * The DuckDB oracle refits the model end-to-end (same counts, same
    * ln-decomposition) and compares xent/ppl at round-6 — the d5
    * round-then-compare posture; ppl exponentiates the rounded xent in
    * both engines so exp() cannot amplify ulp drift across a boundary. */
  def t16LmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.LanguageModel.perplexity(d, "doc_id", "text",
      d.filter(col("doc_id") < 250).select("text"), "text")
  }

  /** BM25 retrieval gate (s9): first-8-token queries from the first ten
    * docs against the whole corpus, top-5 per query. The DuckDB oracle
    * recomputes the full chain — inverted index, idf, length
    * normalization, and the FIXED-ORDER per-(query,doc) fold
    * (list_reduce over list(... ORDER BY term) twin of
    * aggregate/array_sort) — so scores are bit-identical before the
    * round-6 output formatting and ranks need no tolerance. */
  def s9Bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val qs = d.filter(col("doc_id") < 10).select(col("doc_id").as("qid"),
      array_join(slice(split(col("text"), " "), 1, 8), " ").as("qtext"))
    graft.text.Bm25.search(d, "doc_id", "text", qs, "qid", "qtext", k = 5)
  }

  /** DSIR importance-weight gate (m10): target = the doc_id < 250 seed
    * (the t13/t16 convention), raw = the whole corpus, 4096 hashed
    * unigram+bigram buckets via the portable md5 recipe. The DuckDB
    * oracle refits BOTH distributions end-to-end (same buckets, same
    * add-one smoothing, same ln chain) and compares at round-6. */
  def m10DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.text.Dsir.logWeights(d, "doc_id", "text",
      d.filter(col("doc_id") < 250).select("text"), "text", numBuckets = 4096)
  }

  /** Gopher-rules gate (t17): the fixture's single-line docs are given
    * deterministic line structure by two LITERAL global replaces (" a "
    * -> newline + bullet, " of " -> ellipsis + newline — the same
    * non-overlapping left-to-right scan in both engines), then every
    * published rule signal + the keep flag is emitted. The DuckDB oracle
    * recomputes the identical chain; keep derives from the ROUNDED
    * ratios in both engines. */
  def t17GopherRules(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      replace(replace(col("text"), lit(" a "), lit("\n• ")),
        lit(" of "), lit("...\n")).as("text"))
    graft.text.TextAnalysis.gopherRules(d, "text")
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_ratio", "ellipsis_ratio", "alpha_ratio", "stopword_hits",
        "dup_line_ratio", "gopher_keep")
  }

  /** Paragraph-dedup gate (d15): the fixture's single-line docs get
    * paragraph structure from ONE literal global replace (" the " ->
    * blank line — the identical non-overlapping scan in both engines);
    * the small shared vocabulary makes cross-doc paragraph repeats
    * plentiful, so the dedup genuinely cuts. Hash-exact oracle: md5
    * keepers, (doc, position) first-occurrence order, and the
    * reassembled TEXT itself (no doubles anywhere). */
  def d15ParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      replace(col("text"), lit(" the "), lit("\n\n")).as("text"))
    Dedup.paragraphDedup(d, "doc_id", "text")
  }

  def t4Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))

  def t5Redact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.redact(col("text")).as("redacted"))

  def t6Repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(docs(s, dir), "doc_id", "text", n = 2)

  def t7Chunks(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(docs(s, dir), "doc_id", "text",
      chunkChars = 200, overlapChars = 40)

  /** Corpus word-rarity scoring: the corpus's own unigram counts score each
    * doc (exact-integer arithmetic — engine-portable, unlike a float
    * mean-of-logs). */
  def t9WordRarity(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordRarity(docs(s, dir), "doc_id", "text", rareThreshold = 2)
      .select("doc_id", "n_words", "sum_freq", "n_rare", "mean_freq", "rare_ratio")

  /** BPE tokenizer training over the corpus — oracle-checked EXACTLY since
    * r13: the merge ladder replays in DuckDB as a recursive CTE (one
    * recursion round per merge) with the greedy left-to-right fold
    * expressed as a string replace over ␟-wrapped symbols (each symbol
    * carries its own delimiters, so `replace('␟l␟␟r␟' → '␟lr␟')` is
    * exactly the non-overlapping merge scan — the d15/t17 cross-engine
    * replace contract). Deterministic by the (count DESC, pair ASC)
    * tie-break; additionally pinned by BpeSpec's independent single-node
    * reference trainer. */
  def t11BpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.trainDf(docs(s, dir), "text",
      graft.text.Bpe.Options(numMerges = 32))

  /** BPE ENCODING over the corpus with corpus-trained merges — the serving
    * half of t11. The oracle pins losslessness per doc: md5 of the token
    * concatenation must equal md5 of the whitespace-stripped source text
    * (DuckDB recomputes the right side), so a dropped doc, a dropped or
    * duplicated token, or a corrupted merge application hash-mismatches.
    * WHICH merges apply where is pinned by BpeSpec (independent reference
    * trainer + the rank-priority/training-replay equivalence). */
  def t12BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val merges = graft.text.Bpe.train(d, "text",
      graft.text.Bpe.Options(numMerges = 16))
    graft.text.Bpe.encode(d, "text", merges)
      .select(col("doc_id"), md5(concat_ws("", col("tokens"))).as("detok_md5"))
  }

  /** Sequence packing: per-source contiguous fill of 2048-token shards. */
  def t8Packing(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packing(docs(s, dir), "doc_id", "text",
      groupCol = "source", budgetTokens = 2048L)
      .select("doc_id", "source", "n_tok", "shard")

  /** Packed-sequence materialization: t8's shard assignments turned into
    * actual training sequences (id-ordered member docs joined with an
    * <eos> separator). */
  def t10PackConcat(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.packConcat(docs(s, dir), "doc_id", "text",
      groupCol = "source", budgetTokens = 2048L)
      .select("source", "shard", "packed_text", "n_docs", "sum_tok")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t6_repetition" -> t6Repetition,
    "t7_chunks" -> t7Chunks,
    "d1_exact_dedup" -> d1Exact,
    "d2_ngram_jaccard" -> d2NgramJaccard,
    "d3_minhash_lsh" -> d3MinHashLsh,
    "d4_simhash" -> d4SimHash,
    "d5_embedding_neardup" -> d5EmbeddingNearDup,
    "d6_dedup_clusters" -> d6DedupClusters,
    "d7_contamination" -> d7Contamination,
    "d8_incremental_dedup" -> d8IncrementalDedup,
    "d9_fuzzy_contamination" -> d9FuzzyContamination,
    "d10_span_dedup" -> d10SpanDedup,
    "d11_quality_keeper" -> d11QualityKeeper,
    "d12_span_cut" -> d12SpanCut,
    "d13_incremental_neardup" -> d13IncrementalNearDup,
    "d14_semantic_check" -> d14SemanticCheck,
    "g1_pagerank" -> g1PageRank,
    "g2_degrees" -> g2Degrees,
    "g3_harmonic_check" -> g3HarmonicCheck,
    "g4_label_prop" -> g4LabelProp,
    "s7_filtered_topk" -> s7FilteredTopK,
    "s8_pq_check" -> s8PqCheck,
    "t9_word_rarity" -> t9WordRarity,
    "t10_pack_concat" -> t10PackConcat,
    "t11_bpe_train" -> t11BpeTrain,
    "t12_bpe_encode" -> t12BpeEncode,
    "t13_nb_classify" -> t13NbClassify,
    "t14_html_text" -> t14HtmlText,
    "t15_url_dedup" -> t15UrlDedup,
    "t16_lm_perplexity" -> t16LmPerplexity,
    "s9_bm25_topk" -> s9Bm25TopK,
    "m10_dsir_weights" -> m10DsirWeights,
    "t17_gopher_rules" -> t17GopherRules,
    "d15_paragraph_dedup" -> d15ParagraphDedup,
    "d16_exact_substring" -> d16ExactSubstring,
    "d17_cut_fixpoint" -> d17CutFixpoint,
    "d18_keep_one_cut" -> d18KeepOneCut,
    "d19_bloom_dedup" -> d19BloomDedup,
    "s1_cosine_topk" -> s1BruteForceTopK,
    "s2_lsh_topk" -> s2LshTopK,
    "s3_lsh_check" -> s3LshCheck,
    "s4_ivf_check" -> s4IvfCheck,
    "s5_ivf_recall" -> s5IvfRecall,
    "s6_quant_check" -> s6QuantCheck,
    "t1_langid" -> t1LangId,
    "t2_quality" -> t2Quality,
    "t3_tokens" -> t3Tokens,
    "t4_fingerprint" -> t4Fingerprint,
    "t5_redact" -> t5Redact,
    "t8_packing" -> t8Packing)

  /** Shared CTEs deriving the g1/g2 pseudo-link graph in DuckDB — the
    * SQL twin of [[linkGraph]]. */
  private val linkGraphCtes: String =
    """e AS (SELECT DISTINCT doc_id AS src,
      |        (doc_id * 31 + k.k) % (SELECT count(*) FROM documents) AS dst
      |      FROM documents, (VALUES (1), (2), (3)) k(k)),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)""".stripMargin

  /** The g1 oracle: `iters` PageRank rounds unrolled as chained CTEs
    * (standard SQL forbids aggregation in a recursive term, so a recursive
    * CTE cannot express the per-round regroup — unrolling can). Constants
    * mirror Centrality.pageRank's defaults: scale 1e12, damping 85/100,
    * teleport base = 1e12*15/100. Every level CASTs back to BIGINT because
    * DuckDB widens SUM/products to HUGEINT. */
  private def pageRankOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node,
         |         CAST(150000000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |      SELECT e.dst AS node, SUM(r.rank // dg.d) AS m
         |      FROM r${i - 1} r JOIN dg ON r.node = dg.src
         |      JOIN e ON e.src = r.node
         |      GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $linkGraphCtes,
       |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM nodes),
       |$rounds
       |SELECT node, rank AS rank_scaled FROM r$iters""".stripMargin
  }

  /** The g4 oracle: `iters` synchronous LPA rounds unrolled as chained
    * CTEs over the undirected-ized link graph — all-integer argmax with
    * the (count DESC, label ASC) tie-break, the same determinism argument
    * as [[pageRankOracle]]. */
  private def labelPropOracle(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""l$i AS (SELECT node, lbl FROM (
         |  SELECT eu.a AS node, l.lbl,
         |         row_number() OVER (PARTITION BY eu.a
         |           ORDER BY count(*) DESC, l.lbl ASC) AS rn
         |  FROM eu JOIN l${i - 1} l ON eu.b = l.node
         |  GROUP BY eu.a, l.lbl) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $linkGraphCtes,
       |eu AS (SELECT src AS a, dst AS b FROM e WHERE src <> dst
       |       UNION SELECT dst, src FROM e WHERE src <> dst),
       |n2 AS (SELECT DISTINCT a AS node FROM eu),
       |l0 AS (SELECT node, node AS lbl FROM n2),
       |$rounds
       |SELECT node, lbl AS community FROM l$iters""".stripMargin
  }

  /** The t14/c13 DuckDB expression: wrap `text` in the fixed HTML shell
    * (entity-escaped) and strip it back with the RE2 twin of
    * [[graft.text.TextAnalysis.htmlToText]] — shared so the standalone
    * gate and the WARC-fronted curation E2E pin the SAME chain. */
  private[queries] val htmlShellStripExpr: String =
    """trim(regexp_replace(
      |  replace(replace(replace(replace(replace(
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      '<html><head><title>t</title><style>p { color: red; }</style>' ||
      |      '<script type="text/javascript">var s = "<p>not text</p>";</script>' ||
      |      '</head><body>' || chr(10) || '<h1>Heading</h1>' || chr(10) ||
      |      '<p class="main">' ||
      |      replace(replace(text, '&', '&amp;'), '<', '&lt;') ||
      |      '</p><!-- hidden <b>comment</b> -->&amp;&lt;tail&gt;</body></html>',
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g'),
      |      '<[^>]*>', ' ', 'g'),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |    '&#39;', ''''), '&amp;', '&'),
      |  '[ \t\n\r\f]+', ' ', 'g'))""".stripMargin

  /** The Spark-side twin of [[htmlShellStripExpr]]'s WRAP stage (the strip
    * stage is [[graft.text.TextAnalysis.htmlToText]]): shared by the t14
    * gate and the c13 fixture builder. */
  private[queries] def htmlShellOf(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val esc = regexp_replace(regexp_replace(text, "&", "&amp;"), "<", "&lt;")
    concat(
      lit("<html><head><title>t</title><style>p { color: red; }</style>" +
        "<script type=\"text/javascript\">var s = \"<p>not text</p>\";</script>" +
        "</head><body>\n<h1>Heading</h1>\n<p class=\"main\">"),
      esc,
      lit("</p><!-- hidden <b>comment</b> -->&amp;&lt;tail&gt;</body></html>"))
  }

  private val exactJaccardSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s AS shingle FROM (
      |         SELECT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS s
      |         FROM toks, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
      |       WHERE length(s) > 0),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON id_a = sa.doc_id
      |JOIN sizes sb ON id_b = sb.doc_id
      |WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.6""".stripMargin

  /** DuckDB replay of [[Dedup.exactSubstrings]] (minLen = 8, maxDf = 1000)
    * over a relation `src(doc_id, text)` — shared by the d16 oracle and the
    * d17 re-detection leg. Matches on window STRINGS where Spark matches on
    * xxhash64 (d2's documented 2^-64 collision tolerance). CTE names are
    * e-prefixed so the d17 composition can prepend its cut chain. */
  private def exactSubstrCtes(src: String): String =
    s"""etoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
      |ewins AS (SELECT doc_id, CAST(i - 1 AS INT) AS s,
      |            list_aggregate(w[i:i+7], 'string_agg', ' ') AS win
      |          FROM etoks, UNNEST(range(1, len(w) - 6)) AS t(i)
      |          WHERE len(w) >= 8),
      |elig AS (SELECT win FROM ewins GROUP BY win
      |         HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000),
      |ew2 AS (SELECT doc_id, s, win FROM ewins JOIN elig USING (win)),
      |em AS (SELECT a.doc_id AS ida, b.doc_id AS idb, a.s AS sa, b.s AS sb,
      |              a.s - b.s AS diag
      |       FROM ew2 a JOIN ew2 b ON a.win = b.win AND a.doc_id < b.doc_id),
      |enw AS (SELECT ida, idb, diag, sa, sb,
      |          CASE WHEN sa - lag(sa) OVER (
      |            PARTITION BY ida, idb, diag ORDER BY sa) <= 8
      |          THEN 0 ELSE 1 END AS nw
      |        FROM em),
      |er AS (SELECT ida, idb, diag, sa, sb,
      |         SUM(nw) OVER (PARTITION BY ida, idb, diag ORDER BY sa) AS grp
      |       FROM enw),
      |eruns AS (SELECT ida, idb, min(sa) AS a0, max(sa) + 7 AS a1,
      |                 min(sb) AS b0, max(sb) + 7 AS b1
      |          FROM er GROUP BY ida, idb, diag, grp),
      |eflank AS (SELECT r.*, ta.w AS wa, tb.w AS wb
      |           FROM eruns r
      |           JOIN etoks ta ON ta.doc_id = r.ida
      |           JOIN etoks tb ON tb.doc_id = r.idb),
      |eext AS (SELECT ida, idb, a0, a1, b0, b1,
      |           coalesce(nullif(list_position(list_transform(
      |             list_zip(list_reverse(wa[1:a0]), list_reverse(wb[1:b0])),
      |             z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0) - 1,
      |             least(a0, b0)) AS extl,
      |           coalesce(nullif(list_position(list_transform(
      |             list_zip(wa[a1+2:], wb[b1+2:]),
      |             z -> z[1] IS NOT DISTINCT FROM z[2]), false), 0) - 1,
      |             least(len(wa) - a1 - 1, len(wb) - b1 - 1)) AS extr
      |         FROM eflank),
      |eex2 AS (SELECT ida, idb, a0 - extl AS a0, a1 + extr AS a1,
      |                b0 - extl AS b0, b1 + extr AS b1
      |         FROM eext),
      |eocc AS (SELECT ida AS doc_id, a0 AS s0, a1 AS s1, idb AS partner
      |         FROM eex2
      |         UNION ALL SELECT idb, b0, b1, ida FROM eex2),
      |espans AS (SELECT doc_id, s0, s1, count(DISTINCT partner) AS n_docs
      |           FROM eocc GROUP BY doc_id, s0, s1),
      |epr AS (SELECT doc_id, s0, s1, n_docs,
      |          max(s1) OVER (PARTITION BY doc_id ORDER BY s0 ASC, s1 DESC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |        FROM espans)""".stripMargin

  private val exactSubstrSelect: String =
    """SELECT doc_id, CAST(s0 AS INT) AS span_start, CAST(s1 AS INT) AS span_end,
      |  CAST(s1 - s0 + 1 AS INT) AS span_len, n_docs
      |FROM epr WHERE mp IS NULL OR mp < s1""".stripMargin

  /** The d10 span DETECTION chain as composable CTEs ending in
    * `cspans(doc_id, s0, s1, nw)` — ONE copy of the window/dup/island
    * replay, shared by the d10, d12, d17, and d18 oracles. */
  private val spanDetectCtes: String =
    """ctoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |cwins AS (SELECT doc_id, CAST(i - 1 AS INT) AS s,
      |            list_aggregate(w[i:i+7], 'string_agg', ' ') AS win
      |          FROM ctoks, UNNEST(range(1, len(w) - 6)) AS t(i)
      |          WHERE len(w) >= 8),
      |cdup AS (SELECT win FROM cwins GROUP BY win
      |         HAVING count(DISTINCT doc_id) >= 2),
      |cdw AS (SELECT doc_id, s FROM cwins JOIN cdup USING (win)),
      |cisl AS (SELECT doc_id, s,
      |           CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) <= 8
      |                THEN 0 ELSE 1 END AS nw
      |         FROM cdw),
      |cgrp AS (SELECT doc_id, s,
      |           SUM(nw) OVER (PARTITION BY doc_id ORDER BY s) AS g
      |         FROM cisl),
      |cspans AS (SELECT doc_id, min(s) AS s0, max(s) + 7 AS s1,
      |             count(*) AS nw
      |           FROM cgrp GROUP BY doc_id, g)""".stripMargin

  /** The cut/reassemble chain against a span relation `(doc_id, s0, s1)`
    * — ONE copy of the position-drop replay, parameterized by which span
    * set cuts (all spans for d12/d17, keeper-losing spans for d18). Ends
    * in `cutdocs(doc_id, text_cut, n_words_removed)`. */
  private def cutOnCtes(spanRel: String): String =
    s"""cwords AS (SELECT doc_id, CAST(i - 1 AS INT) AS p, w[i] AS wd
      |           FROM ctoks, UNNEST(range(1, len(w) + 1)) AS t(i)),
      |ckept AS (SELECT wr.doc_id, wr.p, wr.wd FROM cwords wr
      |          WHERE NOT EXISTS (SELECT 1 FROM $spanRel sp
      |            WHERE sp.doc_id = wr.doc_id AND wr.p BETWEEN sp.s0 AND sp.s1)),
      |cutdocs AS (SELECT t.doc_id,
      |    coalesce(string_agg(k.wd, ' ' ORDER BY k.p), '') AS text_cut,
      |    CAST(min(len(t.w)) - count(k.p) AS INT) AS n_words_removed
      |  FROM ctoks t LEFT JOIN ckept k USING (doc_id)
      |  GROUP BY t.doc_id)""".stripMargin

  private val spanCutCtes: String =
    s"$spanDetectCtes,\n${cutOnCtes("cspans")}"

  // shared by d8 and d19 (bloom = pre-filter, never a decision)
  private val incrementalDedupSql: String =
    """WITH ix AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 250),
      |batch AS (
      |  SELECT doc_id, text, md5(text) AS fp,
      |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents WHERE doc_id >= 250)
      |SELECT doc_id, text FROM batch
      |WHERE rn = 1 AND fp NOT IN (SELECT fp FROM ix)""".stripMargin

  val oracle: Map[String, String] = Map(
    // t11: the WHOLE training loop replayed — a recursive CTE carries the
    // (symbol-string, freq) vocabulary across rounds; per round, adjacent
    // pairs explode with a lateral UNNEST, a window SUM counts them
    // freq-weighted, a global first_value window picks the (count DESC,
    // pair ASC) winner, and the merge applies as ONE string replace over
    // ␟-wrapped symbols (wrap = chr(31) + sym + chr(31), so the pattern
    // '␟l␟␟r␟' → '␟lr␟' is the exact greedy non-overlapping fold — shared
    // boundaries are impossible because each symbol owns BOTH its
    // delimiters). Single-symbol words survive the explode via the
    // greatest(len, 2) range and a NULL right guard. A wrong count, a
    // broken tie-break, or a mis-applied merge in ANY round derails every
    // later round and hash-mismatches.
    "t11_bpe_train" ->
      raw"""WITH RECURSIVE
        |vocab AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w),
        |init AS (
        |  SELECT e'\x1f' || array_to_string(string_split(w, ''), e'\x1f\x1f')
        |           || e'\x1f' AS s,
        |         freq
        |  FROM vocab),
        |rec AS (
        |  SELECT 0 AS round, s, freq,
        |         CAST(NULL AS VARCHAR) AS wl, CAST(NULL AS VARCHAR) AS wr,
        |         CAST(NULL AS BIGINT) AS wc
        |  FROM init
        |  UNION ALL
        |  SELECT round + 1,
        |         replace(s, e'\x1f' || wl || e'\x1f\x1f' || wr || e'\x1f',
        |                    e'\x1f' || wl || wr || e'\x1f') AS s,
        |         freq, wl, wr, wc
        |  FROM (
        |    SELECT round, s, freq,
        |           first_value(l) OVER ord AS wl,
        |           first_value(r) OVER ord AS wr,
        |           first_value(cnt) OVER ord AS wc,
        |           row_number() OVER (PARTITION BY s ORDER BY i) AS rn
        |    FROM (
        |      SELECT round, s, freq, i, l, r,
        |             CASE WHEN r IS NULL THEN NULL
        |                  ELSE sum(freq) OVER (PARTITION BY l, r) END AS cnt
        |      FROM (
        |        SELECT round, s, freq, i, syms[i] AS l, syms[i+1] AS r
        |        FROM (SELECT round, s, freq,
        |                     string_split(trim(s, e'\x1f'), e'\x1f\x1f') AS syms
        |              FROM rec),
        |             UNNEST(range(1, greatest(len(syms), 2))) u(i)))
        |    WINDOW ord AS (ORDER BY cnt DESC NULLS LAST, l ASC, r ASC
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |  WHERE rn = 1 AND round < 32 AND wc >= 2)
        |SELECT DISTINCT CAST(round - 1 AS INT) AS rank, wl AS "left",
        |       wr AS "right", wc AS freq
        |FROM rec WHERE round >= 1""".stripMargin,
    // d16: full pairwise-run replay — window strings, DF-capped eligibility,
    // diagonal runs via sa − row_number, both-side projection, per-doc
    // containment pruning. A wrong run boundary, missed projection, or
    // broken pruning hash-mismatches.
    "d16_exact_substring" ->
      s"""WITH ${exactSubstrCtes("documents")}
        |$exactSubstrSelect""".stripMargin,
    // d17: the d12 cut chain feeds the d16 detection chain — one
    // detect→cut→re-detect round, replayed end-to-end
    "d17_cut_fixpoint" ->
      s"""WITH $spanCutCtes,
        |recut AS (SELECT doc_id, text_cut AS text FROM cutdocs),
        |${exactSubstrCtes("recut")}
        |$exactSubstrSelect""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "d8_incremental_dedup" -> incrementalDedupSql,
    // d19 is EXACTLY d8 semantically (the bloom is a pre-filter, never a
    // decision): a false negative in the sketch, a wrongly-dropped fresh
    // row, or a dupe surviving the maybe-join hash-mismatches — ONE shared
    // definition (the no-drifting-copies rule), so the two gates cannot
    // quietly pin different contracts
    "d19_bloom_dedup" -> incrementalDedupSql,
    "d2_ngram_jaccard" -> exactJaccardSql,
    // MinHash-LSH verifies candidates with exact Jaccard; at threshold 0.6
    // with 16 bands × 2 rows the LSH miss probability is < 1e-3 per pair at
    // j = 0.6 and < 1e-12 at the observed pair similarities (≥ 0.85), so the
    // output equals the exact result on this data.
    "d3_minhash_lsh" -> exactJaccardSql,
    // SimHash in portable-md5 mode: DuckDB rebuilds the word hashes from the
    // md5 hex digest (two big-endian 32-bit halves), replays the ±1 bit
    // votes, and compares ALL pairs — exact vs Spark's banded version
    // because maxHamming 3 < 4 bands guarantees a shared band (pigeonhole).
    "d4_simhash" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wh AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(w), 1, 8))::BIGINT AS hi,
        |    ('0x' || substring(md5(w), 9, 8))::BIGINT AS lo
        |  FROM words WHERE length(w) > 0),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (((CASE WHEN b < 32 THEN lo ELSE hi END)
        |          >> (CASE WHEN b < 32 THEN b ELSE b - 32 END)::INT) & 1) = 1
        |        THEN 1 ELSE -1 END) AS v
        |  FROM wh CROSS JOIN range(64) t(b) GROUP BY doc_id, b),
        |sigs AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 AND b < 32
        |                  THEN (1::BIGINT << b::INT) ELSE 0 END) AS BIGINT) AS slo,
        |    CAST(SUM(CASE WHEN v > 0 AND b >= 32
        |                  THEN (1::BIGINT << (b - 32)::INT) ELSE 0 END) AS BIGINT) AS shi
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.slo, b.slo)) + bit_count(xor(a.shi, b.shi)) <= 3""".stripMargin,
    // Connected components replayed in DuckDB: transitive closure over the
    // same exact-Jaccard edge list via recursive CTE, component = min
    // reachable id (UNION dedups, so the recursion terminates).
    "d6_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($exactJaccardSql),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |closure(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a)
        |SELECT a AS id, least(a, min(b)) AS component
        |FROM closure GROUP BY a""".stripMargin,
    // 5-gram shingles via list_aggregate (skips the tail's missing words the
    // same way Spark's slice+concat_ws does on short docs)
    "d7_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         list_aggregate(w[i:i+4], 'string_agg', ' ') AS s
        |       FROM toks, UNNEST(range(1, greatest(len(w) - 3, 2))) AS t(i)),
        |probes AS (SELECT DISTINCT doc_id AS probe_id, s FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20)
        |SELECT c.doc_id, count(*) AS n_hits,
        |  count(DISTINCT p.probe_id) AS n_probes
        |FROM corpus c JOIN probes p USING (s)
        |GROUP BY c.doc_id""".stripMargin,
    // d9 recomputes the exact per-(doc, probe) Jaccard over 5-gram shingle
    // sets; a pair kept/dropped across the threshold, or a wrong set size,
    // hash-mismatches
    "d9_fuzzy_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         list_aggregate(w[i:i+4], 'string_agg', ' ') AS s
        |       FROM toks, UNNEST(range(1, greatest(len(w) - 3, 2))) AS t(i)),
        |probes AS (SELECT DISTINCT doc_id AS probe_id, s FROM sh WHERE doc_id < 20),
        |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id >= 20),
        |psz AS (SELECT probe_id, count(*) AS n_p FROM probes GROUP BY 1),
        |csz AS (SELECT doc_id, count(*) AS n_c FROM corpus GROUP BY 1),
        |inter AS (SELECT c.doc_id, p.probe_id, count(*) AS inter
        |          FROM corpus c JOIN probes p USING (s) GROUP BY 1, 2)
        |SELECT i.doc_id, i.probe_id,
        |  round(i.inter * 1.0 / (csz.n_c + psz.n_p - i.inter), 6) AS jaccard
        |FROM inter i
        |JOIN csz ON i.doc_id = csz.doc_id
        |JOIN psz ON i.probe_id = psz.probe_id
        |WHERE i.inter * 1.0 / (csz.n_c + psz.n_p - i.inter) >= 0.2""".stripMargin,
    // d13: a batch doc survives iff its exact 3-gram Jaccard vs EVERY
    // history doc is < 0.6 (the LSH band probe's miss probability at the
    // observed pair similarities is < 1e-12 — the d3 argument — so the
    // banded result equals this exact recompute)
    "d13_incremental_neardup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s AS shingle FROM (
        |         SELECT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS s
        |         FROM toks, UNNEST(range(1, greatest(len(w) - 1, 2))) AS t(i))
        |       WHERE length(s) > 0),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |xp AS (SELECT b.doc_id AS bid, h.doc_id AS hid, count(*) AS inter
        |       FROM sh b JOIN sh h ON b.shingle = h.shingle
        |       WHERE b.doc_id >= 250 AND h.doc_id < 250
        |       GROUP BY 1, 2),
        |dropped AS (SELECT DISTINCT bid FROM xp
        |            JOIN sizes sb ON bid = sb.doc_id
        |            JOIN sizes sh2 ON hid = sh2.doc_id
        |            WHERE inter * 1.0 / (sb.n_sh + sh2.n_sh - inter) >= 0.6)
        |SELECT doc_id, text FROM documents
        |WHERE doc_id >= 250 AND doc_id NOT IN (SELECT bid FROM dropped)""".stripMargin,
    // d10 replays the whole span pipeline on window STRINGS (Spark joins on
    // xxhash64 of the window — d2's documented 2^-64 collision tolerance):
    // full 8-word windows, ≥2-distinct-doc filter, island merge with gap > 8
    // starting a new span. A wrong window set, off-by-one merge, or missed
    // duplicate hash-mismatches.
    "d10_span_dedup" ->
      s"""WITH $spanDetectCtes
        |SELECT doc_id, CAST(s0 AS INT) AS span_start,
        |  CAST(s1 AS INT) AS span_end, nw AS n_windows
        |FROM cspans""".stripMargin,
    // d18 extends the shared detection with content-keyed keeper
    // selection: islands group by the md5 of their covered words, the
    // globally-first occurrence (doc, start) survives, every other
    // occurrence cuts via the shared cut chain. A wrong keeper order, a
    // mis-sliced content key, or a cut keeper hash-mismatches.
    "d18_keep_one_cut" ->
      s"""WITH $spanDetectCtes,
        |kcontent AS (SELECT sp.doc_id, sp.s0, sp.s1,
        |    md5(list_aggregate(t.w[sp.s0 + 1:sp.s1 + 1], 'string_agg', ' ')) AS key
        |  FROM cspans sp JOIN ctoks t USING (doc_id)),
        |klose AS (SELECT doc_id, s0, s1 FROM (
        |    SELECT doc_id, s0, s1,
        |      row_number() OVER (PARTITION BY key ORDER BY doc_id, s0) AS rn
        |    FROM kcontent) WHERE rn > 1),
        |${cutOnCtes("klose")}
        |SELECT doc_id, text_cut, n_words_removed FROM cutdocs""".stripMargin,
    // d11 = d6's recursive-CTE closure + keeper re-picked by quality
    // (n_chars DESC, id ASC) per component
    "d11_quality_keeper" ->
      s"""WITH RECURSIVE pairs AS ($exactJaccardSql),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |closure(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS component
        |         FROM closure GROUP BY a),
        |scored AS (SELECT c.id, c.component, d.n_chars
        |           FROM comp c JOIN documents d ON c.id = d.doc_id)
        |SELECT id AS doc_id, component,
        |  first_value(id) OVER (PARTITION BY component
        |    ORDER BY n_chars DESC, id ASC) AS keeper
        |FROM scored""".stripMargin,
    // d12 extends the d10 replay with the cut itself: word positions inside
    // any span are dropped, the rest re-join in order; docs with no spans
    // pass through via the LEFT JOIN (and an all-removed doc degrades to ''
    // exactly as array_join of an empty array does)
    // composed from the SAME spanCutCtes the d17 oracle re-detects over —
    // one copy of the cut replay, per the repo's no-drifting-copies rule
    "d12_span_cut" ->
      s"""WITH $spanCutCtes
        |SELECT doc_id, text_cut, n_words_removed FROM cutdocs""".stripMargin,
    // s7 = s1's exact top-k with the corpus pre-filtered to English docs by
    // the metadata join — a neighbor list containing any non-en id, or
    // under-filled because the filter ran after ranking, hash-mismatches
    "s7_filtered_topk" ->
      """SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
        |  FROM embeddings q
        |  JOIN (SELECT e.vec_id, e.embedding FROM embeddings e
        |        JOIN documents d ON e.vec_id = d.doc_id WHERE d.lang = 'en') c
        |    ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 3""".stripMargin,
    // t9: exact-integer rarity arithmetic — SUMs cast from DuckDB's HUGEINT
    // widening back to BIGINT; ratios divide two exact integers (one
    // correctly-rounded double op, engine-portable)
    "t9_word_rarity" ->
      """WITH tk AS (SELECT doc_id, w FROM (
        |        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |      WHERE length(w) > 0),
        |vocab AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w)
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(SUM(cnt) AS BIGINT) AS sum_freq,
        |  CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  round(CAST(SUM(cnt) AS DOUBLE) / count(*), 6) AS mean_freq,
        |  round(CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 6) AS rare_ratio
        |FROM tk JOIN vocab USING (w)
        |GROUP BY doc_id""".stripMargin,
    // t12's oracle pins BPE-encode LOSSLESSNESS per doc: the token
    // concatenation must md5-match the whitespace-stripped source text
    // (segmentation itself is BpeSpec-pinned — no SQL engine can replay a
    // merge ladder in one shot)
    "t12_bpe_encode" ->
      """SELECT doc_id, md5(regexp_replace(text, '\s+', '', 'g')) AS detok_md5
        |FROM documents""".stripMargin,
    // s3 is a self-check: its correct output is EMPTY, pinned by a
    // schema-matching empty oracle (like the q9/q10 zero-violation tests).
    "s3_lsh_check" ->
      """SELECT vec_id AS query_id, vec_id AS neighbor_id, 'x' AS reason
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // s4 mirrors s3 for the IVF path: correct output is EMPTY.
    "s4_ivf_check" ->
      """SELECT vec_id AS query_id, vec_id AS neighbor_id, 'x' AS reason
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // s5 is a recall floor on the trained-codebook path: EMPTY when met.
    "s5_ivf_recall" ->
      """SELECT 'x' AS metric, 0.0 AS recall
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // s6 gates the int8-quantized path (score drift + recall floor): EMPTY.
    "s6_quant_check" ->
      """SELECT vec_id AS query_id, vec_id AS neighbor_id,
        |  'x' AS reason, 0.0 AS value
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // s8 gates the product-quantized path the same way: EMPTY when met.
    "s8_pq_check" ->
      """SELECT vec_id AS query_id, vec_id AS neighbor_id,
        |  'x' AS reason, 0.0 AS value
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // d14: SemDeDup check — EMPTY when precision is exact and cell-blocked
    // recall clears the floor (the s3-s8 pattern for engine-side invariants)
    "d14_semantic_check" ->
      """SELECT vec_id AS id_a, vec_id AS id_b, 'x' AS reason, 0.0 AS value
        |FROM embeddings WHERE 1 = 0""".stripMargin,
    // g1: DuckDB unrolls the 5 exact-integer PageRank iterations over the
    // same derived edges — every op is BIGINT (// = integer division), so
    // the engines agree bit-for-bit; any float sneaking into the Spark
    // path, a wrong damping floor, or a missed contribution hash-mismatches
    "g1_pagerank" -> pageRankOracle(5),
    // g4: four unrolled LPA rounds — any divergence in the undirected-ize,
    // the vote count, or the tie-break hash-mismatches
    "g4_label_prop" -> labelPropOracle(4),
    // t14: the identical wrap+strip chain in DuckDB (RE2) — patterns were
    // chosen for Java/RE2 parity (non-greedy + inline flags only, explicit
    // whitespace class, literal entity replaces, &amp; last)
    "t14_html_text" ->
      s"SELECT doc_id, $htmlShellStripExpr AS clean\nFROM documents",
    // t15: the same raw-url fabrication + canonicalization chain in DuckDB
    // (lateral column aliases keep the steps readable); regexp_extract
    // returns '' on no-match in BOTH engines, which the scheme-less branch
    // relies on
    "t15_url_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |  'HTTP://WWW.Site' || CAST(doc_id % 25 AS VARCHAR) || '.Example.COM' ||
        |  CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END ||
        |  '/Sec/p' || CAST(doc_id % 125 AS VARCHAR) ||
        |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |  '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) ||
        |  CASE WHEN doc_id % 4 = 0 THEN '&fbclid=zz' ELSE '' END ||
        |  '#sec' || CAST(doc_id AS VARCHAR) AS u
        |  FROM documents),
        |canon AS (SELECT doc_id,
        |  regexp_replace(trim(u), '#.*', '', 'g') AS nofrag,
        |  lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
        |  regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '', 'g') AS rest,
        |  (sch = '' AND rest LIKE '//%') AS prel,
        |  CASE WHEN prel THEN regexp_replace(rest, '^//', '', 'g')
        |       ELSE rest END AS body,
        |  regexp_extract(body, '^([^/?]*)', 1) AS auth,
        |  regexp_extract(auth, '^([^/?@]*@)', 1) AS uinfo,
        |  lower(regexp_replace(auth, '^[^/?@]*@', '', 'g')) AS hostport,
        |  regexp_replace(regexp_replace(hostport, '^www\.', '', 'g'),
        |    '\.(:[0-9]+)?$', '\1', 'g') AS host0,
        |  CASE WHEN sch = 'http' THEN regexp_replace(host0, ':80$', '', 'g')
        |       WHEN sch = 'https' THEN regexp_replace(host0, ':443$', '', 'g')
        |       ELSE host0 END AS host,
        |  regexp_replace(body, '^[^/?]*', '', 'g') AS afterauth,
        |  regexp_extract(afterauth, '^([^?]*)', 1) AS pathpart,
        |  regexp_replace(afterauth, '^[^?]*', '', 'g') AS querypart,
        |  regexp_replace(querypart,
        |    '&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '', 'g') AS q1,
        |  regexp_replace(q1,
        |    '^\?(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*&?', '?', 'g') AS q2,
        |  regexp_replace(q2, '^\?$', '', 'g') AS qq,
        |  regexp_replace(pathpart, '/$', '', 'g') AS pth,
        |  CASE WHEN sch = ''
        |       THEN (CASE WHEN prel THEN '//' ELSE '' END) ||
        |            uinfo || host || pth || qq
        |       ELSE sch || '://' || uinfo || host || pth || qq
        |       END AS url_canon
        |  FROM raw)
        |SELECT url_canon, CAST(min(doc_id) AS BIGINT) AS keeper,
        |       CAST(count(*) AS BIGINT) AS n_dups
        |FROM canon GROUP BY 1""".stripMargin,
    // g3: HyperBall accuracy check — EMPTY when every node's sketch-based
    // harmonic is within tolerance of the exact BFS answer (engine-side
    // invariant, the s4/s6 pattern; GraphSpec pins the positive behavior)
    "g3_harmonic_check" ->
      """SELECT doc_id AS node, 0.0 AS harmonic, 0.0 AS exact
        |FROM documents WHERE 1 = 0""".stripMargin,
    // t13: DuckDB refits the same Naive Bayes (integer counts, Laplace +1,
    // the same score decomposition) and applies the same margin filter —
    // the margin (1e-6) dwarfs cross-engine ln()/summation-order drift
    // (~1e-12), so the emitted (doc, label) set is deterministic.
    // coalesce(text, '') mirrors the Spark side's NULL-text-is-empty-doc
    // convention (one empty-string token; no row silently vanishes).
    "t13_nb_classify" ->
      """WITH seed AS (SELECT lang, coalesce(text, '') AS text
        |             FROM documents WHERE doc_id < 250),
        |sw AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM seed),
        |wc AS (SELECT lang, w, count(*) AS cnt FROM sw GROUP BY 1, 2),
        |ct AS (SELECT lang, count(*) AS tot FROM sw GROUP BY 1),
        |cd AS (SELECT lang, count(*) AS nd FROM seed GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM wc),
        |ns AS (SELECT count(*) AS n FROM seed),
        |dw AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
        |       FROM documents),
        |dl AS (SELECT doc_id, count(*) AS n FROM dw GROUP BY 1),
        |sl AS (SELECT dw.doc_id, wc.lang, SUM(ln(wc.cnt + 1)) AS s
        |       FROM dw JOIN wc ON dw.w = wc.w GROUP BY 1, 2),
        |sc AS (SELECT dl.doc_id, cd.lang,
        |              ln(CAST(cd.nd AS DOUBLE)) - ln(CAST(ns.n AS DOUBLE))
        |              - dl.n * ln(CAST(ct.tot + v.v AS DOUBLE))
        |              + COALESCE(sl.s, 0) AS score
        |       FROM dl CROSS JOIN cd
        |       JOIN ct ON ct.lang = cd.lang
        |       CROSS JOIN v CROSS JOIN ns
        |       LEFT JOIN sl ON sl.doc_id = dl.doc_id AND sl.lang = cd.lang),
        |rk AS (SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, lang ASC) AS rn,
        |         lead(score) OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, lang ASC) AS nxt
        |       FROM sc)
        |SELECT doc_id, lang AS predicted FROM rk
        |WHERE rn = 1 AND (nxt IS NULL OR score - nxt > 1e-6)""".stripMargin,
    // t16: DuckDB refits the bigram LM end-to-end — same BOS-prefixed
    // bigrams (chr(2) = the Scala U+0002 sentinel), same add-one
    // smoothing and ln-decomposition (inner joins over SEEN pairs/contexts
    // + the n·ln(V) closed form) — and compares xent at round-6; ppl
    // exponentiates the ROUNDED xent in both engines so exp() cannot
    // amplify last-ulp drift across a rounding boundary
    "t16_lm_perplexity" ->
      """WITH seed AS (SELECT text FROM documents WHERE doc_id < 250),
        |sw AS (SELECT string_split(text, ' ') AS w FROM seed),
        |sb AS (SELECT unnest(list_zip(list_prepend(chr(2), w[1:len(w)-1]), w)) AS p
        |       FROM sw),
        |pc AS (SELECT p[1] AS hist, p[2] AS cur, count(*) AS c FROM sb GROUP BY 1, 2),
        |cc AS (SELECT hist, SUM(c) AS c FROM pc GROUP BY 1),
        |v AS (SELECT count(DISTINCT cur) + 1 AS v FROM pc),
        |dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |db AS (SELECT doc_id,
        |         unnest(list_zip(list_prepend(chr(2), w[1:len(w)-1]), w)) AS p
        |       FROM dw),
        |sp AS (SELECT db.doc_id, SUM(ln(CAST(pc.c + 1 AS DOUBLE))) AS s
        |       FROM db JOIN pc ON db.p[1] = pc.hist AND db.p[2] = pc.cur
        |       GROUP BY 1),
        |sc AS (SELECT db.doc_id,
        |         SUM(ln(CAST(cc.c + v.v AS DOUBLE)) - ln(CAST(v.v AS DOUBLE))) AS s
        |       FROM db JOIN cc ON db.p[1] = cc.hist CROSS JOIN v GROUP BY 1),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |x AS (SELECT dl.doc_id, dl.n,
        |        round((CAST(dl.n AS DOUBLE) * ln(CAST(v.v AS DOUBLE))
        |               + COALESCE(sc.s, 0.0) - COALESCE(sp.s, 0.0))
        |              / CAST(dl.n AS DOUBLE), 6) AS xent
        |      FROM dl CROSS JOIN v
        |      LEFT JOIN sp ON sp.doc_id = dl.doc_id
        |      LEFT JOIN sc ON sc.doc_id = dl.doc_id)
        |SELECT doc_id, n AS n_tokens, xent, round(exp(xent), 6) AS ppl FROM x""".stripMargin,
    // d15: hash-exact — md5 paragraph keepers at corpus-wide
    // (doc, position) first-occurrence order and the reassembled text
    // itself; the only engine-facing subtlety is posexplode's 0-based vs
    // generate_subscripts' 1-based position, which only ORDERS (never
    // emitted), so the uniform shift is invisible
    "d15_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, replace(text, ' the ', e'\n\n') AS text
        |           FROM documents),
        |p AS (SELECT doc_id, unnest(ps) AS para,
        |             generate_subscripts(ps, 1) AS pos
        |      FROM (SELECT doc_id, string_split(text, e'\n\n') AS ps FROM d)),
        |k AS (SELECT doc_id, para, pos,
        |        row_number() OVER (PARTITION BY md5(para)
        |          ORDER BY doc_id, pos) AS rn
        |      FROM p),
        |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |        string_agg(para, e'\n\n' ORDER BY pos) AS text_dedup
        |      FROM k WHERE rn = 1 GROUP BY doc_id),
        |np AS (SELECT doc_id,
        |         CAST(len(string_split(text, e'\n\n')) AS BIGINT) AS n_paras
        |       FROM d)
        |SELECT np.doc_id, COALESCE(r.text_dedup, '') AS text_dedup,
        |       np.n_paras, COALESCE(r.n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM np LEFT JOIN r ON np.doc_id = r.doc_id""".stripMargin,
    // t17: the full Gopher-rule chain recomputed — literal replaces for
    // the fabricated line structure, space/newline splits, length-diff
    // symbol counts, list filters for the line/word predicates — with
    // gopher_keep derived from the ROUNDED ratios exactly as the engine
    // does, so the boolean needs no tolerance
    "t17_gopher_rules" ->
      """WITH d AS (SELECT doc_id,
        |    replace(replace(text, ' a ', e'\n• '), ' of ', e'...\n') AS text
        |  FROM documents),
        |x AS (SELECT doc_id, text,
        |    string_split(text, ' ') AS w,
        |    string_split(text, chr(10)) AS l,
        |    length(text) AS nc
        |  FROM d),
        |sig AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  round(CAST(nc - (len(w) - 1) AS DOUBLE) / len(w), 6) AS mean_word_len,
        |  round(CAST((nc - length(replace(text, '#', '')))
        |             + (nc - length(replace(text, '...', ''))) / 3
        |        AS DOUBLE) / len(w), 6) AS symbol_ratio,
        |  round(CAST(len(list_filter(l, x -> starts_with(x, '•')
        |             OR starts_with(x, '- '))) AS DOUBLE) / len(l), 6) AS bullet_ratio,
        |  round(CAST(len(list_filter(l, x -> ends_with(x, '...')))
        |        AS DOUBLE) / len(l), 6) AS ellipsis_ratio,
        |  round(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
        |        AS DOUBLE) / len(w), 6) AS alpha_ratio,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |        s -> list_contains(w, s))) AS BIGINT) AS stopword_hits,
        |  round(1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 6) AS dup_line_ratio
        |  FROM x)
        |SELECT *,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        |   AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
        |   AND stopword_hits >= 2 AND dup_line_ratio <= 0.3) AS gopher_keep
        |FROM sig""".stripMargin,
    // m10: DuckDB refits both DSIR distributions end-to-end — the same
    // portable md5 buckets over unigram+bigram features, add-one
    // smoothing, and the same per-bucket ln chain — and compares the
    // per-doc weight sum at round-6 (the d5/t16 posture; the ~4096-term
    // sum's order drift is ~1e-12 against a 5e-7 rounding boundary)
    "m10_dsir_weights" ->
      """WITH tw AS (SELECT string_split(text, ' ') AS w FROM documents
        |            WHERE doc_id < 250),
        |tf AS (SELECT unnest(w) AS f FROM tw
        |       UNION ALL
        |       SELECT p[1] || ' ' || p[2] FROM (
        |         SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p
        |         FROM tw)),
        |tb AS (SELECT ('0x' || substring(md5(f || ':0'), 1, 8))::BIGINT % 4096 AS b
        |       FROM tf),
        |tc AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tb GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tb),
        |cw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |cf AS (SELECT doc_id, unnest(w) AS f FROM cw
        |       UNION ALL
        |       SELECT doc_id, p[1] || ' ' || p[2] FROM (
        |         SELECT doc_id, unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p
        |         FROM cw)),
        |cb AS (SELECT doc_id,
        |         ('0x' || substring(md5(f || ':0'), 1, 8))::BIGINT % 4096 AS b
        |       FROM cf),
        |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c FROM cb GROUP BY 1, 2),
        |rc AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM db GROUP BY 1),
        |rt AS (SELECT CAST(SUM(cr) AS BIGINT) AS t FROM rc),
        |wt AS (SELECT rc.b,
        |         ln(CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE))
        |         - ln(CAST(tt.t + 4096 AS DOUBLE))
        |         - ln(CAST(rc.cr + 1 AS DOUBLE))
        |         + ln(CAST(rt.t + 4096 AS DOUBLE)) AS lnw
        |       FROM rc LEFT JOIN tc ON rc.b = tc.b
        |       CROSS JOIN tt CROSS JOIN rt)
        |SELECT db.doc_id,
        |       round(SUM(CAST(db.c AS DOUBLE) * wt.lnw), 6) AS dsir_logw
        |FROM db JOIN wt ON db.b = wt.b GROUP BY 1""".stripMargin,
    // s9: full BM25 chain recomputed — inverted index, idf, length
    // normalization (every non-exact literal CAST AS DOUBLE so decimal
    // arithmetic never diverges from Spark's double literals), and the
    // FIXED-ORDER per-(query,doc) fold: list_reduce over
    // list(... ORDER BY term) is the left-fold twin of Spark's
    // aggregate(array_sort(collect_list)), so scores are bit-identical
    // and ranks carry no tolerance
    "s9_bm25_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |             CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE) AS avgdl FROM documents),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |idf AS (SELECT t, ln(1.0 + (n.n - CAST(df AS DOUBLE) + 0.5)
        |                           / (CAST(df AS DOUBLE) + 0.5)) AS idf
        |        FROM df CROSS JOIN n),
        |q AS (SELECT DISTINCT q, t FROM (
        |        SELECT doc_id AS q, unnest(string_split(text, ' ')[1:8]) AS t
        |        FROM documents WHERE doc_id < 10)),
        |c AS (SELECT q.q, tf.doc_id AS d, q.t,
        |        idf.idf * (CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
        |        / (CAST(tf.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
        |           * (0.25 + (0.75 * CAST(dl.len AS DOUBLE)) / n.avgdl)) AS c
        |      FROM q JOIN tf ON q.t = tf.t
        |      JOIN idf ON idf.t = q.t
        |      JOIN dl ON dl.doc_id = tf.doc_id
        |      CROSS JOIN n),
        |s AS (SELECT q, d, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list(c ORDER BY t)), (a, b) -> a + b) AS s
        |      FROM c GROUP BY q, d),
        |r AS (SELECT q, d, s,
        |        row_number() OVER (PARTITION BY q ORDER BY s DESC, d ASC) AS rank
        |      FROM s)
        |SELECT q AS query_id, d AS doc_id, CAST(rank AS INT) AS rank,
        |       round(s, 6) AS bm25
        |FROM r WHERE rank <= 5""".stripMargin,
    "g2_degrees" ->
      s"""WITH $linkGraphCtes,
         |o AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS c
         |      FROM e GROUP BY src),
         |i AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS c
         |      FROM e GROUP BY dst)
         |SELECT n.node, CAST(COALESCE(o.c, 0) AS BIGINT) AS out_degree,
         |       CAST(COALESCE(i.c, 0) AS BIGINT) AS in_degree
         |FROM nodes n LEFT JOIN o ON n.node = o.node
         |LEFT JOIN i ON n.node = i.node""".stripMargin,
    "d5_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin,
    "s1_cosine_topk" ->
      """SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) AS cosine,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |WHERE rank <= 3""".stripMargin,
    "t1_langid" ->
      """SELECT doc_id, CASE
        |  WHEN de >= en AND de >= es AND de >= fr AND de > 0 THEN 'de'
        |  WHEN en >= es AND en >= fr AND en > 0 THEN 'en'
        |  WHEN es >= fr AND es > 0 THEN 'es'
        |  WHEN fr > 0 THEN 'fr'
        |  ELSE 'und' END AS predicted_lang
        |FROM (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS en,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('der','die','das','und','ist','ein','nicht','mit','auf','zu'))) AS de,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que','y','en','un','es','no','por'))) AS es,
        |  len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','et','un','est','pas','pour','que','dans'))) AS fr
        |FROM documents)""".stripMargin,
    "t2_quality" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(string_split(text, ' ')) AS n_words,
        |  round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
        |        / len(string_split(text, ' ')), 6) AS avg_word_len,
        |  round(len(list_distinct(string_split(text, ' '))) * 1.0
        |        / len(string_split(text, ' ')), 6) AS uniq_word_ratio,
        |  round(len(regexp_extract_all(text, '[0-9]')) * 1.0 / length(text), 6) AS digit_ratio,
        |  round(len(list_filter(string_split(text, ' '),
        |        w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) * 1.0
        |        / len(string_split(text, ' ')), 6) AS stopword_ratio,
        |  (len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 100000
        |   AND round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
        |        / len(string_split(text, ' ')), 6) >= 2
        |   AND round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
        |        / len(string_split(text, ' ')), 6) <= 15
        |   AND round(len(list_distinct(string_split(text, ' '))) * 1.0
        |        / len(string_split(text, ' ')), 6) > 0.1) AS quality_keep
        |FROM documents""".stripMargin,
    "t3_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens_ws,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe
        |FROM documents""".stripMargin,
    // full 2-word windows only — a doc under 2 words has no grams and no
    // row (mirrors the engine's full-window convention)
    "t6_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (SELECT doc_id, list_aggregate(w[i:i+1], 'string_agg', ' ') AS g
        |          FROM toks, UNNEST(range(1, len(w))) AS t(i)
        |          WHERE len(w) >= 2),
        |counts AS (SELECT doc_id, g, count(*) AS c FROM grams
        |           WHERE length(g) > 0 GROUP BY 1, 2),
        |ranked AS (SELECT doc_id, g, c,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn,
        |    SUM(c) OVER (PARTITION BY doc_id) AS total
        |  FROM counts)
        |SELECT doc_id, g AS top_gram, c AS top_count,
        |  round(c * 1.0 / total, 6) AS top_fraction
        |FROM ranked WHERE rn = 1""".stripMargin,
    // chunking: stride 160 = 200 - 40; chunk i = substring(i*160+1, 200)
    "t7_chunks" ->
      """SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  substring(text, CAST(i * 160 + 1 AS INT), 200) AS chunk_text,
        |  CAST(length(substring(text, CAST(i * 160 + 1 AS INT), 200)) AS INT) AS chunk_len
        |FROM documents, UNNEST(range(0,
        |  greatest(CAST(ceil((length(text) - 40) * 1.0 / 160) AS BIGINT), 1))) AS t(i)""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM documents""".stripMargin,
    "t5_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\d{7,}', '<NUM>', 'g') AS redacted
        |FROM documents""".stripMargin,
    // t10 re-derives t8's shard formula, then rebuilds each packed
    // sequence with an ORDER BY doc_id string_agg — a member out of
    // order, in the wrong shard, or a malformed separator hash-mismatches
    "t10_pack_concat" ->
      """WITH p AS (
        |  SELECT doc_id, source, text,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok,
        |    CAST(floor(
        |      (CAST(SUM(ceil(length(text) / 4.0))
        |              OVER (PARTITION BY source ORDER BY doc_id) AS DOUBLE)
        |       - ceil(length(text) / 4.0)) / 2048.0) AS BIGINT) AS shard
        |  FROM documents)
        |SELECT source, shard,
        |  string_agg(text, ' <eos> ' ORDER BY doc_id) AS packed_text,
        |  count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |FROM p GROUP BY source, shard""".stripMargin,
    // contiguous-fill packing: shard = floor(tokens_before / 2048); the
    // window SUM is cast before the division (DuckDB integer SUM widens to
    // HUGEINT) and tokens_before = running sum minus the row's own count
    "t8_packing" ->
      """SELECT doc_id, source,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok,
        |  CAST(floor(
        |    (CAST(SUM(ceil(length(text) / 4.0))
        |            OVER (PARTITION BY source ORDER BY doc_id) AS DOUBLE)
        |     - ceil(length(text) / 4.0)) / 2048.0) AS BIGINT) AS shard
        |FROM documents""".stripMargin)
}
