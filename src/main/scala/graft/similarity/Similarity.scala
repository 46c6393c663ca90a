package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     At 100 TB this is only viable for a bounded query set against a large
  *     corpus (queries broadcast; corpus scanned once, per-partition top-k via
  *     window).
  *   - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed by
  *     sign-bit signatures; candidates come from matching buckets (multi-probe
  *     over bands), then exact cosine re-ranks. The bucket join replaces the
  *     cross join, which is the part that survives a 1000-executor scale-up.
  *
  * All arithmetic is built-in array expressions (`zip_with`/`aggregate`) —
  * sequential folds, so scores are bit-deterministic across engines.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = graft.functions.ArrayMath.dot(a, b)

  private def norm(a: Column): Column = graft.functions.ArrayMath.l2Norm(a)

  /** Null-safe cosine — the ONE definition, shared with the dedup family:
    * NULL when either norm is zero (see [[graft.functions.ArrayMath.cosine]]
    * for the ANSI rationale). [[topKByCosine]] excludes the NULL/NaN rows. */
  private def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    graft.functions.ArrayMath.cosine(a, b, na, nb)

  /** Shared epilogue of every ANN path: per-query rank by cosine (neighbor
    * id breaks ties for determinism), keep the top k, round the score.
    * One definition so the tie-break/rounding contract cannot drift between
    * the brute-force, LSH, IVF and quantized variants.
    *
    * NaN cosines are EXCLUDED before ranking: a zero-norm vector (which
    * real corpora contain) scores 0/0 = NaN against every query, and Spark
    * sorts NaN above every double under DESC — without the filter that one
    * garbage row would be the rank-1 "nearest neighbor" of every query. A
    * zero-norm vector has no direction, hence no cosine neighbors; it
    * simply never appears in results (and a zero-norm QUERY gets none). */
  private def topKByCosine(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.filter(!isnan(col("cosine")) && col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors
    * (excluding itself). Ties broken by neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms hoisted out of the pair loop; pairwise arithmetic unchanged
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topKByCosine(scored, k)
  }

  /** Metadata-filtered ANN ("filtered vector search"): exact top-k among the
    * corpus vectors satisfying `predicate` — PRE-filter semantics: the
    * predicate restricts the corpus BEFORE ranking, so every query still
    * gets k qualifying neighbors (post-filtering a plain top-k instead
    * under-fills whenever ≥1 of the k nearest fails the predicate — the
    * classic filtered-search bug). Attach metadata by joining it onto
    * `corpus` first (broadcast the metadata side when it is dimension-sized).
    *
    * Scale: the filter composes with Catalyst pushdown — a column predicate
    * reaches the parquet scan, so the corpus read itself shrinks; the scored
    * set is the filtered corpus only. For selective predicates this makes
    * brute force viable far beyond its unfiltered envelope; for broad
    * predicates compose with [[lshTopK]] on the pre-filtered corpus instead
    * (bucketing AFTER the filter keeps recall independent of selectivity). */
  def filteredTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, predicate: Column): DataFrame =
    bruteForceTopK(corpus.filter(predicate), queries, idCol, vecCol, k)

  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * (bit, dim) via SplitMix64 — no stored model, reproducible across runs. */
  private def hyperplane(bit: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = bit.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      z.toDouble / Long.MaxValue.toDouble
    }

  /** Random-hyperplane signature: `numBits` sign bits, each from one
    * codegen'd dot product against a constant hyperplane array (the
    * expression-tree alternative — a 1000-term sum — defeats whole-stage
    * codegen). */
  private def rhpSignature(vec: Column, dim: Int, numBits: Int): Column = {
    val bits = (0 until numBits).map { b =>
      val plane = array(hyperplane(b, dim).toSeq.map(lit): _*)
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce[Column]((x, y) => x.bitwiseOR(y))
  }

  /** Signature banding misconfiguration is a LOUD error, never a silent
    * empty: bandBits > numBits makes numBands 0 (explode of an empty band
    * array drops every row — "no neighbors found" with no hint why), a
    * non-divisible split silently discards the remainder bits, and more
    * than 64 bits wraps shiftleft (bit 64 aliases bit 0, corrupting
    * signatures). */
  private def requireBandConfig(numBits: Int, bandBits: Int): Unit = {
    require(numBits >= 1 && numBits <= 64,
      s"numBits must be in 1..64 (one long signature), got $numBits")
    require(bandBits >= 1 && bandBits <= numBits,
      s"bandBits must be in 1..numBits($numBits), got $bandBits " +
        "(bandBits > numBits would yield ZERO bands and silently empty results)")
    require(numBits % bandBits == 0,
      s"numBits($numBits) must be divisible by bandBits($bandBits) — " +
        s"the remainder ${numBits % bandBits} bits would be silently unused")
  }

  /** The ONE band-explode recipe ([[candidatePairs]] and [[lshTopK]] both
    * route here, so ANN search and dedup blocking cannot diverge on which
    * pairs collide): an array of (band, band-signature) structs to explode.
    * bandBits == 64 is ONE band spanning the whole signature — there
    * `(1L << 64)` wraps to 1 and the usual mask would zero every band
    * signature, collapsing all rows into a single bucket (the band join
    * degenerates to the cross product this file exists to avoid); -1L is
    * the correct all-bits mask. */
  private def bandStructs(sig: Column, numBits: Int, bandBits: Int): Column = {
    val numBands = numBits / bandBits
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * bandBits).bitwiseAND(mask).as("bsig")).as(s"b$b")
    }: _*)
  }

  /** Unordered candidate pairs (id_a < id_b) from random-hyperplane band
    * collisions — the bucket-join core shared by ANN search and
    * [[graft.dedup.Dedup.embeddingNearDupLsh]]. One band-keyed self-join;
    * no cross join anywhere. */
  def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numBits: Int = 16, bandBits: Int = 8): DataFrame = {
    requireBandConfig(numBits, bandBits)
    val sigs = df.select(col(idCol).as("id"),
      rhpSignature(col(vecCol).cast("array<double>"), dim, numBits).as("sig"))
    val buckets = sigs
      .select(col("id"), explode(bandStructs(col("sig"), numBits, bandBits)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bsig"))
    buckets.select(col("id").as("id_a"), col("band"), col("bsig"))
      .join(buckets.select(col("id").as("id_b"), col("band"), col("bsig")), Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** LSH-bucketed ANN: signature bands → bucket join → exact re-rank.
    * Recall < 1 by construction; the exact re-rank keeps precision = 1. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, numBits: Int = 16,
      bandBits: Int = 8): DataFrame = {
    requireBandConfig(numBits, bandBits)
    def withSig(df: DataFrame, id: String, v: String) = {
      val s = df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(v))
        .withColumn("sig", rhpSignature(col(v), dim, numBits))
      s.withColumn("nrm", norm(col(v)))
        .select(col(id), col(v), col("nrm"),
          explode(bandStructs(col("sig"), numBits, bandBits)).as("bk"))
        .select(col(id), col(v), col("nrm"), col("bk.band"), col("bk.bsig"))
    }
    val qb = withSig(queries, "query_id", "qv").withColumnRenamed("nrm", "qn")
    val cb = withSig(corpus, "neighbor_id", "cv").withColumnRenamed("nrm", "cn")
    val candidates = qb.join(cb, Seq("band", "bsig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn").distinct()
    val scored = candidates
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topKByCosine(scored, k)
  }

  /** Trained IVF codebook: KMeans|| (spark-mllib, on the classpath) with
    * cosine distance and a fixed seed, over a BOUNDED slice of the corpus —
    * `limit(maxTrainRows)`, so training cost never scales with corpus size
    * (a codebook only needs cluster structure, not every row; 100k × dim
    * doubles ≈ 50 MB at dim 64 — one task holds it comfortably). Zero-norm
    * and null vectors are filtered before the fit: cosine KMeans throws on
    * them, and they carry no direction to cluster by anyway.
    *
    * Determinism: the seed pins the KMeans|| init, but float aggregation
    * order still depends on partition layout, so trained centroids are
    * reproducible only run-to-run on the same layout — NOT bit-replayable
    * across engines. Correctness-gate queries therefore check IVF results
    * against brute force (score identity / recall floor), never the raw
    * centroids. Returns the broadcastable (cell_id, centv, centn) frame
    * [[ivfTopK]] consumes — train once, persist, reuse across query batches. */
  def trainCentroids(corpus: DataFrame, vecCol: String, nCells: Int,
      maxIter: Int = 5, seed: Long = 42L,
      maxTrainRows: Int = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val arr = corpus.select(col(vecCol).cast("array<double>").as("__arr"))
      .filter(col("__arr").isNotNull && norm(col("__arr")) > 0)
      .limit(maxTrainRows)
    val feats = arr.select(array_to_vector(col("__arr")).as("features"))
    val model = new KMeans()
      .setK(nCells).setMaxIter(maxIter).setSeed(seed)
      .setDistanceMeasure("cosine").setFeaturesCol("features")
      .fit(feats)
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("cell_id", "centv")
      .withColumn("centn", norm(col("centv")))
  }

  /** The round-5 untrained codebook — a deterministic sample (lowest
    * `nCells` ids). Kept as the recall baseline the trained codebook is
    * spec-asserted to beat; not the production default. */
  def sampledCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int): DataFrame =
    // cell ids come from a window over the sampled slice, NOT a cast of the
    // user id: casting a string id to long yields NULL for every row, and
    // NULL cell keys never join — ivfTopK would silently return nothing
    corpus.select(col(idCol).as("__sid"), col(vecCol).cast("array<double>").as("centv"))
      .orderBy(col("__sid")).limit(nCells)
      .select((row_number().over(Window.orderBy(col("__sid"))) - 1)
        .cast("long").as("cell_id"), col("centv"))
      .withColumn("centn", norm(col("centv")))

  /** Int8 scalar quantization of an embedding column — the MEMORY-scale
    * path for 100 TB embedding corpora: a 64-dim float32 vector (256 B)
    * becomes 64 tinyint codes (64 B) + three doubles — 1/4 of the stored
    * bytes (1/8 of the float64 compute form). Per-vector (asymmetric)
    * min/max scaling: `code = round((x - offset)/scale) - 128`; the
    * ORIGINAL L2 norm rides along so cosine uses true magnitudes, not
    * quantized approximations of them. Pure built-in expressions
    * (array_min/max + transform), no UDF. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("__v"))
      .withColumn("__mn", array_min(col("__v")))
      .withColumn("__mx", array_max(col("__v")))
      .withColumn("scale",
        when(col("__mx") > col("__mn"), (col("__mx") - col("__mn")) / 255.0)
          .otherwise(lit(1.0))) // constant vector: any scale, codes all -128
      .withColumn("offset", col("__mn"))
      // a NaN/Infinity component makes scale NaN and the tinyint cast
      // THROW under ANSI (pre-ANSI it silently quantized to garbage) —
      // refuse by id instead, naming the cleanse. NULL vectors / NULL
      // components get their OWN arm first: `exists` over them is NULL,
      // which would otherwise fall through to the NaN message and send
      // the operator cleansing NaNs that don't exist
      .withColumn("codes", when(
        col("__v").isNull || exists(col("__v"), x => x.isNull),
        raise_error(concat(
          lit("quantize: vector '"), col("id").cast("string"),
          lit("' is NULL or has NULL components — int8 quantization is " +
            "undefined; drop or impute the embedding upstream"))))
        .when(
          exists(col("__v"), x => isnan(x) || x === Double.PositiveInfinity ||
            x === Double.NegativeInfinity),
          raise_error(concat(
            lit("quantize: vector '"), col("id").cast("string"),
            lit("' contains NaN/Infinity — int8 quantization is undefined; " +
              "cleanse the embedding column upstream"))))
        .otherwise(transform(col("__v"), x =>
          (round((x - col("offset")) / col("scale")) - 128).cast("tinyint"))))
      .withColumn("norm", norm(col("__v")))
      .select("id", "codes", "scale", "offset", "norm")
  }

  /** Dequantize a codes column back to doubles:
    * `(code + 128) * scale + offset`. Error vs the original is bounded by
    * the quantization step (≤ scale/2 per component). */
  def dequantize(codes: Column, scale: Column, offset: Column): Column =
    transform(codes, c => (c.cast("double") + 128.0) * scale + offset)

  /** Brute-force cosine top-k over QUANTIZED vectors — s1's shape (broadcast
    * queries, windowed per-query top-k) over 1/4 of the corpus bytes. Each
    * row dequantizes ONCE (O((n+m)·dim)), then pairs score through the same
    * codegen'd native dot kernel as every other path here — per-pair
    * dequantization inside the cross join would cost O(n·m·dim) interpreted
    * lambda work. The stored TRUE norms divide the dot. Precision is
    * bounded, not exact: pair with [[bruteForceTopK]] on a sample to gate
    * recall/score drift (the s6 pattern). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    def deq(df: DataFrame, id: String, v: String, n: String) =
      quantize(df, idCol, vecCol).select(col("id").as(id),
        dequantize(col("codes"), col("scale"), col("offset")).as(v),
        col("norm").as(n))
    val q = deq(queries, "query_id", "qv", "qn")
    val c = deq(corpus, "neighbor_id", "cv", "cn")
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topKByCosine(scored, k)
  }

  /** Product-quantization model: `codebooks(m)(j)` is subspace `m`'s
    * centroid `j` (length `dim / numSubspaces`). MODEL PARAMETERS, not data
    * — for the defaults (8 subspaces × 16 centroids × 8 dims) this is 1 KB
    * of doubles, embedded into the scoring expressions as constants the
    * same way the LSH hyperplanes are. */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def numSubspaces: Int = codebooks.length
    def numCentroids: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Persist a trained PQ codebook to a text sidecar — the
    * train-once/serve-many seam ([[ivfTopK]]'s documented production
    * posture, unified here for PQ): a production deployment trains on a
    * bounded sample ONCE, persists, and every encode/query batch loads
    * the sidecar instead of re-fitting M KMeans models per invocation.
    * Format is `java.lang.Double.toString` per value — the one decimal
    * rendering guaranteed to round-trip the exact bits through
    * `parseDouble`, so a saved model reconstructs code-for-code. */
  def savePqModel(model: PqModel, path: String): Unit = {
    val sb = new StringBuilder
    sb.append(s"pq ${model.numSubspaces} ${model.numCentroids} ${model.subDim}\n")
    for (m <- model.codebooks; c <- m)
      sb.append(c.map(java.lang.Double.toString).mkString(" ")).append('\n')
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, sb.toString): Unit
  }

  def loadPqModel(path: String): PqModel = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    require(!lines.isEmpty && lines.get(0).startsWith("pq "),
      s"$path is not a PQ codebook sidecar")
    // header corruption (wrong token count, non-numeric dims) must refuse
    // with the path, not escape as a bare MatchError/NumberFormatException
    val header = lines.get(0).split(" ")
    require(header.length == 4,
      s"$path: malformed PQ header '${lines.get(0)}' (expected 'pq M K D')")
    val (m, k, d) = try (header(1).toInt, header(2).toInt, header(3).toInt)
      catch { case _: NumberFormatException => throw new IllegalArgumentException(
        s"$path: non-numeric PQ header dims '${lines.get(0)}'") }
    require(m > 0 && k > 0 && d > 0, s"$path: non-positive PQ header dims")
    require(lines.size == 1 + m * k,
      s"$path: expected ${m * k} centroid rows, found ${lines.size - 1}")
    val rows = (1 to m * k).map { i =>
      val r = lines.get(i).split(" ").map(java.lang.Double.parseDouble)
      require(r.length == d, s"$path row $i: ${r.length} values, expected $d")
      r
    }
    PqModel(rows.grouped(k).map(_.toArray).toArray)
  }

  /** The same persistence seam for the IVF coarse codebook
    * ([[trainCentroids]]' output frame): parquet round-trip with the
    * schema checked on load, so a stale or foreign file fails loudly
    * instead of mis-probing cells. */
  def saveCodebook(codebook: DataFrame, path: String): Unit =
    codebook.write.mode("overwrite").parquet(path)

  def loadCodebook(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    require(Set("cell_id", "centv", "centn").subsetOf(df.columns.toSet),
      s"$path is not an IVF codebook (have: ${df.columns.mkString(",")})")
    df
  }

  /** Train a PQ codebook: an independent bounded-sample KMeans per
    * subspace (squared-Euclidean — PQ quantizes raw coordinates; the
    * cosine geometry returns at scoring time via the stored true norms).
    * Same bounded-training posture as [[trainCentroids]]: cost never
    * scales with corpus size. Same determinism caveat too: seeded, but
    * float aggregation order makes centroids reproducible only
    * run-to-run on one layout — gates therefore check drift/recall
    * against brute force, never raw codebooks. */
  def trainPq(corpus: DataFrame, vecCol: String, dim: Int,
      numSubspaces: Int = 8, numCentroids: Int = 16,
      maxIter: Int = 5, seed: Long = 42L,
      maxTrainRows: Int = 100000): PqModel = {
    require(dim % numSubspaces == 0, s"dim $dim not divisible by $numSubspaces subspaces")
    // codes are stored as tinyint 0-BASED indices (array_position - 1), so
    // up to 128 centroids fit (max index 127); one more would wrap the
    // cast negative and pqReconstruct's element_at(code+1) would index
    // from the array END (Spark negative indexing) — reconstructing from
    // the wrong centroid with no error. Refuse at train time.
    require(numCentroids <= 128,
      s"numCentroids $numCentroids exceeds the tinyint code range (max 128, 0-based codes)")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val subDim = dim / numSubspaces
    val arr = corpus.select(col(vecCol).cast("array<double>").as("__arr"))
      .filter(col("__arr").isNotNull && size(col("__arr")) === dim)
      .limit(maxTrainRows)
      .cache() // M fits read the same bounded sample
    arr.count() // materialize once before the concurrent fits race to fill it
    // the M fits are independent — run them as CONCURRENT Spark jobs
    // (sequential fits pay M × per-job overhead; measured 16 sequential
    // fits at ~30 s vs ~4 s concurrent on local[32])
    import scala.collection.parallel.CollectionConverters._
    val books = (0 until numSubspaces).toArray.par.map { m =>
      val sub = arr.select(array_to_vector(
        slice(col("__arr"), m * subDim + 1, subDim)).as("features"))
      // random init, not k-means||: the parallel init's extra passes cost
      // more than the 5 Lloyd iterations on a bounded sample, and PQ wants
      // M cheap codebooks, not one perfect one (measured: the gate's
      // drift/recall floors hold with identical margins either way)
      new KMeans().setK(numCentroids).setMaxIter(maxIter).setSeed(seed + m)
        .setInitMode("random").setFeaturesCol("features")
        .fit(sub).clusterCenters.map(_.toArray)
    }.toArray
    arr.unpersist()
    PqModel(books)
  }

  /** PQ-encode: each vector becomes `numSubspaces` small integer codes
    * (nearest centroid per subspace, squared-L2, ties → lowest code) plus
    * its TRUE L2 norm — at the 8×16 defaults, 8 codes + a double instead
    * of 64 doubles: ~1/12 of the float64 bytes (vs 1/4 for int8 scalar
    * quantization — PQ is the next press of the same memory lever). The
    * argmin is a constant-folded expression per subspace (distances to
    * all centroids as literals-in-expressions, `array_min` over
    * (dist, code) structs — deterministic tie-break, no UDF). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    // same tinyint-wrap guard as trainPq: a hand-built model with >128
    // centroids must fail loudly here, not mis-reconstruct downstream
    require(model.numCentroids <= 128,
      s"model has ${model.numCentroids} centroids — exceeds tinyint code range (max 128, 0-based codes)")
    val v = col(vecCol).cast("array<double>")
    // the codebook rides as ONE typedlit array per subspace and distances
    // compute via higher-order functions — a first cut unrolled all
    // numCentroids × subDim squared-diff terms into the expression tree
    // (~2k nodes at 16×32×4), and PLAN/codegen compilation of that tree,
    // re-done per invocation because each trained model changes the
    // literals, dominated the whole query (~10 s per bench iteration);
    // the HOF form is a ~100-node tree that plans instantly, and encode
    // stays one scan either way
    val codeCols = (0 until model.numSubspaces).map { m =>
      val sub = slice(v, m * model.subDim + 1, model.subDim)
      val table = typedlit(model.codebooks(m).map(_.toSeq).toSeq)
      val dists = transform(table, c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      // array_position of the min = FIRST index at the minimum —
      // deterministic lowest-code tie-break; tinyint because 16 codes are
      // 16 bytes, not 64 (the quantize() precedent)
      (array_position(dists, array_min(dists)) - 1).cast("tinyint")
    }
    // wrong-length / NULL vectors refuse BY ID: trainPq filters its sample
    // to size == dim, but encode sees the whole corpus — a short vector's
    // zip_with pads with NULLs, every centroid distance goes NULL, the
    // code goes NULL, and pqReconstruct/topKByCosine silently DROP the
    // document from the index; a long vector's tail is silently ignored
    // (wrong-but-plausible codes). Same loud posture as quantize's guard.
    val dim = model.numSubspaces * model.subDim
    df.select(col(idCol).as("id"),
      when(v.isNull || size(v) =!= dim,
        raise_error(concat(
          lit("pqEncode: vector '"), col(idCol).cast("string"),
          lit(s"' is NULL or not length $dim (got "),
          coalesce(size(v).cast("string"), lit("NULL")),
          lit(") — the PQ model cannot encode it; filter or fix upstream"))))
        .otherwise(array(codeCols: _*)).as("codes"),
      norm(v).as("norm"))
  }

  /** Reconstruct the quantized vector from PQ codes: per subspace, the
    * code indexes a constant array of centroid arrays; subspace picks
    * concatenate. Used once per corpus row before scoring — the
    * [[quantizedTopK]] dequantize-once pattern, so pairs score through
    * the same codegen'd dot kernel as every exact path. */
  def pqReconstruct(codes: Column, model: PqModel): Column = {
    val parts = (0 until model.numSubspaces).map { m =>
      val table = typedlit(model.codebooks(m).map(_.toSeq).toSeq)
      element_at(table, element_at(codes, m + 1).cast("int") + 1)
    }
    flatten(array(parts: _*))
  }

  /** Brute-force cosine top-k over PQ-RECONSTRUCTED vectors (queries stay
    * full-precision — asymmetric scoring): s1's shape at ~1/12 of the
    * corpus bytes. Scores divide by the stored TRUE norms, so magnitude
    * error comes only from the quantized directions. Precision is coarser
    * than int8 — gate with drift/recall floors (the s6 pattern, wider
    * bounds). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: PqModel): DataFrame =
    pqTopKFromCodes(pqEncode(corpus, idCol, vecCol, model), queries,
      idCol, vecCol, k, model)

  /** [[pqTopK]] over an ALREADY-ENCODED corpus — the production path: the
    * PQ index (the [[pqEncode]] output: id, codes, norm — ~1/12 of the
    * float64 corpus bytes) is computed ONCE when the corpus lands and
    * persisted as a table; every query batch then reads codes, never the
    * raw vectors. Completes the train-once seam: codebook sidecar
    * ([[savePqModel]]) + encoded-index table, with only the query batch
    * encoded fresh. The model must be the SAME one that produced the
    * codes — codes are meaningless under another codebook, which is why
    * the index and sidecar persist side by side. */
  def pqTopKFromCodes(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: PqModel): DataFrame = {
    val c = encoded.select(col("id").as("neighbor_id"),
      pqReconstruct(col("codes"), model).as("cv"), col("norm").as("cn"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      // a zero-norm corpus vector reconstructs to a NONZERO centroid, so a
      // bare dot/(qn·cn) would give ±Infinity where every exact path gives
      // NaN (0/0) — pin the degenerate case to NaN explicitly so the
      // zero-norm exclusion in topKByCosine treats the quantized path
      // identically to the exact one (and the s6/s8 isnan guards, now
      // vacuously satisfied, stay correct on both sides)
      .withColumn("cosine",
        when(col("cn") === 0.0 || col("qn") === 0.0, lit(Double.NaN))
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
    topKByCosine(scored, k)
  }

  /** IVF-style ANN (the inverted-file scale path): the corpus is assigned to
    * `nCells` coarse cells (nearest centroid by cosine); a query probes its
    * `nProbe` nearest cells and exact-re-ranks only their members. Corpus
    * assignment is ONE scan against broadcast centroids (all dot products
    * through the codegen'd kernel); the query-side join is keyed on cell_id
    * — no cross join against the corpus.
    *
    * The codebook: pass a pre-trained one ([[trainCentroids]], run once and
    * persisted) to amortize training across query batches — this is the
    * production path, and the only engine-replayable one. With
    * `codebook = None` the call RETRAINS per invocation (bounded: KMeans||
    * over a `maxTrainRows`-capped sample, 5 iterations) — convenient for
    * one-shot lookups, wasteful inside a loop. Recall < 1 by construction;
    * precision = 1 (exact re-rank). */
  /** Assign each corpus vector to its nearest coarse cell by cosine —
    * ivfTopK's corpus-side assignment exposed as the shared blocking
    * primitive ([[graft.dedup.Dedup.semanticNearDup]] keys its candidate
    * pairs on it). ONE scan against the broadcast codebook; ties break to
    * the lowest cell_id. Returns `(idCol, cell_id, __v, __n)` — the cast
    * vector and its norm ride along so downstream scoring reuses them
    * without a second corpus scan. */
  /** The shared n-nearest-cells primitive: score every row against the
    * BROADCAST codebook, keep the top `n` cells per `keyCol` (cosine desc,
    * cell_id asc). ONE definition — [[assignCells]] (n = 1, the blocking
    * primitive [[graft.dedup.Dedup.semanticNearDup]] keys on) and
    * [[ivfTopK]]'s corpus/query sides all route here, so the tie-break and
    * norm handling cannot drift between the paths that must block
    * identically. */
  private def nearestCellsBy(df: DataFrame, keyCol: String, vCol: String,
      nCol: String, codebook: DataFrame, n: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(codebook))
      .withColumn("__csim", cosine(col(vCol), col("centv"), col(nCol), col("centn")))
    if (n == 1) {
      // n = 1 (assignCells — the CORPUS-side path, the one that sees 100 TB)
      // reduces the corpus×nCells expansion with a map-side-combinable
      // max_by BEFORE the exchange; the window form shuffles and sorts the
      // whole expanded frame for an __r <= 1 filter — nCells-fold more
      // shuffle I/O. Ordering matches the window exactly: highest cosine,
      // ties to the LOWEST cell_id (negated in the max struct). A NULL
      // cosine (zero-norm vector) ranks below every real one via the -2.0
      // floor (cosine >= -1), so an all-NULL key still yields its lowest
      // cell_id — the window's nulls-last order, preserved.
      val keep = scored.columns.filterNot(
        Set(keyCol, "__csim", "centv", "centn")).toSeq
      scored.groupBy(col(keyCol))
        .agg(max_by(
          struct(keep.map(col): _*),
          struct(coalesce(col("__csim"), lit(-2.0)).as("s"),
            (-col("cell_id")).as("c"))).as("__w"))
        .select(col(keyCol) +: keep.map(c => col("__w." + c)): _*)
    } else {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__csim").desc, col("cell_id").asc)
      scored.withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
        .drop("__r", "__csim", "centv", "centn")
    }
  }

  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame): DataFrame = {
    val c = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__n", norm(col("__v")))
    nearestCellsBy(c, idCol, "__v", "__n", codebook, n = 1)
      .select(col(idCol), col("cell_id"), col("__v"), col("__n"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
      codebook: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val centroids = codebook.getOrElse(trainCentroids(corpus, vecCol, nCells))
    // corpus: one cell per vector; queries: nProbe cells each
    val assigned = nearestCellsBy(c, "neighbor_id", "cv", "cn", centroids, n = 1)
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
    val probed = nearestCellsBy(q, "query_id", "qv", "qn", centroids, nProbe)
    val scored = probed.join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn").distinct()
      .withColumn("cosine", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topKByCosine(scored, k)
  }
}
