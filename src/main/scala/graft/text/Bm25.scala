package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the lexical search
  * operator a training-data pipeline uses for targeted corpus queries
  * (find documents about X), contamination hunting beyond exact n-gram
  * probes, and retrieval-based data selection (rank the corpus against a
  * seed query set, keep the top tail). Okapi BM25 in the Lucene form:
  *
  *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf(t,d)·(k1+1)
  *                            ────────────────────────────────
  *                            tf(t,d) + k1·(1 − b + b·|d|/avgdl)
  *
  *   idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * with whitespace tokens (the repo-wide t3/t6 convention), distinct query
  * terms, k1 = 1.2, b = 0.75.
  *
  * Scale posture: the term-frequency table IS the inverted index — one
  * explode + one map-side-combinable count per (term, doc); df/N/avgdl are
  * one aggregation over it. Scoring joins the (tiny, broadcast) distinct
  * query-term set against the index TERM-KEYED, so only postings of query
  * terms are ever read — the corpus itself is never rescanned per query —
  * then one (query, doc) exchange for the score fold and a per-query
  * top-k window. Hot terms split under AQE (the t9 shape); at 100 TB the
  * index is the only corpus-sized artifact and it is built once
  * (`buildIndex`) and served many times — the PQ/IVF codebook seam.
  *
  * Determinism (cross-engine, bit-exact before the final rounding): every
  * per-term contribution is a fixed chain of IEEE ops on exact-integer
  * operands (tf, df, N, |d| are counts; avgdl is one division of exact
  * integers; k1/b parse to identical doubles from the same literals), so
  * each contribution is bit-identical on any engine with a correctly
  * rounded ln. The per-(q,d) SUM would be the one order-dependent step, so
  * it is an in-row LEFT FOLD over the contributions sorted by term
  * (`aggregate(array_sort(collect_list(...)))` here, `list_reduce` +
  * `list(... ORDER BY term)` in the oracle) — the g1 fixed-order posture.
  * Ranking uses the exact folded score with doc-id tie-break; the emitted
  * score is round(·, 6) for the check layer. */
object Bm25 {

  /** Per-document term frequencies + document lengths: the inverted index.
    * One corpus scan; persist both frames for train-once/serve-many. */
  final case class Index(tf: DataFrame, docLen: DataFrame)

  def buildIndex(corpus: DataFrame, idCol: String, textCol: String): Index = {
    val toks = corpus.select(col(idCol).as("__doc"),
      explode(split(col(textCol), " ")).as("__t"))
    Index(
      toks.groupBy("__doc", "__t").agg(count(lit(1)).as("__tf")),
      corpus.select(col(idCol).as("__doc"),
        size(split(col(textCol), " ")).as("__len")))
  }

  /** Top-`k` documents per query by BM25. `queries` rows are
    * `(qidCol, qTextCol)`; terms are whitespace-split and DEDUPLICATED per
    * query. Returns `(query_id, doc_id, rank, bm25)` — only documents
    * sharing at least one term with the query appear (standard IR
    * semantics); rank is dense per query, ties broken by doc id. */
  def topK(index: Index, queries: DataFrame, qidCol: String,
      qTextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nDocs = index.docLen.count()
    require(nDocs > 0, "Bm25.topK: empty corpus")
    val totLen = index.docLen.agg(sum(col("__len"))).head().getLong(0)
    // one division of exact integers -> the identical double on any engine
    val avgdl = totLen.toDouble / nDocs.toDouble
    val df = index.tf.groupBy("__t").agg(count(lit(1)).as("__df"))
      .withColumn("__idf", log(lit(1.0) +
        (lit(nDocs.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
    val qTerms = queries.select(col(qidCol).as("__q"),
      explode(split(col(qTextCol), " ")).as("__t")).distinct()
    val contrib = broadcast(qTerms).join(index.tf, Seq("__t"))
      .join(df.select("__t", "__idf"), Seq("__t"))
      .join(index.docLen, Seq("__doc"))
      .select(col("__q"), col("__doc"), col("__t"),
        (col("__idf") * (col("__tf").cast("double") * lit(k1 + 1.0)) /
          (col("__tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / lit(avgdl))))
          .as("__c"))
    // fixed-order fold: sort contributions by term, left-fold the sum
    val scored = contrib.groupBy("__q", "__doc")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__t"), col("__c")))),
        lit(0.0), (acc, x) => acc + x.getField("__c")).as("__s"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__q").orderBy(col("__s").desc, col("__doc").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("__q").as("query_id"), col("__doc").as("doc_id"),
        col("rank"), round(col("__s"), 6).as("bm25"))
  }

  /** Persist the inverted index — the train-once/serve-many seam shared
    * with the PQ/IVF codebooks and the bigram LM (integer stats round-trip
    * exactly, so a loaded index scores bit-identically). */
  def saveIndex(index: Index, path: String): Unit = {
    index.tf.write.mode("overwrite").parquet(s"$path/tf")
    index.docLen.write.mode("overwrite").parquet(s"$path/doclen")
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val tf = spark.read.parquet(s"$path/tf")
    val dl = spark.read.parquet(s"$path/doclen")
    require(tf.columns.toSet == Set("__doc", "__t", "__tf"),
      s"$path/tf is not a BM25 term-frequency table (have: ${tf.columns.mkString(",")})")
    require(dl.columns.toSet == Set("__doc", "__len"),
      s"$path/doclen is not a BM25 doc-length table (have: ${dl.columns.mkString(",")})")
    Index(tf, dl)
  }

  /** Build-and-search convenience (the s9 gate shape). */
  def search(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String, k: Int): DataFrame =
    topK(buildIndex(corpus, idCol, textCol), queries, qidCol, qTextCol, k)
}
