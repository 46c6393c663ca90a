package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding over a corpus — the
  * tokenizer-construction step of an LLM data pipeline, distributed the way
  * SentencePiece/GPT-2 BPE trainers actually work: merges are learned from
  * the UNIQUE-WORD frequency table, not the raw corpus. The corpus (100 TB)
  * is scanned exactly once to build `(word, freq)`; every training
  * iteration then runs over the vocabulary table (unique words — orders of
  * magnitude smaller, but still a DataFrame: distributed, spillable, never
  * collected), so iteration cost is independent of corpus size.
  *
  * Per iteration:
  *   1. adjacent symbol pairs explode per word, weighted by word freq, and
  *      a map-side-combinable SUM picks the global top pair (one shuffle of
  *      pair partials — pair-cardinality-sized, not corpus-sized). The only
  *      `collect()` is the single winning row: metadata-scale by
  *      construction.
  *   2. the merge applies to every word's symbol array as an in-row
  *      aggregate() fold (greedy left-to-right, the BPE contract:
  *      "aaa" + (a,a) -> ["aa","a"]) — zero exchanges.
  * Ties break (count DESC, left ASC, right ASC) so training is
  * deterministic across cluster sizes and engines. Lineage is truncated
  * every [[Bpe.Options.checkpointEvery]] rounds via the same
  * local/reliable-checkpoint seam connected components uses
  * ([[graft.dedup.Dedup.IterCheckpoint]]).
  *
  * Reference scope: the reference pipelines stop at token COUNTING
  * (functions used by its quality metrics); training the tokenizer itself
  * is part of this engine's beyond-reference curation surface (SURVEY LLM
  * addendum), alongside dedup/sampling/packing.
  */
object Bpe {

  final case class Options(
      numMerges: Int = 64,
      /** Stop early when the best pair's weighted count falls below this. */
      minFreq: Long = 2L,
      /** Truncate the vocab frame's lineage every N merges. */
      checkpointEvery: Int = 8,
      checkpoint: graft.dedup.Dedup.IterCheckpoint = graft.dedup.Dedup.LocalCheckpoint)

  /** One learned merge: `rank` is the application order. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The greedy left-to-right single-merge fold shared by training and the
    * spec's oracle reasoning: carry the previous symbol; when (carry,s) is
    * the merge pair, emit the merged token and clear the carry (a token
    * merged THIS round never re-merges this round — the BPE contract). */
  private def applyMergeColumn(sym: Column, l: String, r: String): Column = {
    val init = struct(
      expr("cast(array() as array<string>)").as("arr"),
      lit(null).cast("string").as("carry"))
    def flush(acc: Column): Column =
      when(acc("carry").isNull, acc("arr"))
        .otherwise(concat(acc("arr"), array(acc("carry"))))
    aggregate(sym, init,
      (acc, s) => when(acc("carry") <=> lit(l) && s <=> lit(r),
          struct(concat(acc("arr"), array(lit(l + r))).as("arr"),
            lit(null).cast("string").as("carry")))
        .otherwise(struct(flush(acc).as("arr"), s.as("carry"))),
      acc => flush(acc))
  }

  /** Build the `(sym: array<string>, freq: bigint)` vocabulary table —
    * the ONE corpus scan. Whitespace tokenization, character-level start
    * symbols (split-by-empty-pattern yields one element per character). */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("sym"), col("freq"))

  /** Train merges; returns them in rank order.
    *
    * One Spark JOB per round: the pair-count collect. It materializes the
    * current vocab generation into its cache as a side effect (the scan
    * fills the lazy persist), so no dedicated count() job is needed — the
    * PARENT generation stays cached until its child has materialized this
    * way (a two-generation window), then unpersists. Dropping the parent
    * eagerly would force the child's first scan to recompute the whole
    * uncached chain from the corpus. */
  def train(df: DataFrame, textCol: String, opts: Options = Options()): Seq[Merge] = {
    require(opts.checkpointEvery >= 1,
      s"checkpointEvery must be >= 1 (every-N-rounds lineage truncation; " +
        s"got ${opts.checkpointEvery} — use a large value to checkpoint rarely)")
    var cur = vocab(df, textCol).persist()
    // DRIVER-SIDE training when the vocabulary fits (the broadcast-join-
    // threshold posture, and how single-node BPE trainers run anyway):
    // every distributed round costs one full Spark job — scheduling +
    // collect round-trip dominate once the unique-word table is small —
    // while the local loop is microseconds per round on the same data.
    // The count() below materializes the persist either way, so the
    // distributed fallback path loses nothing. Bit-compatibility with the
    // distributed rounds is pinned by BpeSpec (same greedy fold, same
    // (count DESC, pair ASC) tie-break under UTF-8 BYTE order — Spark
    // compares strings as unsigned UTF-8 bytes, NOT as Java UTF-16).
    val maxLocal = df.sparkSession.conf.getOption("spark.graft.bpe.maxDriverVocab")
      .map(_.toLong).getOrElse(1000000L)
    if (cur.count() <= maxLocal) {
      val words = cur.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      cur.unpersist()
      return trainLocal(words, opts)
    }
    var prev: Option[DataFrame] = None
    val merges = mutable.ArrayBuffer.empty[Merge]
    var done = false
    var i = 0
    while (!done && i < opts.numMerges) {
      val top = cur.filter(size(col("sym")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(slice(sym, 1, size(sym)-1), (s, i) -> struct(s AS l, sym[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      prev.foreach(_.unpersist()) // cur just materialized; its parent can go
      prev = Some(cur)
      if (top.isEmpty || top(0).getLong(2) < opts.minFreq) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(i, l, r, c)
        val mergedRaw = cur.select(
          applyMergeColumn(col("sym"), l, r).as("sym"), col("freq"))
        // truncation rounds materialize eagerly (the checkpoint contract)
        // and cap the lineage the lazy-persist window lets accumulate
        val merged =
          (if ((i + 1) % opts.checkpointEvery == 0)
             graft.dedup.Dedup.truncate(mergedRaw, opts.checkpoint)
           else mergedRaw).persist()
        cur = merged
        i += 1
      }
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    merges.toSeq
  }

  /** Unsigned UTF-8 byte comparison — EXACTLY Spark's string ordering
    * (UTF8String.compareTo): Java String.compareTo would order
    * supplementary characters (surrogate pairs, 0xD800-) BELOW
    * [U+E000, U+FFFF] while Spark's byte order puts them above. */
  private[text] def compareUtf8(a: String, b: String): Int = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    ab.length - bb.length
  }

  /** The training loop over a collected `(symbols, freq)` vocabulary —
    * semantically IDENTICAL to the distributed rounds: same weighted pair
    * counts (Long sums), same (count DESC, left ASC, right ASC) tie-break
    * under UTF-8 byte order, same greedy left-to-right non-overlapping
    * merge per word, same minFreq/empty stop conditions. */
  private[text] def trainLocal(words0: Array[(Array[String], Long)],
      opts: Options): Seq[Merge] = {
    var words = words0
    val merges = mutable.ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (!done && i < opts.numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val (sym, f) = words(wi)
        var j = 0
        while (j < sym.length - 1) {
          val k = (sym(j), sym(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null) best = e
          else {
            val c = java.lang.Long.compare(e._2, best._2)
            val better = c > 0 || (c == 0 && {
              val dl = compareUtf8(e._1._1, best._1._1)
              dl < 0 || (dl == 0 && compareUtf8(e._1._2, best._1._2) < 0)
            })
            if (better) best = e
          }
        }
        val ((l, r), c) = best
        if (c < opts.minFreq) done = true
        else {
          merges += Merge(i, l, r, c)
          words = words.map { case (sym, f) =>
            // cheap containment probe first — most words lack the pair
            var has = false
            var j = 0
            while (!has && j < sym.length - 1) {
              if (sym(j) == l && sym(j + 1) == r) has = true
              j += 1
            }
            if (!has) (sym, f)
            else {
              val out = mutable.ArrayBuffer.empty[String]
              var k = 0
              while (k < sym.length) {
                if (k < sym.length - 1 && sym(k) == l && sym(k + 1) == r) {
                  out += l + r; k += 2
                } else { out += sym(k); k += 1 }
              }
              (out.toArray, f)
            }
          }
          i += 1
        }
      }
    }
    merges.toSeq
  }

  /** [[train]] as a DataFrame, for registry/gate use. */
  def trainDf(df: DataFrame, textCol: String, opts: Options = Options()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, opts).toDF("rank", "left", "right", "freq")
  }

  /** Encode texts with a trained merge list: per doc, whitespace words are
    * split to characters and the merges apply in rank order (within each
    * word, repeatedly merge the LOWEST-rank adjacent pair — the standard
    * rank-priority BPE encoder, which reproduces training's greedy result).
    * Per-row iterate-to-fixpoint logic has no Catalyst expression (the
    * merge count is data-dependent), so this is a UDF over a broadcast
    * rank map — the [[graft.multimodal.Multimodal]] precedent. Emits
    * `(… , tokens array<string>, n_tokens int)`. */
  def encode(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ranks: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val spark = df.sparkSession
    val ranksB = spark.sparkContext.broadcast(ranks)
    val enc: UserDefinedFunction = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else text.split("\\s+").filter(_.nonEmpty).flatMap(encodeWord(_, ranksB.value))
    }
    df.withColumn("tokens", enc(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Rank-priority encoding of one word (exposed for the spec's
    * cross-check against training's per-round greedy fold). */
  private[text] def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    // CODE-POINT split, matching training's Spark `split(w, "")` (Java
    // regex never splits inside a surrogate pair) — per-char splitting
    // broke every supplementary character (emoji) into two lone
    // surrogates no learned merge could ever rejoin
    var sym = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    var continue = sym.length >= 2
    while (continue) {
      // lowest-rank adjacent pair present in the word
      var best = Int.MaxValue
      var at = -1
      var j = 0
      while (j < sym.length - 1) {
        val rk = ranks.getOrElse((sym(j), sym(j + 1)), Int.MaxValue)
        if (rk < best) { best = rk; at = j }
        j += 1
      }
      if (at < 0) continue = false
      else {
        // merge EVERY occurrence of that pair, greedy left-to-right —
        // exactly one training round's fold restricted to this word
        val out = mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < sym.length) {
          if (k < sym.length - 1 && sym(k) == sym(at) && sym(k + 1) == sym(at + 1)) {
            out += sym(k) + sym(k + 1); k += 2
          } else { out += sym(k); k += 1 }
        }
        sym = out.toArray
        continue = sym.length >= 2
      }
    }
    sym
  }
}
