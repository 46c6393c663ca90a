package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-question probe (r12 verdict item 7): do higher-order filter()
  * signals — CodegenFallback in Spark 4.1, i.e. interpreted per row — show
  * up at 10× data? Answer: yes, ~2× (1×: 0.50 vs 0.24 s; 10×: 0.61 vs
  * 0.30 s on this host), so gopherRules SHIPS the codegen-friendly forms
  * since r13 and this probe keeps the original HOF forms as the reference
  * arm: it cross-checks the shipped signals row-identical against the HOF
  * forms (fixture + adversarial rows — "...\n" inside a token broke an
  * earlier draft that normalized \n to space; the fixture vocabulary
  * cannot produce that token) and times both at 1× and 10×. */
object GopherHofProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    // the t17 gate's fabricated line structure, so signals are non-trivial
    def lined(df: DataFrame): DataFrame = df.select(col("doc_id"),
      replace(replace(col("text"), lit(" a "), lit("\n• ")),
        lit(" of "), lit("...\n")).as("text"))
    def corpus(k: Int): DataFrame =
      (0 until k).map(i => docs.select(
        (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
        concat(col("text"), lit(s" replica$i")).as("text")))
        .reduce(_ unionByName _)

    /** The ORIGINAL higher-order forms (pre-r13 gopherRules) — the
      * reference arm the shipped codegen forms must match row-for-row. */
    def hofForms(df: DataFrame): DataFrame = {
      val t = col("text")
      val ws = split(t, " ")
      val nWords = size(ws)
      val lines = split(t, "\n")
      val nLines = size(lines)
      df.withColumn("bullet_ratio", round(size(filter(lines, l =>
          l.startsWith("•") || l.startsWith("- "))).cast("double") / nLines, 6))
        .withColumn("ellipsis_ratio", round(size(filter(lines,
          _.endsWith("..."))).cast("double") / nLines, 6))
        .withColumn("alpha_ratio", round(size(filter(ws,
          _.rlike("[A-Za-z]"))).cast("double") / nWords, 6))
    }

    /** Codegen-friendly rewrite of the three HOF signals (what gopherRules
      * ships since r13 — kept here only to keep the A/B re-runnable). */
    def rewrite(df: DataFrame): DataFrame = {
      val t = col("text")
      val ws = split(t, " ")
      val nWords = size(ws)
      val nLines = size(split(t, "\n"))
      // lines starting with "•" = occurrences of "\n•" (+1 if line 1 does);
      // same literal-replace length-diff trick as the symbol counts
      def occurrences(needle: String): org.apache.spark.sql.Column =
        (length(t) - length(replace(t, lit(needle), lit("")))) / needle.length
      val bulletStarts = occurrences("\n•") + occurrences("\n- ") +
        when(t.startsWith("•") || t.startsWith("- "), 1).otherwise(0)
      val ellipsisEnds = occurrences("...\n") +
        when(t.endsWith("..."), 1).otherwise(0)
      // words containing a letter, via ONE whole-text regex scan. Tokens
      // are split on SINGLE SPACES only (the repo-wide t3/t6 convention),
      // so the token class is [^ ] — which deliberately matches \n: a
      // newline-embedded token like "x...\ny" is ONE word here, exactly as
      // split(t, " ") sees it (an earlier draft normalized \n to space
      // first and silently double-counted such tokens — caught by a
      // micro-test, not by the fixture, where "...\n" never occurs)
      val alphaWords = size(regexp_extract_all(
        concat(lit(" "), t, lit(" ")),
        lit(" [^ ]*[A-Za-z][^ ]*(?= )"), lit(0)))
      df.withColumn("bullet_ratio",
          round(bulletStarts.cast("double") / nLines, 6))
        .withColumn("ellipsis_ratio",
          round(ellipsisEnds.cast("double") / nLines, 6))
        .withColumn("alpha_ratio",
          round(alphaWords.cast("double") / nWords, 6))
    }

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med(f: => Double): Double = Seq(f, f, f).sorted.apply(1)

    // semantic cross-check at 1× before timing anything — the fixture PLUS
    // adversarial rows the fixture's vocabulary cannot produce ("...\n"
    // inside a token double-counted an earlier draft's alpha rewrite;
    // bullets/ellipses at text edges; all-symbol words; empty text)
    import spark.implicits._
    val adversarial = Seq(
      (900000001L, "x...\ny plain words here"),
      (900000002L, "• leads\n- dashes\nz...\nw..."),
      (900000003L, "## #### ##"),
      (900000004L, "tail..."),
      (900000005L, ""),
      (900000006L, "a...\nb...\nc...\nd")).toDF("doc_id", "text")
    val base = lined(corpus(1)).unionByName(adversarial).persist()
    base.count(): Unit
    val shipped = graft.text.TextAnalysis.gopherRules(base, "text")
      .select("doc_id", "bullet_ratio", "ellipsis_ratio", "alpha_ratio")
    val hof = hofForms(base)
      .select("doc_id", "bullet_ratio", "ellipsis_ratio", "alpha_ratio")
    val alt = rewrite(base)
      .select("doc_id", "bullet_ratio", "ellipsis_ratio", "alpha_ratio")
    val diffs = shipped.exceptAll(hof).count() + hof.exceptAll(shipped).count() +
      shipped.exceptAll(alt).count() + alt.exceptAll(shipped).count()
    println(s"""{"probe":"gopher_hof","rewrite_diff_rows":$diffs}""")
    base.unpersist(): Unit

    for (k <- Seq(1, reps)) {
      val c = lined(corpus(k)).persist()
      c.count(): Unit
      val hofSec = med(time(graft.text.TextAnalysis.gopherRules(c, "text")
        .drop("bullet_ratio", "ellipsis_ratio", "alpha_ratio")
        .transform(hofForms)))
      val cg = med(time(graft.text.TextAnalysis.gopherRules(c, "text")))
      println(f"""{"k":$k,"rows":${c.count()},"t17_hof_forms":$hofSec%.2f,"t17_shipped_codegen":$cg%.2f}""")
      c.unpersist(): Unit
    }
    spark.stop()
  }
}
