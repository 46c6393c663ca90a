package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exec.TableStore

/** The full DLQ quarantine/recycle cycle — runtime semantics of the
  * reference's quarantine mode (templates/transform/
  * data_quality_quarantine.py.j2:1-215): violating rows land in a DLQ keyed
  * by content hash; externally-fixed rows (`_dlq_status = 'fixed'`) are
  * deduped (latest per `_dlq_sk`), re-projected onto the clean schema,
  * re-validated against the same rules, and unioned back into the clean
  * stream. Delta MERGE → [[TableStore.upsert]] (anti-join rewrite); CDF-based
  * recycle polling → status-column polling (SURVEY §2.2 quarantine row).
  */
object Quarantine {

  val SkCol = "_dlq_sk"
  val StatusCol = "_dlq_status"
  val VersionCol = "_dlq_version"

  /** Annotate violations and upsert them into the DLQ table. Returns the
    * clean (passing) rows. */
  def routeViolations(store: TableStore, dlqTable: String, src: DataFrame,
      rules: Seq[Expectations.Rule], sourceName: String): DataFrame = {
    val srcCols = src.columns.toSeq
    val bad = Expectations.quarantine(src, rules)
      .withColumn(SkCol, xxhash64(lit(sourceName), to_json(struct(srcCols.map(col): _*))))
      .withColumn(StatusCol, lit("quarantined"))
      .withColumn(VersionCol, lit(System.currentTimeMillis()))
    // whenNotMatchedInsertAll semantics: an operator-fixed row must not be
    // clobbered by the same violation arriving again
    store.insertIfAbsent(dlqTable, bad, Seq(SkCol))
    Expectations.dropQuarantined(src, rules)
  }

  /** Recycle pass: latest fixed row per `_dlq_sk` (row_number over commit
    * version desc), projected to `cleanColumns`, re-validated; rows passing
    * re-validation are returned and marked `recycled` in the DLQ.
    *
    * With `rescueCol` set (the rescued-data column of the cloudfiles load),
    * typed columns that are null are RE-PROJECTED from the rescue payload —
    * the engine's analogue of the reference's `try_variant_get` recycle
    * re-projection (templates/transform/data_quality_quarantine.py.j2:
    * 127-176): an operator repairs the raw record in place, and the recycle
    * pass parses it back into the typed schema and clears the consumed
    * rescue column, so `<rescue> IS NULL` expectations re-validate clean.
    *
    * `rescueFormat` must name the format the rescue payload was captured
    * from: a payload rescued by the csv load path is a raw CSV LINE —
    * `from_json` can never re-parse it, so repaired csv rows would silently
    * stay quarantined forever. For `"csv"` the typed columns re-project via
    * `from_csv` (positional: `cleanColumns` order must match the source's
    * csv column order, which it does when taken from the load's schema).
    * `rescueOptions` must carry the LOAD's parse options (sep, quote,
    * nullValue, dateFormat, …) — a non-default csv dialect re-parsed with
    * defaults would silently never recycle. */
  def recycle(store: TableStore, dlqTable: String, cleanColumns: Seq[String],
      rules: Seq[Expectations.Rule], rescueCol: Option[String] = None,
      rescueFormat: String = "json",
      rescueOptions: Map[String, String] = Map.empty): DataFrame = {
    require(rescueFormat == "json" || rescueFormat == "csv",
      s"rescueFormat must be json or csv, got '$rescueFormat'")
    store.readIfExists(dlqTable) match {
      case None => throw new IllegalStateException(s"no DLQ table '$dlqTable'")
      case Some(dlq) =>
        val w = Window.partitionBy(SkCol).orderBy(col(VersionCol).desc)
        val fixed = dlq.filter(col(StatusCol) === "fixed")
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        val candidates0 = fixed.select((cleanColumns :+ SkCol).map(col): _*)
        // a declared rescue column MUST be among the clean columns — a
        // silent degrade to the no-reprojection branch would leave every
        // repaired raw payload unparsed, failing re-validation forever
        // (the exact stay-quarantined failure the scaladoc warns about
        // for format mismatches)
        rescueCol.foreach(rc => require(cleanColumns.contains(rc),
          s"recycle: rescue column '$rc' is not among cleanColumns " +
            s"(${cleanColumns.mkString(", ")}) — repaired payloads could " +
            "never re-project; include it, or pass rescueCol = None"))
        val candidates = rescueCol match {
          case Some(rc) =>
            val typed = org.apache.spark.sql.types.StructType(
              candidates0.schema.fields.filter(f => f.name != rc && f.name != SkCol))
            val parse = if (rescueFormat == "csv")
              from_csv(col(rc), typed, rescueOptions)
            else from_json(col(rc), typed, rescueOptions)
            val reparsed = candidates0.withColumn("__fix", parse)
            // from_json yields an ALL-NULL struct (not null) for garbage
            // input, so "parse succeeded" = at least one field recovered
            val parseOk = typed.fieldNames.map(c => col(s"__fix.$c").isNotNull)
              .reduceOption(_ || _).getOrElse(lit(false))
            typed.fieldNames.foldLeft(reparsed) { (d, c) =>
              d.withColumn(c, coalesce(col(c), col(s"__fix.$c")))
            }
              .withColumn(rc, when(parseOk, lit(null).cast("string")).otherwise(col(rc)))
              .drop("__fix")
          case None => candidates0
        }
        // materialize BEFORE the DLQ rewrite below invalidates the files this
        // plan reads from. localCheckpoint is safe here because the frame is
        // bounded by the DLQ's fixed-row count (not corpus-scale); an
        // iterative/corpus-scale analogue should use Dedup.ReliableCheckpoint.
        val passed = Expectations.dropQuarantined(candidates, rules)
          .localCheckpoint(eager = true)
        // mark recycled rows so the next poll skips them
        val passedKeys = passed.select(SkCol)
        val updated = dlq.join(passedKeys, Seq(SkCol), "left_semi")
          .withColumn(StatusCol, lit("recycled"))
        store.upsert(dlqTable, updated, Seq(SkCol))
        passed.drop(SkCol)
    }
  }

  /** Clean stream = current clean rows ∪ recycled repaired rows — the final
    * union view of the quarantine template (.j2:204). */
  def cleanWithRecycled(clean: DataFrame, recycled: DataFrame): DataFrame =
    clean.unionByName(recycled, allowMissingColumns = true)
}
