package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: named boolean SQL constraints with a
  * warn / drop / fail action, the runtime semantics of the reference's
  * `@dp.expect_all[_or_drop|_or_fail]` decorators
  * (reference: templates/transform/data_quality.py.j2:1-30,
  * src/lhp/generators/transform/data_quality.py:68-117).
  *
  * Spark-first design: violations are evaluated as `Column` predicates inside
  * the same whole-stage-codegen pipeline as the rest of the plan — no UDFs, no
  * extra pass over the data.
  *   - warn  → counted via `Dataset.observe` (Catalyst `CollectMetrics` node;
  *             zero extra action, metrics arrive with the job that consumes
  *             the DataFrame)
  *   - drop  → a single conjunctive `filter`
  *   - fail  → violations counted by the caller (`failViolations`) which
  *             throws. On a BATCH frame this is a separate eager aggregate
  *             job at composition time — the input is scanned once for the
  *             gate and once at the sink. That second scan is the price of
  *             fail-BEFORE-write semantics (a typed ExpectationViolation
  *             with the count, no rows committed); the streaming arm's
  *             raise_error-per-row form would gate in one scan but surfaces
  *             as an opaque task failure mid-write. The gate aggregate is
  *             column-pruned to the rule expressions, so the extra scan
  *             reads only the violated-rule columns.
  */
object Expectations {

  sealed trait FailureAction
  case object Warn extends FailureAction
  case object Drop extends FailureAction
  case object Fail extends FailureAction

  final case class Rule(name: String, expression: String, action: FailureAction)

  final case class ExpectationViolation(rule: String, count: Long)
    extends RuntimeException(s"expectation '$rule' violated by $count row(s)")

  private def pred(r: Rule): Column = expr(r.expression)

  /** All rules pass ⇔ conjunction holds. Null predicate results count as
    * violations (matching DLT: a NULL constraint result is a failed row). */
  private def conj(rules: Seq[Rule]): Column =
    rules.map(r => coalesce(pred(r), lit(false))).reduceOption(_ && _).getOrElse(lit(true))

  /** Apply drop-mode rules: keep only rows passing every rule. */
  def dropViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val dropRules = rules.filter(_.action == Drop)
    if (dropRules.isEmpty) df else df.filter(conj(dropRules))
  }

  /** Quarantine-mode clean view: every non-warn violation routes to the DLQ,
    * so the clean stream must exclude rows failing ANY drop/fail rule — not
    * just drop-mode ones (fail-mode rows would otherwise appear in BOTH the
    * DLQ and the clean output; caught by CloudFilesOptionsSpec). */
  def dropQuarantined(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val checked = rules.filterNot(_.action == Warn)
    if (checked.isEmpty) df else df.filter(conj(checked))
  }

  /** Inverse filter: the rows that violate at least one drop/fail rule,
    * annotated with the list of failed rule names (the quarantine path —
    * reference: templates/transform/data_quality_quarantine.py.j2:120-135,
    * `array_compact(array(when(~expr(rule), struct(...))))`). */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    // reserved-column guard (the AsOfJoin/RangeJoin convention): rows read
    // back from a DLQ already carry _failed_rules, and a silent overwrite
    // would clobber the original failure annotation
    require(!df.columns.contains("_failed_rules"),
      "quarantine: input already carries a '_failed_rules' column (rows " +
        "read back from a DLQ?) — drop or rename it before re-validating")
    val checked = rules.filterNot(_.action == Warn)
    // zero checked rules: array() of no children types array<null>, which
    // parquet REJECTS when the (empty) quarantine frame writes its schema
    // to the DLQ — type the empty case explicitly and no-op
    val failedArr =
      if (checked.isEmpty) array().cast("array<string>")
      else array_compact(array(checked.map { r =>
        when(!coalesce(pred(r), lit(false)), lit(r.name))
      }: _*))
    df.withColumn("_failed_rules", failedArr)
      .filter(size(col("_failed_rules")) > 0)
  }

  /** Attach warn-mode rules as observed metrics named `violations_<rule>`.
    * Metrics materialize when the DataFrame is consumed — no separate job. */
  def observeWarnings(df: DataFrame, rules: Seq[Rule], observationName: String = "expectations"): DataFrame = {
    val warnRules = rules.filter(_.action == Warn)
    if (warnRules.isEmpty) df
    else {
      val metrics = warnRules.map { r =>
        sum(when(!coalesce(pred(r), lit(false)), 1L).otherwise(0L)).as(s"violations_${r.name}")
      }
      df.observe(observationName, metrics.head, metrics.tail: _*)
    }
  }

  /** Enforce fail-mode rules: one EAGER aggregate job counting violations
    * per rule (batch frames only — executes at composition time, before any
    * sink sees a row); throws on the first rule with violations. */
  def failViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val failRules = rules.filter(_.action == Fail)
    if (failRules.isEmpty) df
    else if (df.isStreaming) {
      // STREAMING: an eager count is impossible (it would throw Spark's
      // "must be executed with writeStream.start()" at plan-build time,
      // making expect_or_fail unusable on every streaming path). Enforce
      // at EXECUTION instead: a violating row evaluates raise_error and
      // fails its microbatch — DLT's expect_or_fail semantics (the update
      // fails; already-committed batches stand).
      failRules.foldLeft(df) { (d, r) =>
        d.filter(when(!coalesce(pred(r), lit(false)),
          raise_error(concat(
            lit(s"expectation '${r.name}' (${r.expression}) violated by row: "),
            to_json(struct(df.columns.map(col): _*)))))
          .otherwise(lit(true)))
      }
    } else {
      val counts = df.select(failRules.map { r =>
        sum(when(!coalesce(pred(r), lit(false)), 1L).otherwise(0L)).as(r.name)
      }: _*).first()
      failRules.zipWithIndex.foreach { case (r, i) =>
        val c = if (counts.isNullAt(i)) 0L else counts.getLong(i)
        if (c > 0) throw ExpectationViolation(r.name, c)
      }
      df
    }
  }

  /** Full pipeline: warn → observe, drop → filter, fail → check-and-throw.
    * `observationName` must be UNIQUE per dataset in a plan: Spark refuses
    * duplicate observed-metric names, so two expectation-wrapped datasets
    * meeting in one query (a chained data_quality, a write over a dq view)
    * would otherwise fail at the sink with an anonymous AnalysisException. */
  def apply(df: DataFrame, rules: Seq[Rule],
      observationName: String = "expectations"): DataFrame =
    dropViolations(
      failViolations(observeWarnings(df, rules, observationName), rules), rules)
}
