package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD1/SCD2 CDC merge engine — the runtime semantics of the reference's
  * `dp.create_auto_cdc_flow(target, source, keys, sequence_by,
  * stored_as_scd_type, ignore_null_updates, apply_as_deletes,
  * column_list/except_column_list, track_history_*)`
  * (reference: templates/write/streaming_table.py.j2:1-74,
  * src/lhp/generators/write/streaming_table.py:106-114,270-286).
  *
  * Distributed design (100 TB): everything is window functions over a single
  * hash-partition-by-key shuffle — no driver-side loops, no collect. Merging a
  * batch into an existing table touches only *affected keys* (semi-join on the
  * batch's keys, which Catalyst plans as a broadcast when the batch is small),
  * rebuilds their version chains, and unions the untouched majority back via
  * anti-join. Rebuild-from-versions makes the merge idempotent and correct
  * under out-of-order sequence numbers and multi-row-per-key batches — a late
  * event slots into its correct historical position instead of corrupting the
  * open row.
  */
object ScdMerge {

  final case class Options(
      keys: Seq[String],
      sequenceBy: Seq[String],
      scdType: Int = 1,
      /** Columns whose changes open a new SCD2 version; None = all non-key,
        * non-sequence columns minus `trackHistoryExcept`. */
      trackHistoryColumns: Option[Seq[String]] = None,
      trackHistoryExcept: Seq[String] = Nil,
      ignoreNullUpdates: Boolean = false,
      /** SQL predicate over change rows marking deletes. */
      applyAsDeletes: Option[String] = None,
      /** SQL predicate over change rows marking full truncates (SCD1 only,
        * as in DLT). */
      applyAsTruncates: Option[String] = None,
      /** Keep only these change columns (plus keys/sequence). */
      columnList: Option[Seq[String]] = None,
      exceptColumnList: Seq[String] = Nil) {
    require(scdType == 1 || scdType == 2, s"scdType must be 1 or 2, got $scdType")
    require(keys.nonEmpty && sequenceBy.nonEmpty, "keys and sequenceBy required")
  }

  val StartCol = "__start_at"
  val EndCol = "__end_at"
  private val OpCol = "__graft_op" // internal: true = delete tombstone
  private val TruncCol = "__graft_trunc" // internal: true = truncate row
  // internal: true = a STORED version boundary re-entering a rebuild. A
  // stored version start is a WITNESSED event: retroactively collapsing
  // two stored same-value spans (e.g. [1,4)c + [4,6)c after a late c@1
  // merged below a stored c@4) erases the boundary, and a later late
  // event landing INSIDE the erased span then rebuilds the wrong value
  // timeline (b@3 arriving after the erasure yields [3,6)b where the
  // truth is [3,4)b + [4,6)c — caught by PipelineRunnerSpec's
  // unordered-batches property). DLT never re-collapses stored rows;
  // no-op collapse applies only to rows AT THEIR OWN ARRIVAL.
  private val PinCol = "__graft_pin"

  /** Delete/truncate predicates evaluate NULL-as-false (SQL WHERE
    * semantics, and the change log's own `_change_type` stamping): an op
    * column that is NULL on ordinary upserts must not read as a DELETE —
    * pre-fix, `!NULL` filtered the row out of the winners, silently
    * deleting the key. */
  private def predCol(p: Option[String]): Column =
    p.map(e => coalesce(expr(e), lit(false))).getOrElse(lit(false))

  private def seqCol(opts: Options): Column =
    if (opts.sequenceBy.size == 1) col(opts.sequenceBy.head)
    else struct(opts.sequenceBy.map(col): _*)

  /** Project the change feed down to the declared column surface. Internal
    * bookkeeping columns (OpCol, StartCol) always survive — the delete/
    * truncate predicates are evaluated BEFORE this projection, so an
    * `except_column_list` entry may itself feed a predicate. */
  private def selectColumns(changes: DataFrame, opts: Options): DataFrame = {
    val keep = Set(OpCol, TruncCol, StartCol)
    val base = opts.columnList match {
      case Some(cs) => changes.select(
        ((opts.keys ++ opts.sequenceBy ++ cs).distinct ++ changes.columns.filter(keep)).map(col): _*)
      case None => changes
    }
    val dropped = opts.exceptColumnList
      .filterNot(c => opts.keys.contains(c) || opts.sequenceBy.contains(c) || keep(c))
    base.drop(dropped: _*)
  }

  /** SCD1: latest row per key wins; deletes remove the key; a truncate row
    * anywhere in the batch clears the ENTIRE prior target (DLT
    * apply_as_truncates semantics — truncation is not sequence-relative),
    * while the batch's own non-truncate rows all apply. Result = the
    * current table.
    *
    * `tombstones` are the STANDING deletes from earlier batches (keys +
    * their delete sequence): because SCD1 deletes leave no row behind, a
    * later batch carrying a LATE event (sequence below the delete's)
    * would otherwise silently resurrect the deleted key. DLT keeps the
    * same state internally (its `pipelines.cdc` tombstone-GC setting
    * exists for exactly this), and the engine's time-travel replay (the
    * whole change log as one batch) already keeps the key dead — without
    * the tombstones the live fold and the replay DISAGREE. Each
    * tombstone re-enters the competition as a synthetic delete row (data
    * columns null): a late change below its sequence loses — the key
    * stays deleted — while a genuinely newer change wins and retires it.
    * The engine persists them in the `<table>__tombstones` companion
    * (see PipelineRunner.mergeInto); one-shot callers (no prior batches)
    * have none. */
  def scd1(target: Option[DataFrame], changes: DataFrame, opts: Options,
      tombstones: Option[DataFrame] = None): DataFrame = {
    val sq = seqCol(opts)
    // BOTH predicates evaluate before the column projection (the
    // selectColumns contract: an except_column_list entry may itself feed
    // a predicate — evaluating the truncate on the projected frame threw
    // UNRESOLVED_COLUMN whenever the predicate's column was excepted)
    val ch0 = selectColumns(
      changes.withColumn(OpCol, predCol(opts.applyAsDeletes))
        .withColumn(TruncCol, predCol(opts.applyAsTruncates)), opts)

    // Truncates: a truncate row in the batch clears the prior table (DLT
    // truncates the whole target) — and the standing tombstones with it:
    // they are prior state too. The has-truncate flag is a 1-row broadcast
    // folded into the merge plan — no separate driver-side job per merge.
    val (ch, tgt, tomb) = opts.applyAsTruncates match {
      case Some(_) =>
        val flag = broadcast(ch0.agg(
          max(when(col(TruncCol), lit(1)).otherwise(lit(0))).as("__trunc")))
        def keepPrior(d: DataFrame): DataFrame = d.crossJoin(flag)
          .filter(col("__trunc").isNull || col("__trunc") === 0).drop("__trunc")
        (ch0.filter(!col(TruncCol)).drop(TruncCol),
          target.map(keepPrior), tombstones.map(keepPrior))
      case None => (ch0.drop(TruncCol), target, tombstones)
    }

    val attrCols = ch.columns.filterNot(_ == OpCol)
    // Targets written by this engine retain the sequence columns, so the
    // existing row competes at its true position. If a target lacks them
    // (external table), its rows get null sequence — `desc` ordering puts
    // nulls last, so any change in the batch wins, i.e. existing = oldest.
    // Tombstones align the same way (their data columns are null).
    def align(d: DataFrame): DataFrame =
      attrCols.foldLeft(d) { (dd, c) =>
        if (dd.columns.contains(c)) dd else dd.withColumn(c, lit(null))
      }.select(attrCols.toSeq.map(col): _*)
    val withTarget = tgt match {
      case None => ch
      case Some(t) => align(t).withColumn(OpCol, lit(false)).unionByName(ch)
    }
    val unioned = tomb match {
      case None => withTarget
      case Some(ts) =>
        withTarget.unionByName(align(ts).withColumn(OpCol, lit(true)))
    }

    // ignore_null_updates (DLT semantics, SCD1 too — a null column in an
    // update keeps the standing value): forward-fill each data column from
    // earlier versions of the SAME live span. The ordering struct is
    // captured from the RAW values so the winner pick below is independent
    // of the fill; deletes reset the fill (a re-insert after a delete must
    // NOT inherit pre-delete values — sequentially the state was gone).
    val base = unioned.withColumn("__ord", struct(attrCols.toSeq.map(col): _*))
    val filled =
      if (!opts.ignoreNullUpdates) base
      else {
        val dataCols = attrCols.filterNot(c =>
          opts.keys.contains(c) || opts.sequenceBy.contains(c))
        fillNullsWithinSpan(base, opts.keys,
          Seq(sq.asc, col(OpCol).asc, col("__ord").asc), dataCols.toSeq)
      }
    // OpCol breaks sequence ties DETERMINISTICALLY: a delete tied with a
    // data row at the same sequence applies AFTER it, so the delete wins
    // the key's final state (the SnapshotCdc shape — a delete stamped at
    // the snapshot's max sequence can tie an unchanged live version;
    // without the tie-break the winner depended on partition layout)
    val w = Window.partitionBy(opts.keys.map(col): _*)
      .orderBy(sq.desc, col(OpCol).desc, col("__ord").desc)
    filled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(OpCol))
      .drop("__rn", "__ord", OpCol)
  }

  /** Forward-fill nulls in `dataCols` from earlier non-delete versions,
    * resetting at delete tombstones: versions are epoch-tagged by a running
    * delete count, and a fill only applies when its source epoch matches the
    * row's — all inside the ONE keys-partitioned sort (the epoch rides in
    * the filled struct; no second exchange). */
  private def fillNullsWithinSpan(df: DataFrame, keys: Seq[String],
      ord: Seq[Column], dataCols: Seq[String]): DataFrame = {
    val wRows = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = df.withColumn("__epoch",
      sum(when(col(OpCol), 1L).otherwise(0L)).over(wRows))
    dataCols.foldLeft(tagged) { (d, c) =>
      val src = last(when(!col(OpCol) && col(c).isNotNull,
        struct(col("__epoch").as("e"), col(c).as("v"))), ignoreNulls = true).over(wRows)
      d.withColumn(c,
        when(col(OpCol), col(c)).otherwise(
          when(src("e") === col("__epoch"), src("v"))))
    }.drop("__epoch")
  }

  /** SCD2: full history with `__start_at` / `__end_at` (null = current).
    * A key's chain is rebuilt from all its versions; only changes in tracked
    * columns open a new version (untracked-column changes update in place on
    * the open version, matching DLT's track_history semantics).
    *
    * `tombstones` are the standing DANGLING deletes from earlier batches —
    * deletes that closed nothing when they arrived (the key had no
    * earlier-sequenced data YET). A closed row re-emits its closing
    * tombstone at rebuild time, but a dangling delete leaves no row at
    * all, so without this input a late event below it opens an
    * unclosed span and same-value runs collapse across the vanished
    * delete (fold ≠ one-shot — caught by PipelineRunnerSpec's
    * unordered-batches property). Each one re-enters the rebuild as a
    * synthetic delete row; duplicates against a re-emitted tombstone
    * squash away ((key, seq, op) is the squash identity). The engine
    * persists them in `<table>__tombstones` (PipelineRunner.mergeInto),
    * retiring each when the written table carries a row closed at
    * exactly its sequence — from then on the rebuild re-derives it. */
  def scd2(target: Option[DataFrame], changes: DataFrame, opts: Options,
      tombstones: Option[DataFrame] = None): DataFrame = {
    val sq = seqCol(opts)
    val ch0 = selectColumns(
      changes.withColumn(OpCol, predCol(opts.applyAsDeletes)), opts)
      .drop(TruncCol)
      .withColumn(StartCol, sq)
    val ch = tombstones match {
      case None => ch0
      case Some(ts) =>
        val attrCols = ch0.columns.filterNot(c => c == OpCol || c == StartCol)
        val aligned = attrCols.foldLeft(ts) { (d, c) =>
          if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
        }.select(attrCols.toSeq.map(col): _*)
          .withColumn(OpCol, lit(true))
          .withColumn(StartCol, sq)
        ch0.unionByName(aligned)
    }

    // Convert existing history rows back into change rows: a closed final row
    // with no successor means the key was deleted — re-emit the tombstone so
    // the rebuild preserves it. Re-emitted rows are PINNED ([[PinCol]]):
    // their version boundaries are witnessed events the rebuild must not
    // retroactively collapse.
    val versions = target match {
      // an inherited __end_at on the CHANGE side is derived state, not a
      // data column (the Some(t) branch drops it before rebuild for the
      // same reason): kept, it would join the default tracked set — every
      // adjacent version pair would "differ" on old end timestamps and
      // never collapse, so replaying an existing SCD2 table's rows into a
      // fresh target would diverge from the merged history
      case None => ch.drop(EndCol).withColumn(PinCol, lit(false))
      case Some(t) =>
        val chKeys = ch.select(opts.keys.map(col): _*).distinct()
        val affected = t.join(chKeys, opts.keys, "left_semi")
        val untouched = t.join(chKeys, opts.keys, "left_anti")
        // A row whose __end_at does not meet its successor's __start_at was
        // closed by a DELETE (mid-history gap or final closure) — re-emit
        // that tombstone or the rebuild would resurrect the span.
        val wk = Window.partitionBy(opts.keys.map(col): _*).orderBy(col(StartCol).asc)
        val withNext = affected.withColumn("__next", lead(col(StartCol), 1).over(wk))
        val reChanges = withNext.drop("__next", EndCol)
          .withColumn(OpCol, lit(false)).withColumn(PinCol, lit(true))
        val reTombs = withNext
          .filter(col(EndCol).isNotNull && !(col(EndCol) <=> col("__next")))
          .withColumn(StartCol, col(EndCol))
          .drop("__next", EndCol)
          .withColumn(OpCol, lit(true)).withColumn(PinCol, lit(true))
        val rebuilt = rebuildChains(reChanges.unionByName(reTombs)
          .unionByName(ch.drop(EndCol).withColumn(PinCol, lit(false))), opts)
        return untouched.unionByName(rebuilt)
    }
    rebuildChains(versions, opts)
  }

  /** Core chain rebuild: order each key's versions by sequence, squash exact
    * duplicates of the sequence value, forward-fill nulls if requested,
    * collapse consecutive versions with identical tracked columns, then derive
    * `__end_at` from the next surviving version. Input must carry
    * [[StartCol]] and [[OpCol]]. */
  private def rebuildChains(versions: DataFrame, opts: Options): DataFrame = {
    val keys = opts.keys
    val dataCols = versions.columns.filterNot(c =>
      keys.contains(c) || c == OpCol || c == StartCol || c == PinCol ||
        opts.sequenceBy.contains(c))
    val tracked = opts.trackHistoryColumns
      .getOrElse(dataCols.toSeq)
      .filterNot(opts.trackHistoryExcept.contains)

    // Every chain window orders (start asc, OpCol asc): a tombstone TIED
    // with a data version at the same sequence reads version-then-delete,
    // so the delete CLOSES the version ([start,start] span) instead of the
    // pair resolving by partition layout. The SnapshotCdc feed produces
    // exactly this tie when an open key's delete is stamped at a snapshot
    // max sequence another key still lives at.
    val wAsc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc, col(OpCol).asc)
    // 1. deterministic squash of duplicate (key, seq, op) rows — expressed
    //    as a lag on the SAME key partitioning as the chain windows below,
    //    so all window steps share ONE hash exchange. The op is part of
    //    the squash IDENTITY: a data version and a tombstone at one
    //    sequence are two distinct events (version + its closure), not a
    //    replay duplicate — squashing them to one row erased the key's
    //    whole history (the pre-fix behavior)
    //    The PINNED copy of a duplicate wins (a replayed batch row that
    //    duplicates a stored boundary must not strip its pin — an
    //    unpinned survivor could then be retroactively collapsed, the
    //    exact loss the pin prevents); data order breaks remaining ties.
    val wDedup = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc, col(OpCol).asc, col(PinCol).desc,
        struct(dataCols.toSeq.map(col): _*).desc)
    val squashed = versions
      .withColumn("__dup",
        (lag(col(StartCol), 1).over(wDedup) <=> col(StartCol)) &&
          (lag(col(OpCol), 1).over(wDedup) <=> col(OpCol)))
      .filter(!col("__dup")).drop("__dup")

    // 2. forward-fill nulls from earlier versions (ignore_null_updates),
    //    resetting at delete tombstones — a re-insert after a delete starts
    //    from scratch, matching the sequential-merge semantics
    val filled =
      if (!opts.ignoreNullUpdates) squashed
      else fillNullsWithinSpan(squashed, keys,
        Seq(col(StartCol).asc, col(OpCol).asc), dataCols.toSeq)

    // 3. change detection on tracked columns (delete boundaries always
    //    kept; PINNED rows always kept — a stored version boundary is a
    //    witnessed event, and collapsing it would erase information a
    //    later late event needs: no-op collapse applies only to rows at
    //    their own arrival, matching DLT)
    val trackedStruct =
      if (tracked.nonEmpty) struct(tracked.map(col): _*) else lit(0)
    val prevTracked = lag(trackedStruct, 1).over(wAsc)
    val prevOp = lag(col(OpCol), 1).over(wAsc)
    val keep = col(PinCol) || prevOp.isNull || col(OpCol) =!= prevOp ||
      !(trackedStruct <=> prevTracked)

    // 3b. untracked columns update in place: the surviving (first) version of
    //     a collapsed run must carry the LATEST untracked values of that run
    //     (DLT track_history semantics). Runs are contiguous per key, so the
    //     run-last row is recoverable inside the same key partition — a
    //     running keep-count tags runs, a descending scan pulls the nearest
    //     run-last at-or-after each row. Same hash exchange, extra sorts only.
    val untracked = dataCols.toSeq.filterNot(tracked.contains)
    val kept =
      if (untracked.isEmpty)
        filled.withColumn("__keep", keep).filter(col("__keep")).drop("__keep")
      else {
        val wAscRows = wAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wDescRows = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(StartCol).desc, col(OpCol).desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tagged = filled
          .withColumn("__keep", keep)
          .withColumn("__run", sum(col("__keep").cast("long")).over(wAscRows))
        val isRunLast = lead(col("__run"), 1).over(wAsc).isNull ||
          lead(col("__run"), 1).over(wAsc) =!= col("__run")
        val latest = tagged
          .withColumn("__runlast", when(isRunLast, struct(untracked.map(col): _*)))
          .withColumn("__latest", last(col("__runlast"), ignoreNulls = true).over(wDescRows))
        untracked.foldLeft(latest) { (d, c) => d.withColumn(c, col(s"__latest.$c")) }
          .filter(col("__keep")).drop("__keep", "__run", "__runlast", "__latest")
      }

    // 4. close each version at the next surviving version's start
    val wKept = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(StartCol).asc, col(OpCol).asc)
    kept
      .withColumn(EndCol, lead(col(StartCol), 1).over(wKept))
      .filter(!col(OpCol)) // tombstones only exist to close their predecessor
      .drop(OpCol, PinCol)
  }

  /** Dispatch on scdType. Returns the complete new target table contents. */
  def applyChanges(target: Option[DataFrame], changes: DataFrame, opts: Options): DataFrame =
    if (opts.scdType == 1) scd1(target, changes, opts) else scd2(target, changes, opts)
}
