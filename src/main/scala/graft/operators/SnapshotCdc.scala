package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-CDC: derive a change feed by diffing a full snapshot against the
  * target's current state (the reference's
  * `create_auto_cdc_from_snapshot_flow` — templates/write/
  * streaming_table.py.j2:75-127). Inserts/updates come from the snapshot;
  * deletes are open keys absent from the snapshot. The emitted feed carries
  * `__snapshot_op` and is consumed by [[ScdMerge]] with
  * `applyAsDeletes = "__snapshot_op = 'delete'"`.
  *
  * Scale: two hash joins on the key columns (snapshot vs current state) — no
  * driver-side diffing; 100 TB snapshots diff as ordinary co-partitioned
  * joins.
  */
object SnapshotCdc {

  val OpCol = "__snapshot_op"

  /** @param target   current SCD table contents (None on first snapshot)
    * @param snapshot full current snapshot, must contain key + sequence cols
    * @param opts     the merge options (keys + sequenceBy drive the diff) */
  def diff(target: Option[DataFrame], snapshot: DataFrame, opts: ScdMerge.Options): DataFrame = {
    val keys = opts.keys
    val snapCols = snapshot.columns.toSeq
    val attrCols = snapCols.filterNot(c => keys.contains(c) || opts.sequenceBy.contains(c))

    target match {
      case None => snapshot.withColumn(OpCol, lit("insert"))
      case Some(t) =>
        // current open state: SCD2 ⇒ __end_at is null; SCD1 ⇒ all rows
        val current0 = if (t.columns.contains(ScdMerge.EndCol)) t.filter(col(ScdMerge.EndCol).isNull) else t
        val current = current0.select(snapCols.filter(current0.columns.contains).map(col): _*)

        // presence detection rides TAG columns, not key-nullness: a row
        // with a NULL key component never equi-joins, so key-nullness read
        // it as "absent on both sides" — the row was silently dropped from
        // the feed (snapshot side) or survived every snapshot forever
        // (target side). Null-keyed rows cannot be diffed at all; the tag
        // doubles as a LOUD check that raises naming the side.
        def tagged(df: DataFrame, side: String): DataFrame = df.withColumn("__kchk",
          when(keys.map(col(_).isNull).reduceOption(_ || _).getOrElse(lit(false)),
            raise_error(concat(lit(s"SnapshotCdc.diff: the $side carries a " +
              "NULL component in key ("), lit(keys.mkString(", ")),
              lit(") — null-keyed rows match nothing in a key diff; " +
                "cleanse or filter them upstream"))))
            .otherwise(lit(true)))
        val joined = tagged(snapshot, "snapshot").as("s")
          .join(tagged(current, "target's open state").as("c"),
            keys.map(k => col(s"s.$k") === col(s"c.$k")).reduce(_ && _), "full_outer")

        val inSnap = col("s.__kchk").isNotNull
        val inCur = col("c.__kchk").isNotNull
        // a snapshot-only column (upstream schema evolution — the target
        // does not carry it yet): any non-null value IS a change, so the
        // widened rows flow through the merge instead of silently waiting
        // for some other column to change
        val changed = attrCols
          .map { c =>
            if (current.columns.contains(c)) !(col(s"s.$c") <=> col(s"c.$c"))
            else col(s"s.$c").isNotNull
          }
          .reduceOption(_ || _).getOrElse(lit(false))

        val maxSeq: Column =
          if (opts.sequenceBy.size == 1) max(col(opts.sequenceBy.head))
          else max(struct(opts.sequenceBy.map(col): _*))

        val upserts = joined.filter(inSnap && (!inCur || changed))
          .select((snapCols.map(c => col(s"s.$c").as(c)) :+
            when(inCur, lit("update")).otherwise(lit("insert")).as(OpCol)): _*)

        // deletes: open keys absent from the snapshot, sequenced at the
        // snapshot's max sequence value (the "snapshot version"). An EMPTY
        // snapshot has no sequence to stamp — its deletes would carry NULL
        // sequences, which desc-sort last in scd1 (the deletes silently
        // no-op) and asc-sort first in scd2 (the tombstones close nothing):
        // either way a broken upstream extract masquerades as a clean run.
        // Deleting the whole table is expressed by dropping it, not by an
        // empty snapshot — refuse loudly.
        require(!(snapshot.isEmpty && !current.isEmpty),
          "SnapshotCdc.diff: the snapshot is EMPTY while the target has " +
            "open keys — an empty snapshot usually means a broken upstream " +
            "extract, and its deletes would carry NULL sequences that merge " +
            "as silent no-ops. If every key was genuinely deleted, drop or " +
            "truncate the target instead.")
        val snapVersion = snapshot.agg(maxSeq.as("__v"))
        val deletes0 = joined.filter(inCur && !inSnap)
          .select(snapCols.map {
            // snapshot-only attr columns have no target-side value yet —
            // null-fill instead of an unresolved `c.<col>` reference
            case c if (keys.contains(c) || attrCols.contains(c)) &&
                current.columns.contains(c) => col(s"c.$c").as(c)
            case c => lit(null).as(c) // sequence cols filled from snapshot version
          }: _*)
        // Sequence deletes at the snapshot's max sequence so they sort AFTER
        // every version the snapshot itself carries and close the chain.
        // The same broken-extract class the empty-snapshot refusal above
        // catches can also arrive as a NON-empty snapshot whose sequence
        // column is entirely NULL: max() ignores nulls, __v comes back
        // null, and the deletes merge as the same silent no-ops — so the
        // stamp itself refuses a null snapshot version whenever a delete
        // actually needs it (raise_error rides the delete rows; a run
        // with no deletes never evaluates it).
        def checkedV(v: Column): Column = when(v.isNull, raise_error(lit(
          "SnapshotCdc.diff: the snapshot's sequence column(s) (" +
            opts.sequenceBy.mkString(", ") + ") are entirely NULL — " +
            "deletes stamped with a NULL sequence merge as silent no-ops; " +
            "fix the upstream extract"))).otherwise(v)
        val withVersion = deletes0.crossJoin(broadcast(snapVersion))
        val deletes =
          (if (opts.sequenceBy.size == 1)
            withVersion.withColumn(opts.sequenceBy.head, checkedV(col("__v")))
          else opts.sequenceBy.foldLeft(withVersion) { (d, c) =>
            d.withColumn(c, checkedV(col(s"__v.$c")))
          }).drop("__v").withColumn(OpCol, lit("delete"))

        upserts.unionByName(deletes)
    }
  }

  /** Merge options adjusted for a snapshot-diff feed. */
  def mergeOptions(opts: ScdMerge.Options): ScdMerge.Options =
    opts.copy(applyAsDeletes = Some(s"$OpCol = 'delete'"),
      exceptColumnList = opts.exceptColumnList :+ OpCol)
}
