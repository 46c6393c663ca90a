package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

class ScdMergeSpec extends SparkSuite {
  import spark.implicits._

  private val opts1 = ScdMerge.Options(keys = Seq("k"), sequenceBy = Seq("seq"), scdType = 1)
  private val opts2 = ScdMerge.Options(keys = Seq("k"), sequenceBy = Seq("seq"), scdType = 2)

  private def changes(rows: (Int, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "seq", "v")

  test("scd1: latest per key wins") {
    val out = ScdMerge.scd1(None, changes((1, 1L, "a"), (1, 3L, "c"), (1, 2L, "b"), (2, 1L, "x")), opts1)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "c"), (2, "x")))
  }

  test("scd1: delete removes key; merge with target upserts") {
    val t0 = ScdMerge.scd1(None, changes((1, 1L, "a"), (2, 1L, "x")), opts1)
    val o = opts1.copy(applyAsDeletes = Some("v = 'DEL'"))
    val t1 = ScdMerge.scd1(Some(t0), changes((1, 2L, "DEL"), (3, 2L, "n")), o)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(t1 == Set((2, "x"), (3, "n")))
  }

  test("a NULL delete predicate is NOT a delete (SQL WHERE semantics)") {
    // op populated only on deletes (the common CDC shape): ordinary
    // upserts evaluate the predicate NULL — pre-fix `!NULL` filtered the
    // winner out, silently deleting every key whose op was null
    val ch = Seq((1, 1L, "a", null), (2, 1L, "x", "D"), (3, 1L, "c", null))
      .toDF("k", "seq", "v", "op")
    val o1 = opts1.copy(applyAsDeletes = Some("op = 'D'"))
    val out1 = ScdMerge.scd1(None, ch, o1)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out1 == Set((1, "a"), (3, "c")), out1.toString)
    val o2 = opts2.copy(applyAsDeletes = Some("op = 'D'"))
    val open2 = ScdMerge.scd2(None, ch, o2)
      .filter($"__end_at".isNull)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(open2 == Set((1, "a"), (3, "c")), open2.toString)
  }

  test("truncate predicate may reference an except_column_list column") {
    // the selectColumns contract: delete AND truncate predicates evaluate
    // before the projection — pre-fix the truncate ran on the projected
    // frame and threw UNRESOLVED_COLUMN whenever its column was excepted
    val t0 = ScdMerge.scd1(None,
      Seq((1, 1L, "a", "U"), (2, 1L, "x", "U")).toDF("k", "seq", "v", "op"),
      opts1.copy(exceptColumnList = Seq("op")))
    val o = opts1.copy(applyAsTruncates = Some("op = 'T'"),
      exceptColumnList = Seq("op"))
    val t1 = ScdMerge.scd1(Some(t0),
      Seq((9, 2L, "t", "T"), (3, 2L, "n", "U")).toDF("k", "seq", "v", "op"), o)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(t1 == Set((3, "n")), t1.toString) // prior table truncated, batch row applied
    assert(!t1.exists(_._1 == 9)) // the truncate marker row itself is dropped
  }

  test("scd1: stale change loses to newer target row") {
    val t0 = ScdMerge.scd1(None, changes((1, 5L, "new")), opts1)
    val t1 = ScdMerge.scd1(Some(t0), changes((1, 2L, "stale")), opts1)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(t1 == Set((1, "new")))
  }

  test("scd2: versions chain with start/end; only tracked changes open versions") {
    val out = ScdMerge.scd2(None,
      changes((1, 1L, "a"), (1, 2L, "a"), (1, 3L, "b"), (1, 5L, "a")), opts2)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1, "a", 1L, Some(3L)), (1, "b", 3L, Some(5L)), (1, "a", 5L, None)))
  }

  test("scd2: out-of-order late event slots into history") {
    val b1 = ScdMerge.scd2(None, changes((1, 1L, "a"), (1, 5L, "c")), opts2)
    val b2 = ScdMerge.scd2(Some(b1), changes((1, 3L, "b")), opts2)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(b2 == Set((1, "a", 1L, Some(3L)), (1, "b", 3L, Some(5L)), (1, "c", 5L, None)))
  }

  test("scd2: delete closes the open row without successor") {
    val o = opts2.copy(applyAsDeletes = Some("v = 'DEL'"))
    val out = ScdMerge.scd2(None, changes((1, 1L, "a"), (1, 4L, "DEL")), o)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1, "a", 1L, Some(4L))))
    // and the deletion survives a later merge of an unrelated key
    val t1 = ScdMerge.scd2(Some(ScdMerge.scd2(None, changes((1, 1L, "a"), (1, 4L, "DEL")), o)),
      changes((1, 6L, "re")), o)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(t1 == Set((1, "a", 1L, Some(4L)), (1, "re", 6L, None)))
  }

  test("scd1: a standing tombstone outranks a late event — no resurrection") {
    // SCD1 deletes leave no row behind, so without the tombstone input a
    // LATE event (sequence below the delete's) arriving in a later batch
    // would win against an empty target and silently resurrect the key —
    // diverging from both DLT (which keeps tombstones internally) and
    // this engine's own time-travel replay (one-batch over the full log).
    val o = opts1.copy(applyAsDeletes = Some("v = 'DEL'"))
    val t0 = ScdMerge.scd1(None, changes((1, 1L, "a"), (2, 1L, "x")), o)
    val t1 = ScdMerge.scd1(Some(t0), changes((1, 5L, "DEL")), o)
    assert(t1.filter($"k" === 1).isEmpty, "delete must remove the key")
    val tombs = Seq((1, 5L)).toDF("k", "seq")
    // late event BELOW the tombstone: key stays dead
    val t2 = ScdMerge.scd1(Some(t1), changes((1, 3L, "stale")), o, Some(tombs))
    assert(t2.filter($"k" === 1).isEmpty,
      "a late event below the standing delete resurrected the key")
    assert(t2.select("k", "v").as[(Int, String)].collect().toSet == Set((2, "x")))
    // genuinely newer event: wins, key returns
    val t3 = ScdMerge.scd1(Some(t1), changes((1, 7L, "new")), o, Some(tombs))
    assert(t3.select("k", "v").as[(Int, String)].collect().toSet ==
      Set((1, "new"), (2, "x")))
    // one-shot equivalence: the tombstone-threaded fold equals the whole
    // stream applied as a single batch
    val oneShot = ScdMerge.scd1(None,
      changes((1, 1L, "a"), (2, 1L, "x"), (1, 5L, "DEL"), (1, 3L, "stale")), o)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(t2.select("k", "v").as[(Int, String)].collect().toSet == oneShot)
  }

  test("scd1: ignore_null_updates keeps standing values on null columns") {
    // was a silent no-op before round 7: the flag parsed but scd1 ignored it
    val o = opts1.copy(ignoreNullUpdates = true)
    val out = ScdMerge.scd1(None,
      Seq[(Int, Long, Option[String], Option[Int])](
        (1, 1L, Some("a"), Some(10)), (1, 2L, None, Some(20)),
        (1, 3L, Some("c"), None), (2, 1L, None, None))
        .toDF("k", "seq", "v", "n"), o)
      .select("k", "v", "n").as[(Int, Option[String], Option[Int])].collect().toSet
    // k=1: v fills from seq1 'a' through the null at seq2, then 'c' wins;
    //      n fills from seq2's 20 through seq3's null. k=2: nothing to fill.
    assert(out == Set((1, Some("c"), Some(20)), (2, None, None)))
    // merging against an existing target keeps standing values too
    val t0 = ScdMerge.scd1(None, Seq[(Int, Long, Option[String], Option[Int])](
      (1, 1L, Some("a"), Some(10))).toDF("k", "seq", "v", "n"), o)
    val t1 = ScdMerge.scd1(Some(t0), Seq[(Int, Long, Option[String], Option[Int])](
      (1, 2L, None, Some(30))).toDF("k", "seq", "v", "n"), o)
      .select("k", "v", "n").as[(Int, Option[String], Option[Int])].collect().toSet
    assert(t1 == Set((1, Some("a"), Some(30))))
  }

  test("scd1/scd2: ignore_null_updates does NOT leak values across a delete") {
    // sequentially the state is GONE after a delete — a later re-insert
    // with null columns starts from scratch, not from pre-delete values
    val o1 = opts1.copy(ignoreNullUpdates = true, applyAsDeletes = Some("op = 'D'"))
    val rows = Seq[(Int, Long, Option[String], String)](
      (1, 1L, Some("a"), "U"), (1, 2L, Some("x"), "D"),
      (1, 3L, None, "U")).toDF("k", "seq", "v", "op")
    val out1 = ScdMerge.scd1(None, rows, o1)
      .select("k", "v").as[(Int, Option[String])].collect().toSet
    assert(out1 == Set((1, None)))
    val o2 = opts2.copy(ignoreNullUpdates = true, applyAsDeletes = Some("op = 'D'"))
    val out2 = ScdMerge.scd2(None, rows, o2)
      .filter("__end_at IS NULL")
      .select("k", "v").as[(Int, Option[String])].collect().toSet
    assert(out2 == Set((1, None)))
  }

  test("scd2: ignore_null_updates forward-fills") {
    val o = opts2.copy(ignoreNullUpdates = true)
    val out = ScdMerge.scd2(None,
      Seq((1, 1L, Some("a")), (1, 3L, None), (1, 5L, Some("b"))).toDF("k", "seq", "v"), o)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1, "a", 1L, Some(5L)), (1, "b", 5L, None)))
  }

  test("scd2: late change between collapsed same-value events matches DLT semantics") {
    // batch 1: b@1, b@3 collapse to one version; batch 2 delivers late c@2.
    // The collapsed b@3 is not resurrected (DLT, processing b@3 after c@2 in
    // arrival order, would KEEP b@3 only if it arrived after c — across
    // batches it was already collapsed). Result: b[1,2), c[2,∞).
    val b1 = ScdMerge.scd2(None, changes((1, 1L, "b"), (1, 3L, "b")), opts2)
    val out = ScdMerge.scd2(Some(b1), changes((1, 2L, "c")), opts2)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1, "b", 1L, Some(2L)), (1, "c", 2L, None)))
  }

  test("scd2: multi-column sequence_by chains by struct order") {
    val o = ScdMerge.Options(keys = Seq("k"), sequenceBy = Seq("d", "tiebreak"), scdType = 2)
    val ch = Seq((1, 10L, 1L, "a"), (1, 10L, 2L, "b"), (1, 9L, 9L, "z"))
      .toDF("k", "d", "tiebreak", "v")
    val out = ScdMerge.scd2(None, ch, o)
      .selectExpr("k", "v", "__start_at.d", "__start_at.tiebreak", "__end_at IS NULL")
      .as[(Int, String, Long, Long, Boolean)].collect().toSet
    // order: (9,9)=z -> (10,1)=a -> (10,2)=b; only b open
    assert(out == Set((1, "z", 9L, 9L, false), (1, "a", 10L, 1L, false), (1, "b", 10L, 2L, true)))
  }

  test("scd2: track_history_column_list — untracked changes update in place, not new versions") {
    val o = opts2.copy(trackHistoryColumns = Some(Seq("v")))
    val ch = Seq((1, 1L, "a", "n1"), (1, 2L, "a", "n2"), (1, 3L, "b", "n3"), (1, 4L, "b", "n4"))
      .toDF("k", "seq", "v", "note")
    val out = ScdMerge.scd2(None, ch, o)
      .select("k", "v", "note", "__start_at", "__end_at")
      .as[(Int, String, String, Long, Option[Long])].collect().toSet
    // v changes open versions at 1 and 3; each surviving version carries the
    // LATEST untracked `note` of its collapsed run (DLT track_history)
    assert(out == Set((1, "a", "n2", 1L, Some(3L)), (1, "b", "n4", 3L, None)))
  }

  test("scd2: track_history_except_column_list — excluded column updates in place") {
    val o = opts2.copy(trackHistoryExcept = Seq("audit"))
    val ch = Seq((1, 1L, "a", "x1"), (1, 2L, "a", "x2"), (1, 5L, "b", "x3"))
      .toDF("k", "seq", "v", "audit")
    val out = ScdMerge.scd2(None, ch, o)
      .select("k", "v", "audit", "__start_at", "__end_at")
      .as[(Int, String, String, Long, Option[Long])].collect().toSet
    assert(out == Set((1, "a", "x2", 1L, Some(5L)), (1, "b", "x3", 5L, None)))
  }

  test("scd2: track_history with incremental merges keeps latest untracked value") {
    val o = opts2.copy(trackHistoryColumns = Some(Seq("v")))
    def df(rows: (Int, Long, String, String)*) = rows.toSeq.toDF("k", "seq", "v", "note")
    val b1 = ScdMerge.scd2(None, df((1, 1L, "a", "n1")), o)
    val b2 = ScdMerge.scd2(Some(b1), df((1, 2L, "a", "n2")), o)
      .select("k", "v", "note", "__start_at", "__end_at")
      .as[(Int, String, String, Long, Option[Long])].collect().toSet
    // same tracked value arriving later: no new version, note updates in place
    assert(b2 == Set((1, "a", "n2", 1L, None)))
  }

  test("same-sequence delete+version ties are deterministic: version-then-delete") {
    // the SnapshotCdc shape: a delete stamped at the snapshot's max
    // sequence can TIE an unchanged live version (same key, same seq,
    // same attrs). Pre-fix, scd2's squash treated the pair as one
    // duplicate and erased the key's whole history; scd1's winner window
    // had a complete ordering tie and picked by partition layout.
    val o2 = opts2.copy(applyAsDeletes = Some("__del"))
    val tie2 = Seq((1, 5L, "a", false), (1, 5L, "a", true), (2, 5L, "b", false))
      .toDF("k", "seq", "v", "__del")
    val out2 = ScdMerge.scd2(None, tie2, o2)
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    // key 1's version exists CLOSED at its own start — not erased, not open
    assert(out2 == Set((1, "a", 5L, Some(5L)), (2, "b", 5L, None)), out2.toString)
    // scd1: the delete wins the final state, on every partition layout
    val o1 = opts1.copy(applyAsDeletes = Some("__del"))
    (1 to 4).foreach { parts =>
      val tie1 = Seq((1, 5L, "a", false), (1, 5L, "a", true), (2, 5L, "b", false))
        .toDF("k", "seq", "v", "__del").repartition(parts)
      val out1 = ScdMerge.scd1(None, tie1, o1)
        .select("k", "v").as[(Int, String)].collect().toSet
      assert(out1 == Set((2, "b")), s"parts=$parts: $out1")
    }
  }

  test("snapshot-cdc: a delete tying a live version's sequence closes it, never erases it") {
    // target: A and B both open at seq 5; snapshot 2 carries only B
    // (unchanged, still seq 5) → A's delete is stamped at max = 5, TYING
    // A's own live version. Pre-fix this erased A's history entirely.
    val o = opts2
    val s1 = Seq((10, 5L, "a"), (20, 5L, "b")).toDF("k", "seq", "v")
    val t1 = ScdMerge.applyChanges(None,
      SnapshotCdc.diff(None, s1, o), SnapshotCdc.mergeOptions(o))
    val s2 = Seq((20, 5L, "b")).toDF("k", "seq", "v")
    val t2 = ScdMerge.applyChanges(Some(t1),
      SnapshotCdc.diff(Some(t1), s2, o), SnapshotCdc.mergeOptions(o))
      .select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(t2 == Set((10, "a", 5L, Some(5L)), (20, "b", 5L, None)), t2.toString)
  }

  test("snapshot-cdc: an EMPTY snapshot against live keys refuses loudly") {
    // an empty snapshot has no sequence to stamp deletes with — NULL
    // sequences merge as silent no-ops, masking a broken extract
    val o = opts2
    val t1 = ScdMerge.applyChanges(None,
      SnapshotCdc.diff(None, Seq((1, 1L, "a")).toDF("k", "seq", "v"), o),
      SnapshotCdc.mergeOptions(o))
    val empty = Seq.empty[(Int, Long, String)].toDF("k", "seq", "v")
    val e = intercept[IllegalArgumentException] {
      SnapshotCdc.diff(Some(t1), empty, o)
    }
    assert(e.getMessage.contains("EMPTY"), e.getMessage)
    // an empty snapshot against an EMPTY current state is a fine no-op
    val t0 = t1.filter("1 = 0")
    assert(SnapshotCdc.diff(Some(t0), empty, o).isEmpty)
  }

  test("snapshot-cdc: an all-NULL-sequence snapshot cannot stamp deletes silently") {
    // the empty-snapshot refusal's sibling: a NON-empty snapshot whose
    // sequence column is entirely NULL still has no version to stamp —
    // max() ignores nulls — and its deletes would merge as the same
    // silent no-ops. The stamp itself must refuse, but only when a
    // delete actually needs it.
    val o = opts2
    val t1 = ScdMerge.applyChanges(None,
      SnapshotCdc.diff(None, Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "seq", "v"), o),
      SnapshotCdc.mergeOptions(o))
    val nullSeq = Seq((1, null.asInstanceOf[java.lang.Long], "a2"))
      .toDF("k", "seq", "v")
    // key 2 vanished → a delete must be stamped → loud refusal
    val e = intercept[Exception] {
      SnapshotCdc.diff(Some(t1), nullSeq, o).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(c => Option(c.getMessage).exists(_.contains("entirely NULL"))),
      s"expected the null-sequence refusal, got: $e")
    // same snapshot against only ITS OWN key (no deletes needed) flows —
    // the check rides the delete rows, not a whole-snapshot precondition
    val t1only = ScdMerge.applyChanges(None,
      SnapshotCdc.diff(None, Seq((1, 1L, "a")).toDF("k", "seq", "v"), o),
      SnapshotCdc.mergeOptions(o))
    assert(SnapshotCdc.diff(Some(t1only), nullSeq, o).collect().nonEmpty)
  }

  test("snapshot-cdc: multi-column sequence deletes close the chain at snapshot max") {
    val o = ScdMerge.Options(keys = Seq("k"), sequenceBy = Seq("d", "tiebreak"), scdType = 2)
    def snap(rows: (Int, Long, Long, String)*) = rows.toSeq.toDF("k", "d", "tiebreak", "v")
    val s1 = snap((1, 1L, 1L, "a"), (2, 1L, 1L, "x"))
    val t1 = ScdMerge.applyChanges(None,
      SnapshotCdc.diff(None, s1, o), SnapshotCdc.mergeOptions(o))
    // snapshot 2: key 2 vanished — its chain must close at (2, 0)
    val s2 = snap((1, 2L, 0L, "a"))
    val changes = SnapshotCdc.diff(Some(t1), s2, o)
    val t2 = ScdMerge.applyChanges(Some(t1), changes, SnapshotCdc.mergeOptions(o))
      .selectExpr("k", "v", "__end_at IS NULL")
      .as[(Int, String, Boolean)].collect().toSet
    assert(t2 == Set((1, "a", true), (2, "x", false)))
    // the delete row itself was sequenced at the snapshot's max sequence
    val del = changes.filter(s"${SnapshotCdc.OpCol} = 'delete'")
      .select("d", "tiebreak").as[(Long, Long)].collect().toSeq
    assert(del == Seq((2L, 0L)))
  }

  test("scd1: column_list / except_column_list project the change surface") {
    val o1 = opts1.copy(columnList = Some(Seq("v")))
    val ch = Seq((1, 1L, "a", "noise")).toDF("k", "seq", "v", "extra")
    val out = ScdMerge.scd1(None, ch, o1)
    assert(out.columns.toSet == Set("k", "seq", "v"))
    val o2 = opts1.copy(exceptColumnList = Seq("extra"))
    assert(ScdMerge.scd1(None, ch, o2).columns.toSet == Set("k", "seq", "v"))
  }

  test("scd1: truncate discards prior state, keeps post-truncate changes") {
    val o = opts1.copy(applyAsTruncates = Some("v = 'TRUNC'"))
    val t0 = ScdMerge.scd1(None, changes((1, 1L, "a"), (2, 1L, "b")), opts1)
    val t1 = ScdMerge.scd1(Some(t0), changes((3, 2L, "TRUNC"), (4, 3L, "new")), o)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(t1 == Set((4, "new")))
  }

  // ---------------------------------------------------- randomized property

  test("scd2 property: incremental merge == one-shot merge; invariants hold") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(25)
      val rows = List.fill(n)((1 + rnd.nextInt(3), 1L + rnd.nextInt(12),
        Seq("a", "b", "c")(rnd.nextInt(3))))
      // de-dup (k, seq): a real feed has one change per key per sequence value
      val distinctRows = rows.groupBy(r => (r._1, r._2)).map(_._2.last).toList
      // Split batches by a sequence watermark (how streams actually arrive):
      // rows within a batch may be in any order, but a later batch does not
      // interleave below the earlier batch's watermark. Fully interleaved
      // batches are covered by the dedicated late-arrival unit test — there,
      // like DLT, a collapsed same-value event is not resurrected.
      val t = 1L + rnd.nextInt(12)
      val (first, second) = distinctRows.partition(_._2 <= t)

      def resultSet(df: DataFrame) = df.select("k", "v", "__start_at", "__end_at")
        .as[(Int, String, Long, Option[Long])].collect().toSet

      val oneShot = resultSet(ScdMerge.scd2(None, distinctRows.toDF("k", "seq", "v"), opts2))
      val t0 = if (first.isEmpty) None
        else Some(ScdMerge.scd2(None, first.toDF("k", "seq", "v"), opts2))
      val incr =
        if (second.isEmpty) t0.map(resultSet).getOrElse(Set.empty)
        else resultSet(ScdMerge.scd2(t0, second.toDF("k", "seq", "v"), opts2))

      assert(oneShot == incr,
        s"trial $trial: one-shot $oneShot != incremental $incr (feed=$distinctRows watermark=$t)")
      oneShot.groupBy(_._1).foreach { case (k, vs) =>
        assert(vs.count(_._4.isEmpty) == 1, s"trial $trial key $k: open rows != 1 in $vs")
        val sorted = vs.toList.sortBy(_._3)
        sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
          assert(a._4.contains(b._3), s"trial $trial key $k: gap/overlap between $a and $b")
        }
      }
    }
  }

  test("scd2 property with deletes: invariants hold; incremental == one-shot") {
    val rnd = new scala.util.Random(7)
    val o = opts2.copy(applyAsDeletes = Some("v = 'DEL'"))
    for (trial <- 1 to 10) {
      val n = 1 + rnd.nextInt(25)
      val rows = List.fill(n)((1 + rnd.nextInt(3), 1L + rnd.nextInt(12),
        Seq("a", "b", "DEL")(rnd.nextInt(3))))
      val distinctRows = rows.groupBy(r => (r._1, r._2)).map(_._2.last).toList
      val t = 1L + rnd.nextInt(12)
      val (first, second) = distinctRows.partition(_._2 <= t)

      def resultSet(df: DataFrame) = df.select("k", "v", "__start_at", "__end_at")
        .as[(Int, String, Long, Option[Long])].collect().toSet

      val oneShot = resultSet(ScdMerge.scd2(None, distinctRows.toDF("k", "seq", "v"), o))
      val t0 = if (first.isEmpty) None
        else Some(ScdMerge.scd2(None, first.toDF("k", "seq", "v"), o))
      val incr =
        if (second.isEmpty) t0.map(resultSet).getOrElse(Set.empty)
        else resultSet(ScdMerge.scd2(t0, second.toDF("k", "seq", "v"), o))

      assert(oneShot == incr,
        s"trial $trial: one-shot $oneShot != incremental $incr (feed=$distinctRows wm=$t)")
      oneShot.groupBy(_._1).foreach { case (k, vs) =>
        // with deletes a key may end fully closed, but never >1 open row
        assert(vs.count(_._4.isEmpty) <= 1, s"trial $trial key $k: >1 open row in $vs")
        assert(!vs.exists(_._2 == "DEL"), s"trial $trial key $k: tombstone leaked into $vs")
        val sorted = vs.toList.sortBy(_._3)
        sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
          assert(a._4.exists(_ <= b._3), s"trial $trial key $k: overlap between $a and $b")
        }
      }
    }
  }

  test("replaying an SCD2 table's rows as changes ignores the inherited __end_at") {
    // bootstrap-replay: an existing table's rows (which carry __end_at)
    // fed into a fresh target must rebuild the SAME history the merge
    // produced — __end_at is derived state, not a tracked data column;
    // kept, adjacent identical versions would never collapse
    val merged = ScdMerge.scd2(None,
      changes((1, 1L, "a"), (1, 2L, "a"), (1, 3L, "b")), opts2)
    val replayed = ScdMerge.scd2(None, merged.select(
      $"k", $"v", $"__start_at".as("seq"), $"__end_at"), opts2)
    val want = merged.select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    val got = replayed.select("k", "v", "__start_at", "__end_at")
      .as[(Int, String, Long, Option[Long])].collect().toSet
    assert(got == want, s"replayed $got != merged $want")
  }
}
