package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** As-of and bucketed range join: equivalence against brute-force
  * references on randomized data (fixed seed), direction/tolerance/tie
  * semantics, and the loud collision guards. Plan-shape guards (no join in
  * as-of, no nested-loop in range) live in PlanShapeSpec. */
class JoinOpsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  // keys with heavy collision so windows/joins have real per-key depth
  private val leftRows = (1 to 300).map(i =>
    (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
  private val rightRows = (1 to 200).map(i =>
    (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, s"p$i"))
  private def leftDf = leftRows.toDF("l_id", "k", "t")
  private def rightDf = rightRows.toDF("r_id", "k", "rt", "pay")

  test("backward as-of matches the brute-force reference") {
    val out = AsOfJoin(leftDf, rightDf, on = Seq("k"), leftTime = "t",
      rightTime = "rt", payload = Seq("r_id", "pay"))
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
    val expected = leftRows.map { case (lid, k, t) =>
      val m = rightRows.filter(r => r._2 == k && r._3 <= t)
      lid -> m.sortBy(r => (r._3, r._1)).lastOption.map(_._1)
    }.toMap
    // ties on (k, rt) between right rows are tie-broken arbitrarily in both
    // the operator and the reference; compare on the matched TIME instead
    val timeOf = rightRows.map(r => r._1 -> r._3).toMap
    assert(out.keySet == expected.keySet)
    out.foreach { case (lid, got) =>
      assert(got.map(timeOf) == expected(lid).map(timeOf),
        s"l_id=$lid got=$got expected=${expected(lid)}")
    }
  }

  test("forward as-of picks the earliest right at-or-after") {
    val out = AsOfJoin(leftDf, rightDf, on = Seq("k"), leftTime = "t",
      rightTime = "rt", payload = Seq("r_id"), forward = true)
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap
    val timeOf = rightRows.map(r => r._1 -> r._3).toMap
    leftRows.foreach { case (lid, k, t) =>
      val expected = rightRows.filter(r => r._2 == k && r._3 >= t)
        .map(_._3).minOption
      assert(out(lid).map(timeOf) == expected, s"l_id=$lid")
    }
  }

  test("as-of tie at the exact timestamp is inclusive; no match leaves nulls") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 50L), (3L, 2L, 100L)).toDF("l_id", "k", "t")
    val r = Seq((10L, 1L, 100L, "at"), (11L, 3L, 10L, "other")).toDF("r_id", "k", "rt", "pay")
    val out = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("r_id", "pay"))
      .select("l_id", "r_id", "pay").as[(Long, Option[Long], Option[String])]
      .collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(out(1L) == ((Some(10L), Some("at")))) // equal time matches
    assert(out(2L) == ((None, None)))            // nothing at-or-before
    assert(out(3L) == ((None, None)))            // key never on right
  }

  test("as-of tolerance nulls far matches but keeps the left row") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 500L)).toDF("l_id", "k", "t")
    val r = Seq((10L, 1L, 90L, "near")).toDF("r_id", "k", "rt", "pay")
    val out = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("pay"), tolerance = Some(50.0))
      .select("l_id", "pay").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("near"), 2L -> None))
  }

  test("as-of rejects payload columns colliding with the left side") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(leftDf, rightDf.withColumnRenamed("pay", "l_id"),
        Seq("k"), "t", "rt", Seq("l_id"))
    }
    assert(e.getMessage.contains("l_id"))
    intercept[IllegalArgumentException] { // reserved internal name
      AsOfJoin(leftDf, rightDf.withColumnRenamed("pay", "__asof_t"),
        Seq("k"), "t", "rt", Seq("__asof_t"))
    }
  }

  test("salted as-of equals unsalted on skewed keys, with bounded buckets") {
    // one pathological key: 10^6 left rows, 500 right rows, all on k=7 —
    // the shape where an unsalted keyed window lands one partition on one
    // task at 100 TB. The test pins (a) result identity with the unsalted
    // join and (b) that the left side actually scatters across buckets.
    val n = 1000000
    val hotLeft = spark.range(n).selectExpr(
      "id AS l_id", "CAST(7 AS BIGINT) AS k", "id % 100000 AS t")
    val hotRight = spark.range(500).selectExpr(
      "1000000 + id AS r_id", "CAST(7 AS BIGINT) AS k", "id * 200 AS rt",
      "concat('p', id) AS pay")
    val salted = AsOfJoin(hotLeft, hotRight, Seq("k"), "t", "rt",
      Seq("r_id", "pay"), salt = Some(32))
    val unsalted = AsOfJoin(hotLeft, hotRight, Seq("k"), "t", "rt",
      Seq("r_id", "pay"))
    // every left time t matches right row floor(t/200): closed-form check
    // on the salted result plus full frame-equality with the unsalted one
    assert(salted.filter(expr("r_id != 1000000 + CAST(t / 200 AS BIGINT)")).count() == 0)
    assert(salted.count() == n.toLong)
    assert(salted.exceptAll(unsalted).isEmpty && unsalted.exceptAll(salted).isEmpty)
    // bucket occupancy: the same hash the operator uses must spread rows so
    // no bucket exceeds ~2x the even share (xxhash64 over distinct rows)
    val occupancy = hotLeft
      .select(pmod(xxhash64(struct(hotLeft.columns.map(col).toSeq: _*)), lit(32L)).as("b"))
      .groupBy("b").count().select(max("count")).first().getLong(0)
    assert(occupancy < 2L * n / 32, s"max bucket $occupancy")
  }

  test("bucketed range join matches the brute-force inequality join") {
    val intervals = rightRows.map { case (rid, k, t, _) => (rid, k, t, t + 73) }
      .toDF("r_id", "k", "start", "end")
    val expected = for {
      (lid, k, t) <- leftRows
      (rid, rk, s, _) <- rightRows if rk == k && t >= s && t <= s + 73
    } yield (lid, rid)
    // sweep widths smaller, comparable, and larger than the interval length
    for (width <- Seq(10.0, 73.0, 500.0)) {
      val got = RangeJoin(leftDf, intervals, "t", "start", "end", width, Seq("k"))
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == expected.sorted.toSeq, s"width=$width")
      assert(got.size == got.distinct.size, s"duplicate pairs at width=$width")
    }
  }

  test("range join: inclusive bounds, reversed intervals empty, keyless mode") {
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("p_id", "t")
    val iv = Seq((100L, 10L, 20L), (101L, 30L, 25L)).toDF("i_id", "start", "end")
    val got = RangeJoin(pts, iv, "t", "start", "end", 5.0)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    // both endpoints match; the reversed interval (30 > 25) matches nothing
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("interval overlap join matches the brute-force inequality join exactly once per pair") {
    // randomized intervals spanning several buckets, with heavy key
    // collision — the canonical-bucket trick must yield each overlapping
    // pair EXACTLY once (the naive both-sides explode yields one match per
    // shared bucket)
    val left = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toDouble
      (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.nextInt(300))
    }.toDF("lid", "k", "ls", "le")
    val right = (0 until 120).map { i =>
      val s = rnd.nextInt(1000).toDouble
      (i.toLong, rnd.nextInt(5).toLong, s, s + rnd.nextInt(300))
    }.toDF("rid", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re",
      bucketWidth = 50.0, on = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.sorted == brute.sorted) // Seq compare: duplicates would differ
    // keyless mode + reversed/degenerate intervals contribute nothing
    val degL = Seq((1L, 10.0, 5.0)).toDF("lid", "ls", "le") // reversed
    val anyR = Seq((1L, 0.0, 100.0)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(degL, anyR, "ls", "le", "rs", "re", 50.0).isEmpty)
    // touching endpoints are inclusive
    val touchL = Seq((1L, 0.0, 10.0)).toDF("lid", "ls", "le")
    val touchR = Seq((2L, 10.0, 20.0)).toDF("rid", "rs", "re")
    assert(RangeJoin.intervalOverlap(touchL, touchR, "ls", "le", "rs", "re", 50.0)
      .count() == 1)
  }

  test("NaN times and bounds never match (defined no-match semantics, both join forms)") {
    val nan = Double.NaN
    val pts = Seq((1L, 5.0), (2L, nan)).toDF("pid", "t")
    val ivs = Seq((10L, 0.0, 10.0), (11L, 3.0, nan)).toDF("iid", "s", "e")
    // point join: only the clean (point, interval) pair survives — a bare
    // BETWEEN would ALSO match (5.0, [3, NaN]) and (NaN, [3, NaN]) through
    // Spark's NaN-sorts-greatest total order
    val got = RangeJoin(pts, ivs, "t", "s", "e", bucketWidth = 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
    // interval join: NaN-bounded intervals contribute nothing either
    val l = Seq((1L, 0.0, 10.0), (2L, 5.0, nan)).toDF("lid", "ls", "le")
    val r = Seq((20L, 8.0, 12.0)).toDF("rid", "rs", "re")
    val ov = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 5.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(ov == Set((1L, 20L)))
  }

  test("range join rejects colliding non-key columns") {
    val iv = Seq((1L, 1L, 2L)).toDF("t", "start", "end") // `t` collides
    val e = intercept[IllegalArgumentException] {
      RangeJoin(leftDf, iv, "t", "start", "end", 5.0)
    }
    assert(e.getMessage.contains("t"))
    intercept[IllegalArgumentException] { // reserved working column
      RangeJoin(leftDf.withColumnRenamed("l_id", "__bucket"),
        Seq((1L, 1L, 2L)).toDF("i_id", "start", "end"), "t", "start", "end", 5.0)
    }
  }

  test("right-side ties at the exact same (key, time) resolve stably") {
    val l = Seq((1L, 1L, 100L)).toDF("l_id", "k", "t")
    val r = Seq((10L, 1L, 50L, "a"), (11L, 1L, 50L, "b")).toDF("r_id", "k", "rt", "pay")
    def pick(right: org.apache.spark.sql.DataFrame): Long =
      AsOfJoin(l, right, Seq("k"), "t", "rt", Seq("r_id"))
        .select("r_id").as[Long].head()
    // same answer regardless of input partition layout or row order
    val first = pick(r)
    assert(pick(r.repartition(7)) == first)
    assert(pick(r.orderBy(col("r_id").desc).repartition(3)) == first)
  }

  test("null times: right nulls are never phantom matches; left nulls get null payloads") {
    val l = Seq((1L, 1L, Some(100L)), (2L, 1L, None: Option[Long])).toDF("l_id", "k", "t")
    val r = Seq((10L, 1L, None: Option[Long], "ghost"), (11L, 1L, Some(50L), "real"))
      .toDF("r_id", "k", "rt", "pay")
    val out = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("pay"))
      .select("l_id", "pay").as[(Long, Option[String])].collect().toMap
    // the null-rt row would sort first and forward-fill without the guard
    assert(out == Map(1L -> Some("real"), 2L -> None))
    // forward direction: the null-t left row must not see the "last" payload
    val fwd = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("pay"), forward = true)
      .select("l_id", "pay").as[(Long, Option[String])].collect().toMap
    assert(fwd(2L) == None)
  }

  test("as-of on timestamps: matched time survives the round trip") {
    val l = Seq((1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("l_id", "k", "t")
    val r = Seq((10L, 1L, java.sql.Timestamp.valueOf("2024-01-01 09:30:00")))
      .toDF("r_id", "k", "rt")
    val out = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("r_id"),
      tolerance = Some(3600.0)) // 30 min gap < 1 h tolerance, in seconds
    assert(out.select("r_id").as[Option[Long]].head() == Some(10L))
    val strict = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("r_id"),
      tolerance = Some(60.0))
    assert(strict.select("r_id").as[Option[Long]].head() == None)
  }

  test("NTZ time columns: range join and as-of normalize instead of failing") {
    // NTZ rejects numeric casts, so the bucket math and the tolerance check
    // must run on an internally-normalized view; results match TimestampType
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val pts = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 12:00:00")))
      .toDF("p_id", "t")
    val iv = Seq((100L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("i_id", "start", "end")
    val asNtz = (df: org.apache.spark.sql.DataFrame, cols: Seq[String]) =>
      cols.foldLeft(df)((d, c) => d.withColumn(c, d(c).cast("timestamp_ntz")))

    val rj = (p: org.apache.spark.sql.DataFrame, i: org.apache.spark.sql.DataFrame) =>
      RangeJoin(p, i, "t", "start", "end", 3600.0)
        .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(rj(asNtz(pts, Seq("t")), asNtz(iv, Seq("start", "end"))) == rj(pts, iv))
    // the NTZ type probe must not narrow column resolution: time names
    // keep resolving case-insensitively, as plain col() did before it
    assert(RangeJoin(asNtz(pts, Seq("t")), iv, "T", "START", "end", 3600.0)
      .count() == 1)

    // mixed flavors: NTZ left vs TimestampType right unions cleanly, and the
    // tolerance double-cast is legal
    val l2 = asNtz(pts, Seq("t")).withColumn("k", org.apache.spark.sql.functions.lit(1L))
    val r2 = iv.select($"i_id", $"start".as("rt")).withColumn("k",
      org.apache.spark.sql.functions.lit(1L))
    val out = AsOfJoin(l2, r2, Seq("k"), "t", "rt", Seq("i_id"),
      tolerance = Some(7200.0))
      .select("p_id", "i_id").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> None)) // 12:00 is 3 h after 09:00
  }

  test("inferBucketWidth: length quantile in bucket units, loud on degenerate input") {
    // 100 intervals of length 10 and 10 of length 1000: p90 lands on the
    // common length, not the skewed tail a max() would pick
    val iv = ((0 until 100).map(i => (i.toLong, i * 5L, i * 5L + 10L)) ++
      (0 until 10).map(i => (100L + i, i * 7L, i * 7L + 1000L)))
      .toDF("i_id", "start", "end")
    val w = RangeJoin.inferBucketWidth(iv, "start", "end")
    assert(w >= 10.0 && w < 1000.0, s"p90 width $w")
    // timestamps infer in epoch-SECOND units (the same double cast the
    // join buckets in): a 2-hour interval → 7200
    val tiv = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))).toDF("i_id", "start", "end")
    assert(RangeJoin.inferBucketWidth(tiv, "start", "end", quantile = 1.0) == 7200.0)
    // degenerate: no valid intervals, or all-zero lengths → loud
    val rev = Seq((1L, 10L, 5L)).toDF("i_id", "start", "end")
    intercept[IllegalArgumentException] {
      RangeJoin.inferBucketWidth(rev, "start", "end")
    }
    val pts = Seq((1L, 5L, 5L)).toDF("i_id", "start", "end")
    intercept[IllegalArgumentException] {
      RangeJoin.inferBucketWidth(pts, "start", "end")
    }
  }

  test("as-of join accepts map-typed payload and left columns (canonicalized into the tie-break)") {
    import org.apache.spark.sql.functions._
    // xxhash64 refuses MapType — map payload columns enter the tie-break
    // hash through a canonical (key-sorted entries) image instead of
    // failing analysis for every map-carrying frame
    val l = Seq((1, 10L), (1, 20L)).toDF("k", "t")
      .withColumn("attrs", map(lit("side"), lit("left")))
    val r = Seq((1, 5L, "r1"), (1, 15L, "r2")).toDF("k", "rt", "r_id")
      .withColumn("props", map(lit("side"), lit("right")))
    val out = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("r_id", "props"))
      .select("k", "t", "r_id").as[(Int, Long, String)].collect().toSet
    assert(out == Set((1, 10L, "r1"), (1, 20L, "r2")), out.toString)
    // salted path over an all-map-payload frame still analyzes and matches
    val salted = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("props"),
      salt = Some(4))
    assert(salted.count() == 2)
  }

  test("ties differing ONLY in map payload resolve stably (canonical map hash)") {
    import org.apache.spark.sql.functions._
    // two right rows identical in every hashable field, distinguished only
    // by map content — the r15 gap: both shared __ph=constant, so the pick
    // was partition-layout-dependent. Canonicalization gives them distinct
    // hashes; the pick must now survive any layout. Nested map (inside a
    // struct AND with insertion-order-scrambled keys) exercises the
    // recursive canon path: same logical map built in two insertion orders
    // must hash IDENTICALLY (order-insensitive), different content must
    // hash apart (pick stability).
    val l = Seq((1L, 100L)).toDF("k", "t")
    def rightDf(scramble: Boolean) = {
      val m1 = if (scramble) map(lit("b"), lit(2), lit("a"), lit(1))
               else map(lit("a"), lit(1), lit("b"), lit(2))
      Seq((1L, 50L, "x"), (1L, 50L, "y")).toDF("k", "rt", "tag")
        .withColumn("props",
          when(col("tag") === "x", m1).otherwise(map(lit("a"), lit(9))))
        .withColumn("nested", struct(col("props").as("inner")))
        .drop("tag")
    }
    def pick(right: org.apache.spark.sql.DataFrame): String =
      AsOfJoin(l, right, Seq("k"), "t", "rt", Seq("props", "nested"))
        .select(col("props")("a").cast("string")).as[String].head()
    val first = pick(rightDf(scramble = false))
    // layout-independence: repartition/reorder cannot change the winner
    assert(pick(rightDf(scramble = false).repartition(7)) == first)
    assert(pick(rightDf(scramble = false)
      .orderBy(col("rt").desc, col("props")("a").desc).repartition(3)) == first)
    // insertion-order-insensitivity: scrambling key order inside the SAME
    // logical map must not flip the pick either
    assert(pick(rightDf(scramble = true)) == first)
  }
}
