package graft.exec

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

class TableStoreSpec extends SparkSuite {
  import spark.implicits._

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("ts-wh").toString + "/wh")

  /** (relative path, size, mtime, first bytes) fingerprint of every data file. */
  private def fingerprint(root: Path): Map[String, (Long, Long, Long)] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map { p =>
        root.relativize(p).toString ->
          ((Files.size(p), Files.getLastModifiedTime(p).toMillis,
            java.util.Arrays.hashCode(Files.readAllBytes(p)).toLong))
      }.toMap

  test("partition layout survives upsert (non-key path) and insertIfAbsent") {
    val store = freshStore()
    store.overwrite("pt", Seq((1, 10L, "a"), (2, 20L, "b")).toDF("dt", "id", "v"),
      partitionBy = Seq("dt"))
    // upsert keyed on id (dt NOT a key): pre-fix the rewrite landed FLAT,
    // silently losing the dt=... layout (and partition pruning) forever
    store.upsert("pt", Seq((1, 10L, "A"), (3, 30L, "c")).toDF("dt", "id", "v"),
      keys = Seq("id"))
    assert(store.partitionColumnsOf("pt") == Seq("dt"))
    assert(new java.io.File(store.path("pt")).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("dt=")))
    // insertIfAbsent: pre-fix the append landed part-files at the table
    // ROOT beside dt=... dirs — the next read failed on conflicting
    // directory structures
    store.insertIfAbsent("pt", Seq((4, 40L, "d"), (3, 30L, "dupe")).toDF("dt", "id", "v"),
      keys = Seq("id"))
    assert(store.read("pt").select("id", "v").as[(Long, String)].collect().toSet ==
      Set((10L, "A"), (20L, "b"), (30L, "c"), (40L, "d")))
    assert(store.partitionColumnsOf("pt") == Seq("dt"))
  }

  test("registerAll registers NESTED (qualified) tables under their leaf name") {
    val store = freshStore()
    store.overwrite("analytics.events", Seq((1, "a")).toDF("k", "v"))
    store.overwrite("flat", Seq((2, "b")).toDF("k", "v"))
    // pre-fix, registerAll read the 'analytics' SCHEMA directory as if it
    // were itself a parquet table and failed on schema inference
    store.registerAll()
    assert(spark.table("events").count() == 1)
    assert(spark.table("flat").count() == 1)
  }

  test("registerAll refuses to shadow an AMBIGUOUS leaf name") {
    val store = freshStore()
    store.overwrite("dev.events", Seq((1, "dev")).toDF("k", "env"))
    store.overwrite("prod.events", Seq((2, "prod")).toDF("k", "env"))
    store.overwrite("solo.metrics", Seq((3, "m")).toDF("k", "env"))
    spark.catalog.dropTempView("events") // isolate from sibling tests
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.Log.withSink(warnings += _) { store.registerAll() }
    // pre-fix: last-wins — a bare-leaf consumer silently read whichever
    // qualified table registerAll walked second
    assert(!spark.catalog.tableExists("events"))
    assert(warnings.exists(w => w.contains("ambiguous") &&
      w.contains("dev.events") && w.contains("prod.events")))
    // unambiguous leaves still register
    assert(spark.table("metrics").count() == 1)
  }

  test("replace stages then swaps: self-referencing plan, no localCheckpoint") {
    val store = freshStore()
    store.overwrite("t", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    // the replacement plan reads the table being replaced
    store.replace("t", store.read("t").filter("k <> 2"))
    assert(store.read("t").select("k").as[Int].collect().toSet == Set(1, 3))
    // no staging residue
    val staging = new java.io.File(s"${store.warehouse}/.staging")
    assert(!staging.exists() || staging.listFiles().isEmpty)
  }

  test("partition-scoped upsert leaves untouched partition files byte-identical") {
    val store = freshStore()
    store.overwrite("pt", Seq((1, 1L, "a"), (1, 2L, "a2"), (2, 1L, "b"), (3, 1L, "c"))
      .toDF("k", "seq", "v"), partitionBy = Seq("k"))
    assert(store.partitionColumnsOf("pt") == Seq("k"))

    val before = fingerprint(java.nio.file.Paths.get(store.path("pt")))
    Thread.sleep(5) // make mtime changes observable
    store.upsert("pt", Seq((2, 9L, "B"), (4, 1L, "d")).toDF("k", "seq", "v"), Seq("k", "seq"))

    val after = fingerprint(java.nio.file.Paths.get(store.path("pt")))
    val untouchedBefore = before.filter { case (p, _) => p.startsWith("k=1/") || p.startsWith("k=3/") }
    val untouchedAfter = after.filter { case (p, _) => p.startsWith("k=1/") || p.startsWith("k=3/") }
    assert(untouchedBefore == untouchedAfter) // same files, sizes, mtimes, bytes
    assert(before.keys.exists(_.startsWith("k=2/")) &&
      before.filter(_._1.startsWith("k=2/")) != after.filter(_._1.startsWith("k=2/")))

    val out = store.read("pt").select("k", "seq", "v").as[(Int, Long, String)].collect().toSet
    assert(out == Set((1, 1L, "a"), (1, 2L, "a2"), (2, 1L, "b"), (2, 9L, "B"),
      (3, 1L, "c"), (4, 1L, "d")))
  }

  test("replacePartitions drops a partition whose rows were all deleted") {
    val store = freshStore()
    store.overwrite("dp", Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), Seq("k"))
    // new contents for partitions {2, 3}: k=2 keeps a row, k=3 is emptied
    val affected = store.affectedValues(Seq((2, ""), (3, "")).toDF("k", "v"), Seq("k"))
    store.replacePartitions("dp", Seq((2, "B")).toDF("k", "v"), Seq("k"), affected)
    assert(store.read("dp").select("k", "v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B")))
    assert(!new java.io.File(s"${store.path("dp")}/k=3").exists())
  }

  test("partition-scoped replace matches date-typed partition directories") {
    val store = freshStore()
    val d1 = java.sql.Date.valueOf("2026-08-01")
    val d2 = java.sql.Date.valueOf("2026-08-02")
    store.overwrite("dt", Seq((d1, "a"), (d2, "b")).toDF("d", "v"), Seq("d"))
    val affected = store.affectedValues(Seq((d2, "")).toDF("d", "v"), Seq("d"))
    store.replacePartitions("dt", Seq((d2, "B")).toDF("d", "v"), Seq("d"), affected)
    assert(store.read("dt").select("v").as[String].collect().toSet == Set("a", "B"))
    // exactly one d=2026-08-02 dir remains (the old one was matched+deleted)
    val dirs = new java.io.File(store.path("dt")).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq == Seq("d=2026-08-01", "d=2026-08-02"))
  }

  test("upsert on an unpartitioned table still anti-join-rewrites") {
    val store = freshStore()
    store.overwrite("u", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    store.upsert("u", Seq((2, "B"), (3, "c")).toDF("k", "v"), Seq("k"))
    assert(store.read("u").select("k", "v").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "B"), (3, "c")))
  }

  test("partition predicate matches null partitions and prunes to affected only") {
    val store = freshStore()
    store.overwrite("np", Seq((Some(1), "a"), (None, "n"), (Some(2), "b"))
      .toDF("k", "v"), Seq("k"))
    val affected = store.affectedValues(Seq((None: Option[Int], "x")).toDF("k", "v"), Seq("k"))
    val pred = TableStore.partitionPredicate(Seq("k"), affected)
    assert(store.read("np").filter(pred).select("v").as[String].collect().toSeq == Seq("n"))
    // replace the null partition only
    store.replacePartitions("np", Seq((None: Option[Int], "N")).toDF("k", "v"), Seq("k"), affected)
    assert(store.read("np").select("v").as[String].collect().toSet == Set("a", "N", "b"))
  }

  test("append: widening adds columns (old rows null); narrowing fails loudly") {
    val store = freshStore()
    store.overwrite("ap", Seq((1, "a")).toDF("k", "v"))
    store.append("ap", Seq((2, "b")).toDF("k", "v")) // matching schema ok
    // widening append: new column appears, pre-existing rows read as null
    store.append("ap", Seq((3, "c", "extra")).toDF("k", "v", "w"))
    val widened = store.read("ap")
    assert(widened.columns.toSet == Set("k", "v", "w"))
    assert(widened.filter("k = 3 AND w = 'extra'").count() == 1)
    assert(widened.filter("k IN (1, 2) AND w IS NULL").count() == 2)
    // narrowing (dropping a column) still fails loudly
    val e = intercept[IllegalArgumentException](
      store.append("ap", Seq((4, "d")).toDF("k", "v")))
    assert(e.getMessage.contains("mismatched columns"))
    assert(store.read("ap").count() == 3)
    // a same-named column changing TYPE fails loudly (would otherwise make
    // old files unreadable through the overwritten sidecar schema)
    val t = intercept[IllegalArgumentException](
      store.append("ap", Seq((5L, 1.0, "x")).toDF("k", "v", "w")))
    assert(t.getMessage.contains("changes type"))
  }

  test("property: random widening-append sequences equal unionByName reference") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val store = freshStore()
      val allCols = Seq("a", "b", "c", "d")
      var live = 2 // columns present so far (grows only)
      var expected: Option[org.apache.spark.sql.DataFrame] = None
      var id = 0
      for (_ <- 1 to 6) {
        live = math.min(allCols.size, live + (if (rnd.nextBoolean()) 1 else 0))
        val cols = allCols.take(live)
        val rows = (1 to (1 + rnd.nextInt(4))).map { _ =>
          id += 1
          org.apache.spark.sql.Row.fromSeq(id.toLong +: cols.tail.map(c => s"$c$id"))
        }
        val schema = org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("a",
            org.apache.spark.sql.types.LongType) +:
          cols.tail.map(c => org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.StringType)))
        val batch = spark.createDataFrame(
          spark.sparkContext.parallelize(rows), schema)
        store.append(s"w$trial", batch)
        expected = Some(expected
          .map(_.unionByName(batch, allowMissingColumns = true)).getOrElse(batch))
      }
      val got = store.read(s"w$trial")
      val exp = expected.get
      assert(got.columns.sorted.toSeq == exp.columns.sorted.toSeq)
      val key = got.columns.sorted.toSeq
      assert(got.select(key.head, key.tail: _*).collect().map(_.toString).sorted.toSeq
        == exp.select(key.head, key.tail: _*).collect().map(_.toString).sorted.toSeq)
    }
  }

  test("compact rewrites many small files into few, preserving contents") {
    val store = freshStore()
    (1 to 8).foreach(i => store.append("frag",
      Seq((i, s"v$i")).toDF("k", "v").repartition(2)))
    def dataFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(store.path("frag")))
      .iterator().asScala
      .count(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") && !p.getFileName.toString.startsWith("."))
    val before = store.read("frag").as[(Int, String)].collect().toSet
    assert(dataFiles >= 8)
    store.compact("frag")
    assert(dataFiles <= 2)
    assert(store.read("frag").as[(Int, String)].collect().toSet == before)
  }

  test("concurrent fan-in: N flows append batches to ONE table in parallel, exactly once") {
    // same-generation flowgroups run in PARALLEL (the orchestrator's
    // contract), so N flows landing in one table share partition
    // directories concurrently. The store serializes per-table mutations
    // (staging writes stay parallel); this drives the race hard and pins
    // exact content: any lost file, double-land, or committer clash
    // under-/over-counts.
    val store = freshStore()
    val flows = 4
    val batches = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(flows)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val tasks = (0 until flows).map { f =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            (0 until batches).foreach { b =>
              // every flow writes rows into the SAME partition values (p 0/1)
              val rows = (0 until 10).map(i => (i % 2, f.toLong, b.toLong, i.toLong))
              store.appendBatch("fan", rows.toDF("p", "flow", "batch", "i"),
                flowId = s"pipe/fg$f/w", batchId = b, partitionBy = Seq("p"))
              // replay of an already-landed batch must replace, not duplicate
              if (b == 1) store.appendBatch("fan",
                rows.toDF("p", "flow", "batch", "i"),
                flowId = s"pipe/fg$f/w", batchId = b, partitionBy = Seq("p"))
            }
          } catch { case t: Throwable => failures.add(t): Unit }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(failures.isEmpty, s"concurrent appendBatch threw: ${failures.asScala.map(_.toString)}")
    val got = store.read("fan").select("p", "flow", "batch", "i")
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length == flows * batches * 10, s"expected exactly-once rows, got ${got.length}")
    assert(got.toSet.size == got.length, "duplicate rows landed")
    // every (flow, batch) slice is complete
    val perFlowBatch = got.groupBy(r => (r._2, r._3)).view.mapValues(_.length).toMap
    assert(perFlowBatch.values.forall(_ == 10), perFlowBatch.toString)
  }

  test("concurrent plain appends to one table do not clash on the committer dir") {
    // direct appends share Spark's _temporary staging per output path —
    // unserialized, the first job's commit wipes the second's in-flight
    // files (the EventLog r9 incident, now pinned store-wide)
    val store = freshStore()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      (0 until 4).map { f =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            (0 until 3).foreach { b =>
              store.append("plainfan", Seq((f.toLong, b.toLong)).toDF("flow", "batch"))
            }
          } catch { case t: Throwable => failures.add(t): Unit }
        })
      }.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    assert(failures.isEmpty, s"concurrent append threw: ${failures.asScala.map(_.toString)}")
    assert(store.read("plainfan").count() == 12)
  }

  test("registerAll skips staging and dot directories") {
    val store = freshStore()
    store.overwrite("vis", Seq(1).toDF("x"))
    Files.createDirectories(java.nio.file.Paths.get(s"${store.warehouse}/.staging/junk"))
    store.registerAll() // must not throw on the empty .staging dir
    assert(spark.table("vis").count() == 1)
  }

  test("isTableNow and writerLockHeld: the leaf-index survivor predicates") {
    val store = freshStore()
    store.overwrite("x.events", Seq((1, "a")).toDF("k", "v"))
    assert(store.isTableNow("x.events"))
    // drop leaves the lock FILE behind by design — neither a bare
    // directory nor a lingering lock file may read as "table exists"
    store.drop("x.events")
    assert(!store.isTableNow("x.events"))
    assert(!store.writerLockHeld("x.events"))
    // a nested table re-creates the parent DIRECTORY: still not a table
    store.overwrite("x.events.y", Seq((2, "b")).toDF("k", "v"))
    assert(new java.io.File(store.path("x.events")).exists())
    assert(!store.isTableNow("x.events"))
    // held lock is visible to the probe (same-JVM registry path)
    store.withTableLock("x.events") {
      assert(store.writerLockHeld("x.events"))
    }
    assert(!store.writerLockHeld("x.events"))
  }
}
