package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order clustering: interleave correctness on known bit patterns, the
  * multi-dimensional locality win over lexicographic range clustering, and
  * the YAML `cluster_strategy: zorder` surface. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("z-value interleaves bucket bits (known 2-col Morton pattern)") {
    // weights put each quantile breakpoint strictly inside a value's rank
    // range, so bucket(v) == v deterministically (breakpoints land at 1,2,3)
    val w = Map(0 -> 1, 1 -> 10, 2 -> 10, 3 -> 10)
    val rows = for {
      x <- 0 to 3; y <- 0 to 3
      _ <- 1 to (w(x) * w(y))
    } yield (x, y)
    val df = rows.toDF("x", "y")
    val got = df.withColumn("z", ZOrder.zvalue(df, Seq("x", "y"), bits = 2))
      .select("x", "y", "z").distinct()
      .as[(Int, Int, Long)].collect().map { case (x, y, zv) => (x, y) -> zv }.toMap
    def morton(x: Int, y: Int): Long =
      ((x & 1) | ((y & 1) << 1) | ((x & 2) << 1) | ((y & 2) << 2)).toLong
    for { x <- 0 to 3; y <- 0 to 3 }
      assert(got((x, y)) == morton(x, y), s"($x,$y)")
  }

  test("z-order bounds every clustered column; range clustering only the first") {
    // uniform 64x64 grid -> 16 partitions. Lexicographic range clustering
    // slices into x-stripes: every partition spans ALL of y (span 63).
    // Z-order partitions cover small rectangles on BOTH axes.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)).toDF("x", "y")
      .repartition(8) // arbitrary starting layout
    def maxSpan(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.groupBy(spark_partition_id()).agg((max(c) - min(c)).as("s"))
        .agg(max("s")).as[Long].head()
    val ranged = grid.repartitionByRange(16, col("x"), col("y"))
    assert(maxSpan(ranged, "y") == 63L, "lexicographic x-stripes span all of y")
    val zClustered = grid
      .withColumn("__z", ZOrder.zvalue(grid, Seq("x", "y"), bits = 6))
      .repartitionByRange(16, col("__z"))
    // a 256-cell Morton segment can straddle adjacent 16x16 blocks, so the
    // bound is loose — but far below the full-span 63 of the stripes
    assert(maxSpan(zClustered, "y") <= 40L, "y must regain locality under z-order")
    assert(maxSpan(zClustered, "x") <= 40L, "x keeps locality under z-order")
  }

  test("cluster round-trips rows unchanged (strings hash-bucket, nulls ok)") {
    val df = Seq((1L, "a", 1.5), (2L, null, -3.0), (3L, "b", 0.0), (4L, "a", 9.9))
      .toDF("id", "s", "v")
    val out = ZOrder.cluster(df, Seq("s", "v"), bits = 4)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.collect().toSet == df.collect().toSet)
  }

  test("z-value on timestamp columns, both flavors (NTZ rejects raw numeric casts)") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq((ts("2024-01-01 00:00:00"), 1), (ts("2024-06-01 00:00:00"), 2),
      (ts("2024-12-01 00:00:00"), 3)).toDF("t", "k")
    val run = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("z", ZOrder.zvalue(d, Seq("t", "k"), bits = 2))
        .select("k", "z").as[(Int, Long)].collect().toMap
    val tz = run(df)
    val ntz = run(df.withColumn("t", $"t".cast("timestamp_ntz")))
    assert(tz == ntz) // same buckets, same interleave — and no analysis error
  }

  test("sampleFraction path and guards") {
    val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("a", "b")
    val out = ZOrder.cluster(df, Seq("a", "b"), bits = 4, sampleFraction = Some(0.5))
    assert(out.count() == 1000)
    intercept[IllegalArgumentException] { ZOrder.zvalue(df, Nil) }
    intercept[IllegalArgumentException] { ZOrder.zvalue(df, Seq("a"), bits = 0) }
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(df, Seq.fill(8)("a"), bits = 8) // 64 bits > long
    }
    intercept[IllegalArgumentException] { // reserved working column
      ZOrder.cluster(df.withColumn("__zorder", col("a")), Seq("a"))
    }
    intercept[IllegalArgumentException] { // …and case-insensitively so
      ZOrder.cluster(df.withColumn("__ZORDER", col("a")), Seq("a"))
    }
  }

  test("cluster_strategy: zorder through the YAML write surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zo").toString
    val store = new graft.exec.TableStore(spark, s"$dir/wh")
    val runner = new graft.exec.PipelineRunner(spark, store, s"$dir/cp")
    (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong, s"r$x-$y"))
      .toDF("x", "y", "payload").createOrReplaceTempView("zo_src")
    runner.run(graft.config.YamlConfig.parseFlowGroup(
      s"""pipeline: p
         |flowgroup: f
         |actions:
         |  - name: w
         |    type: write
         |    sql: SELECT * FROM zo_src
         |    write_target:
         |      type: materialized_view
         |      table: zo_table
         |      cluster_columns: [x, y]
         |      cluster_strategy: zorder
         |""".stripMargin))
    val out = store.read("zo_table")
    assert(out.count() == 1024)
    assert(out.select("x", "y").as[(Long, Long)].collect().toSet ==
      (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)).toSet)
    // an unknown strategy fails loudly at parse
    val e = intercept[graft.config.YamlConfig.ConfigError] {
      graft.config.YamlConfig.parseFlowGroup(
        s"""pipeline: p
           |flowgroup: f
           |actions:
           |  - name: w
           |    type: write
           |    sql: SELECT 1 AS a
           |    write_target: {type: materialized_view, table: t,
           |                   cluster_columns: [a], cluster_strategy: hilbert}
           |""".stripMargin)
    }
    assert(e.getMessage.contains("hilbert"))
    // zorder without columns would silently no-op — reject at parse
    val e2 = intercept[graft.config.YamlConfig.ConfigError] {
      graft.config.YamlConfig.parseFlowGroup(
        s"""pipeline: p
           |flowgroup: f
           |actions:
           |  - name: w
           |    type: write
           |    sql: SELECT 1 AS a
           |    write_target: {type: materialized_view, table: t,
           |                   cluster_strategy: zorder}
           |""".stripMargin)
    }
    assert(e2.getMessage.contains("cluster_columns"))
  }
}
