package graft.exec

import org.apache.spark.sql.DataFrame

/** Scale-adaptive shuffle/state partitioning for runner-owned streaming
  * queries (guide §2: derive partitioning from input size instead of a
  * constant tuned for either local mode or the cluster).
  *
  * WHY: a stateful streaming operator creates one state-store instance per
  * shuffle partition — a stream-stream join keeps FOUR per partition — and
  * every microbatch pays a fixed per-store commit cost (delta file create +
  * fsync + rename against the checkpoint filesystem) regardless of how many
  * rows the store holds. With `spark.sql.shuffle.partitions` sized for the
  * cluster (the right thing for batch work), a stream whose input is small
  * pays partitions × stores × commits of pure fixed I/O: the r18 driver
  * measured the SAME stream gates 2× faster at 8 cores/partitions than at
  * 32 because of exactly this, and per-store commit cost dominates harder
  * the larger the cluster. The fix is the broadcast-join-threshold posture:
  * derive the stream's partition count from its (listed) source bytes, and
  * NEVER exceed the session's configured parallelism — a large input keeps
  * the cluster's setting, a small one stops minting empty state stores.
  *
  * The derived value only applies at the stream's FIRST start: Spark pins
  * `spark.sql.shuffle.partitions` (with the other state-relevant confs) in
  * the checkpoint's offset log and re-applies it on every restart, so a
  * landing directory that grows across runs cannot re-shape existing state.
  *
  * Config (session confs, overridable per pipeline via pipeline_config
  * `configuration`):
  *   - `spark.graft.stream.shufflePartitions`: `auto` (default) = derive;
  *     an integer = use exactly that for runner streams; `off` = leave the
  *     session value untouched.
  *   - `spark.graft.stream.bytesPerPartition` (default 128 MB): target
  *     source bytes per stream partition in auto mode.
  */
object StreamTuning {

  val ModeKey = "spark.graft.stream.shufflePartitions"
  val BytesPerPartitionKey = "spark.graft.stream.bytesPerPartition"
  private val DefaultBytesPerPartition = 128L * 1024 * 1024

  /** Listing guard: past this many files the source is "large" without
    * finishing the walk — the answer (clamp to the session value) is
    * already known, and an unbounded listing would itself become the cost. */
  private val MaxListedFiles = 20000

  /** Sum the on-disk bytes of every file-backed streaming source in the
    * plan. None when the plan has no recognizable file-backed streaming
    * source (kafka, rate, custom providers) or a listing fails — callers
    * must then leave the session configuration alone. */
  def inputBytes(df: DataFrame): Option[Long] = try {
    // the ANALYZED plan — temp-view references (every transform chain in
    // the runner) are unresolved leaves in the raw logical plan
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val sources = leaves.filter(
      _.getClass.getSimpleName.startsWith("StreamingRelation"))
    if (sources.isEmpty) return None
    val paths = sources.flatMap { rel =>
      try {
        // v1 StreamingRelation(dataSource, sourceName, output) — file
        // sources resolve through it; private[sql] at the Scala level, so
        // reflect. Anything unrecognized poisons the estimate to None
        // rather than undercounting.
        val ds = rel.getClass.getMethod("dataSource").invoke(rel)
        val declared = ds.getClass.getMethod("paths").invoke(ds)
          .asInstanceOf[Seq[String]]
        val opt = ds.getClass.getMethod("options").invoke(ds)
          .asInstanceOf[Map[String, String]]
        val all = declared ++ opt.get("path")
        if (all.isEmpty) return None
        all
      } catch { case _: ReflectiveOperationException => return None }
    }
    var total = 0L
    var files = 0
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    paths.distinct.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      if (fs.exists(hp)) {
        val it = fs.listFiles(hp, true)
        while (it.hasNext) {
          val st = it.next()
          val name = st.getPath.getName
          if (!name.startsWith("_") && !name.startsWith(".")) {
            total += st.getLen
            files += 1
            if (files > MaxListedFiles) return Some(Long.MaxValue)
          }
        }
      }
    }
    Some(total)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** True when the stream plan itself carries a stateful operator
    * (aggregation, dedup, stream-stream join, …) — the shapes that mint
    * one state store per shuffle partition per operator. Streams WITHOUT
    * one (passthrough appends, foreachBatch merge engines) are left at
    * the session setting on purpose: they hold no per-partition state to
    * save on, and a foreachBatch body's jobs run against the CLONED
    * session conf, so a value derived from the (small) stream source
    * would silently under-partition a merge that rewrites a large
    * target. */
  private def hasStatefulOp(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val plan = df.queryExecution.analyzed
    plan.isStreaming && plan.exists {
      case a: Aggregate => a.isStreaming
      case d: Deduplicate => d.isStreaming
      case j: Join => j.left.isStreaming && j.right.isStreaming
      case n => n.isStreaming &&
        Set("DeduplicateWithinWatermark", "FlatMapGroupsWithState",
          "TransformWithState").contains(n.getClass.getSimpleName)
    }
  }

  /** The partition count for a runner stream over `df`, or None to leave
    * the session value in place. Auto mode: ceil(bytes / target), clamped
    * to [1, session shuffle partitions] — never ABOVE the configured
    * parallelism, and only for plans that actually carry streaming state. */
  def derivePartitions(df: DataFrame): Option[Int] = {
    val spark = df.sparkSession
    val session = spark.sessionState.conf.numShufflePartitions
    spark.conf.getOption(ModeKey).getOrElse("auto") match {
      case "off" => None
      case "auto" if !hasStatefulOp(df) => None
      case "auto" =>
        inputBytes(df).map { bytes =>
          val per = spark.conf.getOption(BytesPerPartitionKey)
            .map(_.toLong).getOrElse(DefaultBytesPerPartition)
          val derived = math.max(1L, (bytes + per - 1) / per)
          math.min(derived, session.toLong).toInt
        }.filter(_ < session) // only act when it actually shrinks
      case n => scala.util.Try(n.trim.toInt).toOption.filter(_ > 0)
    }
  }

  // stream starts serialize through this lock: the conf set/restore window
  // below is process-global state, and two orchestrator flowgroup threads
  // starting streams concurrently could otherwise restore each other's
  // derived value into place permanently
  private val startLock = new Object

  /** Start a writeStream with the adaptive scope applied: the writer's
    * underlying Dataset drives the derivation. Reflection (the `ds` field
    * of the classic DataStreamWriter) because the API deliberately does
    * not expose it; an unexpected writer shape falls back to a plain
    * unscoped start. */
  def startAdaptive(
      w: org.apache.spark.sql.streaming.DataStreamWriter[_])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val df: Option[DataFrame] = try {
      val f = w.getClass.getDeclaredField("ds")
      f.setAccessible(true)
      Some(f.get(w).asInstanceOf[DataFrame])
    } catch { case scala.util.control.NonFatal(_) => None }
    df match {
      case Some(d) => scoped(d)(w.start())
      case None => w.start()
    }
  }

  /** Run `start` (a writeStream `.start()` chain, by name) with the
    * session's `spark.sql.shuffle.partitions` temporarily set to the
    * derived value — StreamExecution clones the session synchronously
    * inside `start()`, so the clone captures the scoped value and the
    * session's own value is restored before anything else plans against
    * it. No-op when derivation declines. */
  def scoped[T](df: DataFrame)(start: => T): T = {
    val derived = derivePartitions(df)
    // opt-in visibility: one stderr line per stream start naming the
    // decision (debug seam — the A/B harness and operators read it)
    if (df.sparkSession.conf.getOption("spark.graft.stream.debug")
        .contains("true"))
      System.err.println(s"[graft] stream-tuning: stateful=" +
        s"${hasStatefulOp(df)} bytes=${inputBytes(df)} derived=$derived leaves=" +
        df.queryExecution.analyzed.collectLeaves()
          .map(_.getClass.getSimpleName).distinct.mkString(","))
    derived match {
      case None => start
      case Some(n) => startLock.synchronized {
        val spark = df.sparkSession
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, n.toString)
        try start finally {
          prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        }
      }
    }
  }
}
