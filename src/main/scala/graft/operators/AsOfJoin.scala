package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest) join — for every left row, the single most
  * recent right row at or before its time (backward; forward = at or after),
  * per key. The operator DLT/Spark lack natively and pandas/kdb users expect
  * (reference analogue: the temporal-join patterns its SCD2 examples emit,
  * e.g. templates emitting `BETWEEN __START_AT AND __END_AT` joins).
  *
  * Spark-first design: NOT a join at all. A range/inequality join would plan
  * as a sort-merge with per-key explosion (every earlier right row pairs
  * with every left row before filtering) or worse a broadcast-nested-loop.
  * Instead both sides UNION into one frame tagged by side, and a single
  * keyed window (`last(payload, ignoreNulls)` over rows unbounded-preceding)
  * carries the latest right payload forward onto each left row:
  *
  *   - exactly ONE shuffle (the window partition on the key),
  *   - no row explosion — the frame is |left| + |right| rows throughout,
  *   - whole-stage-codegen'd window; scales to 100 TB sides as long as a
  *     single key's rows fit a partition (same bound as any keyed window).
  *
  * Skew: for pathological keys (a power-law key whose rows exceed one
  * task), pass `salt = Some(s)` — left rows scatter across `s` buckets by
  * row hash, right rows REPLICATE to every bucket, and the window
  * partitions on (key, bucket). Per-partition rows drop from
  * |left_k| + |right_k| to |left_k|/s + |right_k| — bounding the side that
  * explodes under skew (the fact side) while each bucket keeps the full
  * right history it needs for correctness. Result is row-identical to the
  * unsalted join; cost is right-side duplication, so reserve it for skewed
  * workloads.
  *
  * Ties: a right row AT the left row's exact time matches (inclusive), both
  * directions — the side flag breaks the sort so right rows order first.
  * Null keys: rows with a null key only ever see null-key right rows (SQL
  * equality-join semantics would drop them; callers wanting that filter
  * upstream). Null times follow SQL comparison semantics: a null-time right
  * row matches nothing (dropped before the window — it would otherwise sort
  * first and forward-fill as a phantom match), and a null-time left row
  * keeps null payloads. Left rows with no earlier right row keep null
  * payloads (left join semantics).
  */
object AsOfJoin {

  /** @param on           equi-join key columns (must exist on both sides)
    * @param leftTime     left ordering column (numeric or timestamp)
    * @param rightTime    right ordering column
    * @param payload      right columns to carry onto the left (must not
    *                     collide with left column names)
    * @param forward      false = latest right at-or-before (default);
    *                     true = earliest right at-or-after
    * @param tolerance    max |left time − matched right time| in the time
    *                     column's double-cast units (seconds for timestamps);
    *                     matches farther away return null payloads
    * @param salt         scatter left rows across this many buckets per key
    *                     (right rows replicate to all buckets) to bound
    *                     partition sizes under key skew; None = unsalted */
  def apply(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      forward: Boolean = false, tolerance: Option[Double] = None,
      salt: Option[Int] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one key column")
    require(salt.forall(_ >= 1), "salt bucket count must be >= 1")
    val collisions = payload.filter(p => left.columns.exists(_.equalsIgnoreCase(p)))
    require(collisions.isEmpty,
      s"payload column(s) ${collisions.mkString(", ")} collide with left columns; rename first")
    require(!payload.exists(_.equalsIgnoreCase("__asof_t")),
      "payload name '__asof_t' is reserved by the as-of join; rename first")
    require(salt.isEmpty || !(left.columns ++ payload).exists(_.equalsIgnoreCase("__salt")),
      "column name '__salt' is reserved by the salted as-of join; rename first")
    val reservedHash = (left.columns ++ payload)
      .filter(c => c.equalsIgnoreCase("__ph") || c.equalsIgnoreCase("__lh"))
    require(reservedHash.isEmpty,
      s"column name(s) ${reservedHash.mkString(", ")} are reserved by the as-of join; rename first")

    // matched right time rides inside the payload struct for the tolerance
    // check; left rows are reconstructed from their own struct after the
    // window, so left/right schemas never mix
    val payStruct = struct(
      (TimeCols.tzNorm(right, rightTime).as("__asof_t") +: payload.map(col)): _*)
    val payType = right.select(payStruct.as("__p")).schema("__p").dataType
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val leftType = left.select(leftStruct.as("__l")).schema("__l").dataType

    // hash-based tie-break and salt terms must be HASHABLE: xxhash64
    // refuses MapType anywhere in the type tree (AnalysisException at plan
    // time), and hashing a map's internal iteration order would be
    // partition-layout-dependent even if it didn't. Map-bearing RIGHT
    // payload columns therefore enter the tie-break hash through a
    // CANONICAL form (maps → key-sorted entry arrays, recursively), so the
    // 'arbitrary but STABLE' tie-break claim holds for map payloads too —
    // right rows differing only in map content get distinct __ph and a
    // layout-independent pick. The LEFT salt hash still skips map columns
    // unhashed: __lh only scatters left rows across buckets, every bucket
    // sees the full right history, and the result is provably
    // bucket-assignment-independent — determinism there buys nothing. A
    // left frame with no hashable column at all salt-scatters by its time
    // column.
    def mapFree(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => mapFree(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => mapFree(a.elementType)
      case _ => true
    }
    // canonical hashable image of a possibly-map-bearing value: key-sorted
    // entry arrays for maps (map keys can never contain maps, so entry
    // structs are orderable once their VALUES are canonicalized, and the
    // key — unique within a map — decides the order), rebuilt
    // structs/arrays only where a map hides underneath. One
    // array_sort(map_entries(...)) pass per map — O(n log n); the previous
    // element_at-per-sorted-key form was O(n²) over Spark's array-backed
    // maps. Paid only on map-bearing payload schemas.
    def canon(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case m: org.apache.spark.sql.types.MapType =>
        // canonicalize nested values BEFORE sorting: a map-bearing value
        // type is not orderable, so array_sort must see the rebuilt form
        val entries =
          if (mapFree(m.valueType)) map_entries(c)
          else transform(map_entries(c), e => struct(
            e.getField("key").as("key"),
            canon(e.getField("value"), m.valueType).as("value")))
        array_sort(entries)
      case s: org.apache.spark.sql.types.StructType if !mapFree(s) =>
        // NULL-struct guard: rebuilding a null struct field-by-field would
        // yield a struct of nulls — keep null canonical images null
        when(c.isNull, lit(null)).otherwise(
          struct(s.fields.toSeq.map(f => canon(c.getField(f.name), f.dataType).as(f.name)): _*))
      case a: org.apache.spark.sql.types.ArrayType if !mapFree(a.elementType) =>
        transform(c, e => canon(e, a.elementType))
      case _ => c
    }
    val hashablePayStruct = struct(
      (TimeCols.tzNorm(right, rightTime).as("__asof_t") +:
        payload.map { p =>
          val dt = right.schema(p).dataType
          if (mapFree(dt)) col(p) else canon(col(p), dt)
        }): _*)
    val hashableLeftCols = left.columns.toSeq
      .filter(c => mapFree(left.schema(c).dataType)).map(col)

    // TimeCols.tzNorm on __t: (a) an NTZ side unions cleanly with a
    // TimestampType side (resample's generated grid is TimestampType even
    // when the observations are NTZ), (b) the tolerance double-cast below
    // is legal — NTZ rejects numeric casts
    val lRows0 = left.select(on.map(col) ++ Seq(
      TimeCols.tzNorm(left, leftTime).as("__t"), lit(1).as("__isL"),
      leftStruct.as("__l"), lit(null).cast(payType).as("__p"),
      // left rows never tie-break on the payload hash (__isL separates
      // the sides first) — any constant keeps the union schemas aligned
      lit(0L).as("__ph"),
      (if (hashableLeftCols.nonEmpty) xxhash64(hashableLeftCols: _*)
       else xxhash64(TimeCols.tzNorm(left, leftTime))).as("__lh")): _*)
    val rRows0 = right.filter(col(rightTime).isNotNull).select(on.map(col) ++ Seq(
      TimeCols.tzNorm(right, rightTime).as("__t"), lit(0).as("__isL"),
      lit(null).cast(leftType).as("__l"), payStruct.as("__p"),
      xxhash64(hashablePayStruct).as("__ph"), lit(0L).as("__lh")): _*)
    // skew salting: left rows scatter by row hash, right rows replicate to
    // every bucket — each (key, bucket) window still sees the full right
    // history, so the fill is identical to the unsalted join's
    val (lRows, rRows, saltCols) = salt match {
      case None => (lRows0, rRows0, Nil)
      case Some(s) =>
        (lRows0.withColumn("__salt", pmod(col("__lh"), lit(s.toLong)).cast("int")),
          rRows0.withColumn("__salt",
            explode(sequence(lit(0), lit(s - 1)))),
          Seq(col("__salt")))
    }

    // backward: ascending time, right-before-left at equal times (inclusive)
    // forward: descending time, same tie-break. Among right rows sharing the
    // exact same (key, time), the payload hash breaks the tie — an arbitrary
    // but STABLE pick, so the result does not drift with partition layout
    val ord: Seq[Column] =
      if (forward) Seq(col("__t").desc, col("__isL").asc, col("__ph").asc)
      else Seq(col("__t").asc, col("__isL").asc, col("__ph").asc)
    val w = Window.partitionBy(on.map(col) ++ saltCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lRows.unionByName(rRows)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
    val withinTol = tolerance match {
      case Some(tol) =>
        abs(col("__t").cast("double") - col("__m.__asof_t").cast("double")) <= tol
      case None => lit(true)
    }
    val m = when(col("__t").isNotNull && col("__m").isNotNull && withinTol, col("__m"))
    matched.select(col("__l.*") +: payload.map(p => m.getField(p).as(p)): _*)
  }
}
