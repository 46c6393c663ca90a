package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering for the write path — multi-dimensional data
  * skipping. Lexicographic range clustering (`cluster_columns` default)
  * makes file min/max stats tight on the FIRST column only: a 100 TB table
  * clustered on (region, day) answers region filters with file skipping but
  * scans everything for a day-only filter. Interleaving the bits of
  * per-column quantile buckets gives every clustered column locality at
  * once — each output file covers a small hyper-rectangle of the key space
  * (the OSS-Delta OPTIMIZE ZORDER design, rebuilt on DataFrame ops).
  *
  * Shape: one bounded-output quantile pass (optionally on a sample) driver-
  * collects ≤ 2^bits−1 breakpoints per column; bucketing + bit interleave
  * are pure codegen'd column expressions; then ONE range shuffle on the
  * z-value + in-partition sort, identical cost to the existing range
  * clustering. No UDFs, no extra wide shuffles.
  *
  * Column handling: numerics/timestamps/dates cluster on their natural
  * order; other types hash first (equal values co-locate, order locality is
  * meaningless for them anyway). Nulls bucket to 0. Quantile (not
  * equal-width) buckets keep skewed columns balanced.
  */
object ZOrder {

  /** Max interleaved bits per column; `cols.size * bits` must fit a long. */
  val MaxBits = 16

  private def numericize(df: DataFrame, c: String): Column =
    TimeCols.dataTypeOf(df, c) match {
      case _: NumericType => col(c).cast("double")
      // NTZ rejects numeric casts — normalize to TimestampType first
      // (TimeCols), same hardening as RangeJoin/TimeSeries
      case _: TimestampType | _: TimestampNTZType =>
        TimeCols.tzNorm(df, c).cast("double")
      case _: DateType => col(c).cast("timestamp").cast("double")
      case _ => xxhash64(col(c)).cast("double")
    }

  /** Quantile bucket id (0 .. 2^bits−1) of `c` given sorted breakpoints —
    * a codegen'd comparison chain, no element_at indexing, no UDF. */
  private def bucketExpr(c: Column, breaks: Seq[Double]): Column =
    breaks.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(c >= lit(b), 1L).otherwise(0L)
    }

  /** The interleaved z-value as a column expression, given per-column
    * breakpoints (bit i of every column lands before bit i+1 of any). */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val pieces = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Compute breakpoints (one quantile pass, bounded output) and return the
    * z-value expression for `cols`. `sampleFraction` bounds the pass at
    * 100 TB — quantile boundaries only steer clustering, they carry no
    * correctness weight, so a 1% sample is standard. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 6,
      sampleFraction: Option[Double] = None): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bits >= 1 && bits <= MaxBits, s"bits must be in [1, $MaxBits]")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits exceeds a long")
    val nCols = cols.indices.map(i => s"__zn_$i")
    val numeric = cols.zip(nCols).foldLeft(df) { case (d, (c, nc)) =>
      d.withColumn(nc, numericize(df, c))
    }
    val sampled = sampleFraction.map(f => numeric.sample(f, seed = 42)).getOrElse(numeric)
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val breaks = sampled.stat.approxQuantile(nCols.toArray, probes, 0.01)
    val buckets = cols.zip(breaks.toSeq).map { case (c, bs) =>
      val nc = numericize(df, c)
      when(nc.isNull, 0L).otherwise(bucketExpr(nc, bs.toSeq.distinct.sorted))
    }
    interleave(buckets, bits)
  }

  /** Z-cluster a frame for writing: range-shuffle + in-partition sort on
    * the z-value, so each output file covers one small hyper-rectangle.
    * `numPartitions` pins the output file count (compaction); default is
    * the session shuffle parallelism. */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 6,
      sampleFraction: Option[Double] = None,
      numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase("__zorder")),
      "input already has a __zorder column; rename it first")
    val z = df.withColumn("__zorder", zvalue(df, cols, bits, sampleFraction))
    numPartitions.map(n => z.repartitionByRange(n, col("__zorder")))
      .getOrElse(z.repartitionByRange(col("__zorder")))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
  }
}
