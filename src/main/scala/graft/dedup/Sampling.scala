package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset mixing for training-data curation.
  *
  * All sampling here is *hash-based*, not RNG-based: a row's inclusion
  * depends only on its key (`xxhash64(key, salt)`), so samples are
  * reproducible across runs, cluster sizes, and partitionings — the property
  * that matters when a 100 TB corpus is resampled incrementally (a re-run
  * must keep/drop the same documents). No shuffle: sampling is a filter.
  */
object Sampling {

  /** Keep ~`fraction` of rows, decided by key hash (deterministic). */
  def byHash(df: DataFrame, keyCol: String, fraction: Double, salt: Int = 0): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val bucket = pmod(xxhash64(col(keyCol), lit(salt)), lit(1000000L))
    df.filter(bucket < (fraction * 1000000L).toLong)
  }

  /** Per-stratum fractions (`sampleBy` made deterministic): each stratum
    * value samples at its own rate; missing strata default to `default`. */
  def stratified(df: DataFrame, keyCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double = 0.0, salt: Int = 0): DataFrame = {
    val bucket = pmod(xxhash64(col(keyCol), lit(salt)), lit(1000000L))
    val threshold = fractions.foldLeft(lit((default * 1000000L).toLong): Column) {
      case (acc, (value, frac)) =>
        when(col(stratumCol) === value, lit((frac * 1000000L).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Mix N sources at given sampling rates into one corpus, tagging each row
    * with its source — the standard weighted-mixture step of a training-data
    * pipeline. Inputs must be union-compatible on `columns`. */
  def mix(sources: Seq[(String, DataFrame, Double)], keyCol: String,
      columns: Seq[String], salt: Int = 0): DataFrame =
    sources.map { case (name, df, fraction) =>
      byHash(df.select(columns.map(col): _*), keyCol, fraction, salt)
        .withColumn("_source", lit(name))
    }.reduce(_ unionByName _)
}
