package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Timestamp-flavor helpers shared by the time-aware operators and gate
  * queries.
  *
  * Spark 4 carries TWO timestamp types: `TimestampType` (an instant,
  * session-zone rendered) and `TimestampNTZType` (a wall-clock with no
  * zone — what pandas/pyarrow-written parquet surfaces by default). NTZ
  * rejects the epoch family (`unix_micros` → UNEXPECTED_INPUT_TYPE) and
  * numeric casts (CAST_WITHOUT_SUGGESTION), so any operator doing epoch
  * math on a user-supplied time column must normalize first. Casting
  * NTZ → TimestampType interprets the wall-clock in the session zone —
  * value-preserving under the UTC session every graft entrypoint pins,
  * and the behavior users of zone-less data expect elsewhere too.
  */
object TimeCols {

  /** µs since epoch for EITHER timestamp flavor (identity cast on columns
    * already TimestampType is folded away by Catalyst's SimplifyCasts, so
    * the common case costs nothing). Gate queries use this instead of raw
    * `unix_micros` so they stop assuming loader normalization. */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** `df(name)` with NTZ normalized to TimestampType; other types pass
    * through untouched (numerics keep numeric semantics — no blind
    * timestamp cast that would clip large values to the timestamp range).
    *
    * The type probe resolves through a projection, not `df.schema(name)` —
    * the StructType lookup is exact-match only, which would silently
    * narrow callers (RangeJoin/AsOfJoin resolved time columns through
    * Spark's case-insensitivity before this helper existed). */
  def tzNorm(df: DataFrame, name: String): Column =
    if (df.select(col(name)).schema.head.dataType == TimestampNTZType)
      col(name).cast(TimestampType)
    else col(name)

  /** True for either timestamp flavor. */
  def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
}
