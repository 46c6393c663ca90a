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

  /** Column type under the session's name-resolution rules. A bare
    * `df.schema(name)` lookup is exact-match only — it would silently
    * narrow callers that resolved names through Spark's (default)
    * case-insensitivity before these helpers existed. Top-level names
    * resolve via a field scan honoring `spark.sql.caseSensitive` (O(width),
    * no analyzer pass); dotted/nested references fall back to analyzing a
    * one-column projection. */
  def dataTypeOf(df: DataFrame, name: String): DataType = {
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    df.schema.fields
      .filter(f =>
        if (caseSensitive) f.name == name else f.name.equalsIgnoreCase(name))
      match {
        case Array(one) => one.dataType
        case _ => df.select(col(name)).schema.head.dataType // nested / ambiguous
      }
  }

  /** `df(name)` with NTZ normalized to TimestampType; other types pass
    * through untouched (numerics keep numeric semantics — no blind
    * timestamp cast that would clip large values to the timestamp range). */
  def tzNorm(df: DataFrame, name: String): Column =
    if (dataTypeOf(df, name) == TimestampNTZType)
      col(name).cast(TimestampType)
    else col(name)

  /** True for either timestamp flavor. */
  def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType
}
