package org.apache.spark.sql.graftnative

import org.apache.spark.sql.catalyst.analysis.StreamingJoinHelper
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}

/** Bridge to Spark's OWN stream-stream join state analysis
  * (`StreamingJoinHelper`, `private[sql]` — same package-access seam as
  * [[PlanBridge]]): the engine's MV audit asks the exact question Spark's
  * state cleanup answers at stream start, instead of re-deriving a
  * condition parser that would drift from Spark's.
  *
  * A stream-stream join's state is evictable on a side iff the join
  * condition bounds that side's rows against the OTHER side's event-time
  * watermark (Lee-side range constraints like
  * `b.ts BETWEEN a.ts AND a.ts + INTERVAL 30 MINUTES`), or the join keys
  * include the event-time window itself. Watermarks alone never clean
  * inner-join state — without a constraint the state grows with the
  * corpus, which at 100 TB is the difference between a bounded
  * maintenance job and a checkpoint that swallows the cluster. */
object StreamingJoinProbe {

  /** (left state evictable, right state evictable) under the join's
    * condition — Spark's `getStateValueWatermark` per direction, with the
    * event watermark pinned to an arbitrary probe value (the RESULT value
    * is irrelevant here; existence means the condition derives a state
    * bound). */
  def evictableSides(j: LJoin): (Boolean, Boolean) = {
    val left = StreamingJoinHelper.getStateValueWatermark(
      j.left.outputSet, j.right.outputSet, j.condition, Some(0L)).isDefined
    val right = StreamingJoinHelper.getStateValueWatermark(
      j.right.outputSet, j.left.outputSet, j.condition, Some(0L)).isDefined
    (left, right)
  }

  /** True when the equi-join keys contain the event-time window column —
    * the other state-bounding shape (windowed stream-stream joins). */
  def watermarkInJoinKeys(j: LJoin): Boolean =
    StreamingJoinHelper.isWatermarkInJoinKeys(j)

  /** Per-side state-retention RANGE in milliseconds beyond that side's
    * watermark: Spark's state-value watermark with the event watermark
    * pinned at 0 — the returned value is ≤ 0 and its magnitude is how far
    * behind the other side's watermark this side's rows must be retained
    * under the join condition. None = no bound derivable (the audit
    * refuses that shape before a caller asks). */
  def stateRangeMs(j: LJoin): (Option[Long], Option[Long]) = {
    val left = StreamingJoinHelper.getStateValueWatermark(
      j.left.outputSet, j.right.outputSet, j.condition, Some(0L))
    val right = StreamingJoinHelper.getStateValueWatermark(
      j.right.outputSet, j.left.outputSet, j.condition, Some(0L))
    (left.map(v => math.max(0L, -v)), right.map(v => math.max(0L, -v)))
  }
}
