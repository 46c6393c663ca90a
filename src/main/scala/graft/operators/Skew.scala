package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join for power-law keys. AQE's skew-join split
  * handles most cases at runtime; explicit salting remains the tool when one
  * key dominates so heavily that even split partitions overwhelm a task, or
  * when AQE is unavailable (streaming foreachBatch plans).
  *
  * Shape: the skewed (large) side gets a random salt in [0, buckets); the
  * small side is exploded `buckets`× so every (key, salt) pair finds its
  * match. Join key becomes (key, salt) — the hot key's rows spread over
  * `buckets` tasks. Cost: small side inflated by `buckets` — choose it
  * proportional to the worst key's dominance, not the table size.
  */
object Skew {

  /** Join types that keep UNMATCHED small-side rows (right/full outer) are
    * refused: the small side was exploded buckets×, so each unmatched row
    * would surface buckets duplicated null-padded outputs. Left-flavored
    * joins are safe — unmatched LARGE rows carry one salt each. */
  private val safeJoinTypes = Set(
    "inner", "cross", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti")

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(safeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: join type '$joinType' would emit every unmatched " +
        s"small-side row $buckets times (one per exploded salt) — use a " +
        "left-flavored join from the large side, or an unsalted join")
    val salted = large.withColumn("__salt", (rand(seed = 42) * buckets).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
