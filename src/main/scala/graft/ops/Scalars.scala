package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lazy scalar attachment: join a ONE-ROW aggregate frame (corpus count,
  * average doc length, ...) onto every row of a big frame as a broadcast
  * EQUI-join — no driver action at plan-build time (unlike `.head()`), no
  * BroadcastNestedLoopJoin (unlike `crossJoin`, the node PlanGuardSpec
  * bans from every query plan).
  *
  * The key pair must survive the optimizer as an equi-condition: a
  * literal key on EITHER side constant-propagates through its project,
  * degenerates the condition to a one-sided filter, and the join replans
  * as the BNLJ this helper exists to avoid. So BOTH sides key on
  * pmod(xxhash64(first column), 1) — always 0, but opaque to constant
  * folding and propagation.
  */
object Scalars {

  private def key(df: DataFrame) = pmod(xxhash64(col(df.columns.head)), lit(1L))

  /** All columns of `scalar` (one row) appended to every row of `df`. */
  def join(df: DataFrame, scalar: DataFrame): DataFrame =
    df.withColumn("_one", key(df))
      .join(broadcast(scalar.withColumn("_one", key(scalar))), "_one")
      .drop("_one")
}
