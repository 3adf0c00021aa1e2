package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive compute spreading for CPU-heavy row-local projections
  * (guide §2.5 "input skew": one small/unsplittable file caps scan
  * parallelism). A zero-exchange native scan is the right 100 TB plan,
  * but when the source yields FEWER partitions than the session's
  * parallelism (a sub-128MB parquet file is one split), the per-row
  * compute serializes on a fraction of the cores. A deterministic hash
  * repartition on the row key spreads it; at scale the scan already
  * yields >= parallelism splits and the helper no-ops — the decision
  * reads only the planned partition count, never data.
  *
  * Deliberately a hash repartition on a real key (not round-robin):
  * deterministic under task retry (SPARK-38388 caveat does not apply)
  * and skew-free for unique keys.
  */
object Spread {

  /** `df` repartitioned to the session parallelism iff its plan yields
    * fewer partitions — otherwise `df` unchanged (same rows either way). */
  def byKey(df: DataFrame, keyCol: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(keyCol)) else df
  }
}
