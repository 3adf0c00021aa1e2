package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: probe points matched to every interval [lo, hi)
  * containing them — the IP-to-geo / time-window / genomic-overlap join
  * class. Spark's built-in answer to `p.k >= r.lo AND p.k < r.hi` is a
  * broadcast-nested-loop join (every probe tested against every range),
  * which is the textbook 100 TB scale-killer.
  *
  * This operator turns it into an EQUI-join on a bucket key: each interval
  * is exploded to the `bucket = k div B` buckets it overlaps (bounded
  * fan-out: width/B + 1 rows per interval), probes compute their single
  * bucket, the join runs as a plain shuffled/broadcast hash join, and the
  * exact `lo <= k < hi` predicate refines. Pick B on the order of the
  * median interval width: fan-out stays O(1) while each bucket pairs a
  * probe with only the intervals near it. Same candidates-then-refine
  * discipline as [[PipJoin]]/[[DistanceJoin]], one dimension down.
  * RangeJoinSpec asserts the plan is hash-join only (no BNLJ, no
  * cartesian), and the q85 oracle is DuckDB's plain theta join.
  */
object RangeJoin {

  /** Join `probes` (with integer column `keyCol`) to `ranges` (with integer
    * columns `loCol`, `hiCol`; interval [lo, hi)) on containment.
    * Output: all probe columns + all range columns. */
  def containsJoin(probes: DataFrame, keyCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   bucket: Long = 64L): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val b = lit(bucket)
    // empty/inverted intervals (hi <= lo) match nothing under [lo, hi) —
    // drop them BEFORE the explode: sequence() with a descending range
    // (Spark defaults to step -1) would otherwise blow one malformed row
    // up into a huge bucket list that only the refine filter discards
    val expanded = ranges.filter(col(hiCol) > col(loCol)).withColumn("_bkt",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor((col(hiCol) - 1) / b).cast("long"))))
    val keyed = probes.withColumn("_bkt", floor(col(keyCol) / b).cast("long"))
    keyed.join(expanded, "_bkt")
      .filter(col(keyCol) >= col(loCol) && col(keyCol) < col(hiCol))
      .drop("_bkt")
  }
}
