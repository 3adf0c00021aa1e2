package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively: attach to each left row
  * the most recent right row with `right.ts <= left.ts` for the same key
  * (DuckDB `ASOF JOIN` / kdb `aj` semantics, inclusive of equal
  * timestamps).
  *
  * Spark-first plan: tag both sides, `unionByName`, ONE window pass
  * (partition by key, order by ts with right rows sorting before left at
  * equal ts) carrying the right payload forward with
  * `last(_, ignoreNulls)`, then keep left rows. That is a single shuffle
  * on the key and a per-partition sort — the sort-merge as-of a native
  * engine runs, expressed declaratively; the naive alternatives either
  * explode (range join: every left x all earlier rights) or probe per row.
  * Skew note: one hot key serializes its window partition — pre-split hot
  * keys by coarse time bucket (carrying the last value across bucket
  * boundaries) the same way [[PipJoin.shuffleJoin]] salts hot cells.
  */
object AsofJoin {

  /** @param rightPayload right columns to carry (must be null-free on the
    *                     right side and absent from the left schema).
    *                     Unmatched left rows come back with null payload —
    *                     filter them out for inner-asof semantics. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.forall(c => !left.columns.contains(c)),
      "right payload columns must not collide with left columns")
    val l = left.withColumn("_asof_side", lit(1))
    val r = right.select(col(key) +: col(ts) +: rightPayload.map(col): _*)
      .withColumn("_asof_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows order BEFORE left rows at equal ts => inclusive (>=) match;
    // payload is a deterministic tie-break among equal-ts right rows
    val order = col(ts).asc +: col("_asof_side").asc +: rightPayload.map(col(_).asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_asof_side") === 1).drop("_asof_side")
  }
}
