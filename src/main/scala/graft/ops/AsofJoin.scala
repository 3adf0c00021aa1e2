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
  * Skew note: one hot key serializes its window partition in [[asof]] —
  * [[asofBucketed]] pre-splits every key by coarse time bucket and carries
  * the last right row across bucket boundaries, so a hot key spreads over
  * `nBuckets` window partitions (the as-of analog of
  * [[PipJoin.shuffleJoin]]'s hot-cell salting).
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

  /** Skew-safe as-of: identical output contract to [[asof]], but the window
    * partitions on (key, coarse-time-bucket) instead of key alone, so one
    * hot key (one user producing a large fraction of all events — the
    * round-2 `weak` finding) parallelizes over `nBuckets` partitions.
    *
    * Matching is two-phase:
    *  1. within-bucket: the same union + window carry as [[asof]], with
    *     `_b` added to the partition key. Bucket ranges are disjoint in ts,
    *     so a within-bucket predecessor always beats any earlier bucket.
    *  2. cross-bucket: left rows with no within-bucket predecessor take the
    *     best right row from any EARLIER bucket. That carry is computed on
    *     a per-(key, bucket) summary — `max(struct(ts, payload...))` is a
    *     map-side-combinable aggregate, one row per key x bucket — then
    *     prefix-expanded per key to a dense (key, b) -> carry frame
    *     (<= nBuckets rows per key) and equi-joined back. No row-level
    *     range join anywhere.
    *
    * Bucket boundaries come from one min/max pass over both inputs (two
    * doubles to the driver); pass `tsRange` to skip that pass when the
    * bounds are known (e.g. a date-partitioned 100 TB table).
    *
    * Falls back to [[asof]] when the input is empty or all timestamps are
    * equal (zero width — nothing to split). */
  def asofBucketed(left: DataFrame, right: DataFrame, key: String, ts: String,
                   rightPayload: Seq[String], nBuckets: Int = 8,
                   tsRange: Option[(Double, Double)] = None): DataFrame = {
    require(rightPayload.nonEmpty, "asofBucketed needs at least one payload column")
    require(rightPayload.forall(c => !left.columns.contains(c)),
      "right payload columns must not collide with left columns")
    // monotone numeric image of ts, used ONLY for bucketing: TIMESTAMP_NTZ
    // has no direct double cast, so route it through TIMESTAMP (session tz
    // is pinned UTC in this engine; any monotone mapping is correct here)
    val tsD = left.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(ts).cast("timestamp").cast("double")
      case _ => col(ts).cast("double")
    }
    val (lo, hi) = tsRange.getOrElse {
      val mm = left.select(col(ts)).unionAll(right.select(col(ts)))
        .agg(min(tsD), max(tsD)).head()
      if (mm.isNullAt(0)) return asof(left, right, key, ts, rightPayload)
      (mm.getDouble(0), mm.getDouble(1))
    }
    val width = (hi - lo) / nBuckets
    if (!(width > 0)) return asof(left, right, key, ts, rightPayload)
    val bucket = least(lit(nBuckets - 1), greatest(lit(0),
      floor((tsD - lo) / width).cast("int")))

    val l = left.withColumn("_asof_side", lit(1)).withColumn("_b", bucket)
    val r = right.select(col(key) +: col(ts) +: rightPayload.map(col): _*)
      .withColumn("_asof_side", lit(0)).withColumn("_b", bucket)
    val u = l.unionByName(r, allowMissingColumns = true)
    val order = col(ts).asc +: col("_asof_side").asc +: rightPayload.map(col(_).asc)
    val w = Window.partitionBy(col(key), col("_b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val phase1 = carried.filter(col("_asof_side") === 1).drop("_asof_side")

    // phase 2: best right row per (key, bucket) — struct ordering is
    // lexicographic, so max(struct(ts, payload...)) is exactly the window's
    // last-row tie-break (greatest ts, then greatest payload)
    val best = r.groupBy(col(key), col("_b"))
      .agg(max(struct(col(ts) +: rightPayload.map(col): _*)).as("_best"))
    // dense prefix expansion: for every bucket b, the best right row from
    // buckets STRICTLY BEFORE b (<= nBuckets entries per key, computed on
    // the collected per-key list — bounded by the nBuckets constant)
    val bSeq = sequence(lit(0), lit(nBuckets - 1))
    val dense = best.groupBy(col(key))
      .agg(collect_list(struct(col("_b"), col("_best"))).as("_lst"))
      .select(col(key), explode(transform(bSeq, b => struct(
        b.cast("int").as("_b"),
        array_max(transform(filter(col("_lst"), e => e("_b") < b),
          e => e("_best"))).as("_carry")))).as("_e"))
      .select(col(key), col("_e._b").as("_b"), col("_e._carry").as("_carry"))
      .filter(col("_carry").isNotNull)

    // right payload is null-free, so a null head column == no within-bucket
    // predecessor
    val matchedWithin = phase1.filter(col(rightPayload.head).isNotNull).drop("_b")
    val needsCarry = phase1.filter(col(rightPayload.head).isNull)
      .join(dense, Seq(key, "_b"), "left")
    val resolved = rightPayload.foldLeft(needsCarry) { (df, c) =>
      df.withColumn(c, col("_carry").getField(c))
    }.drop("_b", "_carry")
    matchedWithin.unionByName(resolved)
  }
}
