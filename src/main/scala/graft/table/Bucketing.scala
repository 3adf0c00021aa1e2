package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark bucketed tables for CO-LOCATED joins: writing both sides of a
  * recurring join bucketed (+sorted) on the join key lets every subsequent
  * SortMergeJoin run with NO Exchange on either side — the shuffle is paid
  * once at write time and amortized over every downstream job. At 100 TB
  * this is the difference between re-shuffling the fact table per query
  * and a scan-join. (The broadcast covering index stays the first choice
  * when one side fits in memory; bucketing is for big-big joins like
  * entity x entity self-joins on cell.)
  *
  * Uses the session catalog (in-memory or Hive alike); pass an explicit
  * database carved out under a caller-chosen location so nothing writes
  * into the working directory.
  */
object Bucketing {

  def createDb(spark: SparkSession, db: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")

  /** Write `df` as a bucketed+sorted parquet table `db.name`. */
  def writeBucketed(df: DataFrame, db: String, name: String,
                    nBuckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(s"$db.$name")

  /** Join two same-bucketed tables on their bucket keys as a SortMergeJoin
    * (merge hint: this operator exists for BIG-BIG joins, where broadcast
    * is off the table). With matching bucketing+sort on both sides the
    * plan contains no Exchange and no per-task Sort (asserted in tests). */
  def coLocatedJoin(spark: SparkSession, db: String, left: String, right: String,
                    keys: Seq[String]): DataFrame =
    spark.table(s"$db.$left").hint("merge").join(spark.table(s"$db.$right"), keys)
}
