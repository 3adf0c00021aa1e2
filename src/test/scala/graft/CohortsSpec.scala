package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Cohorts, SpaceTime}

class CohortsSpec extends AnyFunSuite with SparkTest {

  test("fixture events: brute-force parity; triangle laws hold") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("user_id", s"unix_micros(CAST(ts AS TIMESTAMP)) div ${SpaceTime.DayUs}L")
      .as[(Long, Long)].collect().toSeq
    val act = evs.distinct
    val cohort = act.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val want = act.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Cohorts.retention(spark, Sf)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want)
    // offset-0 row per cohort equals the cohort size
    val sizes = cohort.groupBy(_._2).map { case (d, v) => d -> v.size.toLong }
    sizes.foreach { case (d, n) => assert(got((d, 0L)) === n, s"cohort $d size") }
    // retention never exceeds the cohort size; offsets are non-negative
    got.foreach { case ((d, off), n) =>
      assert(off >= 0L)
      assert(n <= got((d, 0L)), s"cohort $d offset $off")
    }
  }

  test("planted events: a user active on days 0,1,5 lands in offsets 0,1,5 of cohort 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("coh_evt").toFile
    dir.deleteOnExit()
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = Seq((1L, 0L), (1L, 1L), (1L, 5L), (1L, 5L), (2L, 1L), (2L, 3L))
      .map { case (u, d) => (u, java.sql.Timestamp.from(base.plusSeconds(d * 86400L))) }
    rows.toDF("user_id", "ts").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    val d0 = 19723L // 2024-01-01 epoch day
    val got = Cohorts.retention(spark, dir.getAbsolutePath)
      .as[(Long, Long, Long)].collect().map(r => (r._1 - d0, r._2) -> r._3).toMap
    assert(got === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 5L) -> 1L, // user 1 (dup day-5 collapses)
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))                // user 2 cohort day 1
  }
}
