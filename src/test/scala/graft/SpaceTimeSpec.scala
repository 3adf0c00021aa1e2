package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SpaceTime

class SpaceTimeSpec extends AnyFunSuite with SparkTest {

  private def cellOf(u: Long): (Long, Long) =
    ((((u * 467 + 3) % 7200) * 64) / 7200, (((u * 911 + 5) % 2800) * 64) / 2800)

  /** Brute-force Mann-Kendall over (user, dayIndex) events. */
  private def brute(evs: Seq[(Long, Long)]): Map[(Long, Long), (Long, Long)] = {
    val byCellDay = evs.groupBy { case (u, d) => (cellOf(u), d) }
      .map { case (k, v) => k -> v.size.toLong }
    val d0 = evs.map(_._2).min; val d1 = evs.map(_._2).max
    val cells = byCellDay.keys.map(_._1).toSet
    cells.map { c =>
      val series = (d0 to d1).map(d => byCellDay.getOrElse((c, d), 0L))
      var s = 0L
      for (i <- series.indices; j <- i + 1 until series.size)
        s += java.lang.Long.signum(series(j) - series(i))
      c -> (d1 - d0 + 1, s)
    }.toMap
  }

  test("mannKendall == brute force on the sf events fixture") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("user_id", s"unix_micros(CAST(ts AS TIMESTAMP)) div ${SpaceTime.DayUs}L")
      .as[(Long, Long)].collect().toSeq
    val want = brute(evs)
    val got = SpaceTime.mannKendall(spark, Sf)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got.size === want.size)
    want.foreach { case (c, (nd, s)) =>
      val trend = if (s > 0) "UP" else if (s < 0) "DOWN" else "FLAT"
      assert(got(c) === ((nd, s, trend)), s"cell $c")
      val maxS = nd * (nd - 1) / 2
      assert(math.abs(s) <= maxS, "S bounded by pair count")
    }
  }

  test("spatialMarkov == brute force on the sf events fixture; transitions conserve cells x (days-1)") {
    import spark.implicits._
    val evs = spark.read.parquet(s"$Sf/events.parquet")
      .selectExpr("user_id", s"unix_micros(CAST(ts AS TIMESTAMP)) div ${SpaceTime.DayUs}L")
      .as[(Long, Long)].collect().toSeq
    val byCellDay = evs.groupBy { case (u, d) => (cellOf(u), d) }
      .map { case (k, v) => k -> v.size.toLong }
    val d0 = evs.map(_._2).min; val d1 = evs.map(_._2).max
    val cells = byCellDay.keys.map(_._1).toSet
    def n(c: (Long, Long), d: Long): Long = byCellDay.getOrElse((c, d), 0L)
    val offs = Seq((-1L, -1L), (-1L, 0L), (-1L, 1L), (0L, -1L), (0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))
    def lag(c: (Long, Long), d: Long): Long =
      offs.map { case (dx, dy) => n((c._1 + dx, c._2 + dy), d) }.sum
    def cls(v: Long, hi: Long): String = if (v == 0) "Z" else if (v < hi) "L" else "H"
    val want = (for {
      c <- cells.toSeq; d <- d0 until d1
    } yield (cls(lag(c, d), 9L), cls(n(c, d), 3L), cls(n(c, d + 1), 3L)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SpaceTime.spatialMarkov(spark, Sf)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got === want)
    assert(got.values.sum === cells.size.toLong * (d1 - d0), "every (cell, day-pair) transitions exactly once")
  }

  test("planted monotone series: rising cell reads UP, falling reads DOWN, flat reads FLAT") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("st_evt").toFile
    dir.deleteOnExit()
    // users 1, 2, 3 land in distinct cells; day k carries k events for
    // user 1 (strictly rising), 5-k for user 2 (falling), 2 every day
    // for user 3 (flat: all sign pairs zero)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    assert(Seq(1L, 2L, 3L).map(cellOf).distinct.size === 3)
    val rows = (for {
      d <- 0 until 5
      (u, cnt) <- Seq((1L, d + 1), (2L, 5 - d), (3L, 2))
      _ <- 0 until cnt
    } yield (u, java.sql.Timestamp.from(base.plusSeconds(d * 86400L + u)))).toSeq
    rows.toDF("user_id", "ts").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    val got = SpaceTime.mannKendall(spark, dir.getAbsolutePath)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(cellOf(1L)) === ((5L, 10L, "UP")), "strictly rising: all 10 pairs +1")
    assert(got(cellOf(2L)) === ((5L, -10L, "DOWN")))
    assert(got(cellOf(3L)) === ((5L, 0L, "FLAT")))
  }
}
