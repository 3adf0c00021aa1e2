package graft

import org.scalatest.funsuite.AnyFunSuite

class OutliersSpec extends AnyFunSuite with SparkTest {

  /** lower-discrete quantile: smallest v with cum >= ceil(p*n/100). */
  private def medianLD(vs: Seq[Long]): Long = {
    val sorted = vs.sorted
    sorted(((vs.size + 1) / 2) - 1)
  }

  test("sampledQuantiles: deterministic sample, exact-of-sample, close to true quantiles") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val keep = 2147483647L / 2
    val got = graft.ops.Outliers.sampledQuantiles(ev, keep, Seq(50, 90))
      .as[(Long, Long, Long)].collect()
    // deterministic: rerun identical
    val again = graft.ops.Outliers.sampledQuantiles(ev, keep, Seq(50, 90))
      .as[(Long, Long, Long)].collect()
    assert(got.toSet === again.toSet)
    // brute force: same draw, same sample, same lower-discrete quantile
    val raw = ev.selectExpr("event_id", "user_id", "CAST(floor(value * 1000) AS LONG) AS v")
      .as[(Long, Long, Long)].collect()
    val sampled = raw.filter { case (id, _, _) => (id % 2147483647L) * 2654435761L % 2147483647L < keep }
    assert(sampled.length > raw.length / 3 && sampled.length < 2 * raw.length / 3)
    val expect = sampled.groupBy(_._2).flatMap { case (u, rows) =>
      val s = rows.map(_._3).sorted
      Seq(50, 90).map(p => (u, p.toLong, s(((p * s.length + 99) / 100) - 1)))
    }.toSet
    assert(got.toSet === expect)
    // closeness: per-user sampled p50 within the user's true p25..p75 band
    val trueQ = raw.groupBy(_._2).map { case (u, rows) =>
      val s = rows.map(_._3).sorted
      u -> (s(((25 * s.length + 99) / 100) - 1), s(((75 * s.length + 99) / 100) - 1))
    }
    got.filter(_._2 == 50L).foreach { case (u, _, q) =>
      val (lo, hi) = trueQ(u)
      assert(q >= lo && q <= hi, s"user $u sampled p50 $q outside [$lo, $hi]")
    }
  }

  test("robustOutliers == brute-force median/MAD; flags are robust to the planted spike") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val got = graft.ops.Outliers.robustOutliers(ev)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    val raw = ev.selectExpr("event_id", "user_id", "CAST(floor(value * 1000) AS LONG) AS v")
      .as[(Long, Long, Long)].collect()
    raw.groupBy(_._2).foreach { case (user, rows) =>
      val med = medianLD(rows.map(_._3).toSeq)
      val mad = medianLD(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.foreach { case (eid, _, v) =>
        val flag = if (math.abs(v - med) > 5 * mad) 1L else 0L
        assert(got(eid) === ((eid, user, v, med, mad, flag)), s"event $eid")
      }
    }
    assert(got.size === raw.length)

    // synthetic sanity: a user whose values cluster at 100 with one spike
    // flags exactly the spike; the mean-based z-score would have had its
    // threshold dragged by it
    val planted = (1L to 20L).map(i => (i, 1L, 0.1)) :+ (99L, 1L, 999.9)
    val flags = graft.ops.Outliers.robustOutliers(
        planted.toDF("event_id", "user_id", "value"))
      .select("event_id", "is_outlier").as[(Long, Long)].collect().toMap
    assert(flags(99L) === 1L)
    assert((1L to 20L).forall(flags(_) === 0L))
  }
}
