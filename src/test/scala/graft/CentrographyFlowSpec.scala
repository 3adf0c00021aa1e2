package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ops.{Centrography, FlowMap}

class CentrographyFlowSpec extends AnyFunSuite with SparkTest {

  test("centrography == brute-force moment sums per class") {
    import spark.implicits._
    val rows: Seq[(String, Long, Long)] = (0 until 200).map { i =>
      (Seq("en", "de", "fr")(i % 3), (i * 37L) % 7200, (i * 53L) % 2800)
    }
    val got = Centrography.summary(rows.toDF("lang", "lonm", "latm"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val want = (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(r => r._2 * r._2).sum, g.map(r => r._3 * r._3).sum,
        g.map(r => r._2 * r._3).sum)
      assert(got(lang) === want, lang)
    }
    // mean center / standard distance are recoverable: spot-check one
    val (n, sx, _, sxx, _, _) = got("en")
    val varX = sxx.toDouble / n - math.pow(sx.toDouble / n, 2)
    assert(varX > 0.0, "nondegenerate spread")
  }

  test("odFlows == brute force on the sf fixture; flows sum to the edge count") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id").as[Long].collect().sorted
    val n = docs.length
    val edges = docs.flatMap { d =>
      (0L to 2 + d % 3).map(j => (d, (d * 31 + j * 17 + 7) % n))
    }.filter { case (s, d) => s != d }.distinct
    def isUrban(d: Long) = (d * 7) % 4 == 0
    def cell(d: Long): (Long, Long) = {
      val lonm = if (isUrban(d)) 4000 + (d * 13) % 20 else (d * 131) % 7200
      val latm = if (isUrban(d)) 1400 + (d * 11) % 20 else (d * 197) % 2800
      val lon = lonm / 20.0 - 180.0; val lat = latm / 20.0 - 70.0
      (math.max(0L, math.min(63L, math.floor((lon + 180.0) / 360.0 * 64.0).toLong)),
        math.max(0L, math.min(63L, math.floor((lat + 90.0) / 180.0 * 64.0).toLong)))
    }
    val want = edges.groupBy { case (s, d) =>
      val (sx, sy) = cell(s); val (dx, dy) = cell(d); (sx, sy, dx, dy)
    }.map { case (k, v) => k -> v.size.toLong }
    val got = FlowMap.odFlows(spark, Sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    assert(got === want)
    assert(got.values.sum === edges.size.toLong, "flows partition the edge set")
    assert(got.size > 1, "multiple cell pairs")
  }

  test("gravityResiduals: marginal laws and brute-force surplus on the fixture") {
    import spark.implicits._
    val flows = FlowMap.odFlows(spark, Sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    val oTot = flows.groupBy { case ((sx, sy, _, _), _) => (sx, sy) }
      .map { case (k, v) => k -> v.values.sum }
    val dTot = flows.groupBy { case ((_, _, dx, dy), _) => (dx, dy) }
      .map { case (k, v) => k -> v.values.sum }
    val t = flows.values.sum
    val got = FlowMap.gravityResiduals(spark, Sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, String)].collect()
    assert(got.length === flows.size)
    got.foreach { r =>
      val key = (r._1, r._2, r._3, r._4)
      assert(r._5 === flows(key))
      assert(r._6 === oTot((r._1, r._2)) && r._7 === dTot((r._3, r._4)) && r._8 === t)
      assert(r._9 === r._5 * t - r._6 * r._7, s"surplus at $key")
      val cls = if (r._9 > 0) "EXCESS" else if (r._9 < 0) "DEFICIT" else "NEUTRAL"
      assert(r._10 === cls)
    }
    assert(got.exists(_._10 == "EXCESS") && got.exists(_._10 == "DEFICIT"),
      "fixture shows both over- and under-represented corridors")
  }
}
