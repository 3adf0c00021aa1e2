package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoHashSpec extends AnyFunSuite with SparkTest {

  /** Textbook bisection geohash (the published algorithm, as the ground
    * truth the closed-form Morton implementation must reproduce). */
  private def refGeohash(lon: Double, lat: Double, chars: Int): String = {
    var lonL = -180.0; var lonH = 180.0; var latL = -90.0; var latH = 90.0
    val sb = new StringBuilder
    var even = true
    while (sb.length < chars) {
      var ch = 0
      for (_ <- 0 until 5) {
        if (even) {
          val mid = (lonL + lonH) / 2
          if (lon >= mid) { ch = ch * 2 + 1; lonL = mid } else { ch = ch * 2; lonH = mid }
        } else {
          val mid = (latL + latH) / 2
          if (lat >= mid) { ch = ch * 2 + 1; latL = mid } else { ch = ch * 2; latH = mid }
        }
        even = !even
      }
      sb.append(graft.ops.GeoHash.Alphabet.charAt(ch))
    }
    sb.toString
  }

  test("closed-form geohash == bisection reference over lattice + corner points") {
    import spark.implicits._
    val pts = (for (i <- 0 until 1500) yield {
      val lon = ((i * 7919) % 7200) / 20.0 - 180.0
      val lat = ((i * 104729) % 3600) / 20.0 - 90.0
      (lon, lat)
    }) ++ Seq((-180.0, -90.0), (179.95, 89.95), (0.0, 0.0), (-0.05, 0.05))
    val got = pts.toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        graft.ops.GeoHash.encode(col("lon"), col("lat"), 6).as("gh"))
      .as[(Double, Double, String)].collect()
    got.foreach { case (lon, lat, gh) =>
      assert(gh === refGeohash(lon, lat, 6), s"($lon, $lat)")
    }
    assert(got.length === 1504)
    // well-known value (public test vector): ezs42 = (-5.6, 42.6) at 5 chars
    // -> our even-length variant checks its 4-char prefix
    assert(refGeohash(-5.6, 42.6, 5).startsWith("ezs4"))
  }

  test("prefix-containment: 4-char geohash prefixes the 6-char one") {
    import spark.implicits._
    val pts = (0 until 800).map { i =>
      (((i * 337) % 7200) / 20.0 - 180.0, ((i * 991) % 3600) / 20.0 - 90.0)
    }
    val rows = pts.toDF("lon", "lat")
      .select(graft.ops.GeoHash.encode(col("lon"), col("lat"), 4).as("g4"),
        graft.ops.GeoHash.encode(col("lon"), col("lat"), 6).as("g6"))
      .as[(String, String)].collect()
    rows.foreach { case (g4, g6) => assert(g6.startsWith(g4), s"$g6 !~ $g4") }
  }
}
