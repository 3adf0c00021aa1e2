package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{GeoJsonDecode, GeoJsonEncode, WkbCodec}

class GeoJsonlSinkSpec extends AnyFunSuite with SparkTest {

  test("GeoJsonEncode: decode(encode(g)) is geometry-identical incl. double bits") {
    val geoms = Seq(
      WkbCodec.point(-122.419416, 37.774929),
      WkbCodec.point(0.1 + 0.2, -0.0), // non-representable sum, negative zero
      WkbCodec.lineString(Seq((0.0, 0.0), (1.5, 2.25), (-3.125, 4.0))),
      WkbCodec.polygon(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
        holes = Seq(Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)))),
      WkbCodec.multiPolygon(Seq(
        WkbCodec.diamond(10.0, 10.0, 2.0), WkbCodec.diamond(-10.0, -10.0, 1.0))))
    geoms.foreach { g =>
      val back = GeoJsonDecode.parse(GeoJsonEncode.encode(g))
      assert(back.getGeometryType === g.getGeometryType)
      assert(java.util.Arrays.equals(WkbCodec.write(back), WkbCodec.write(g)),
        s"WKB drift for ${g.getGeometryType}")
    }
  }

  test("sink round trip: read(write(read(x))) row-identical; modes enforced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink_spec").toString
    sources.FileFixtures.writeGeoJsonl(s"$dir/fix.geojsonl")
    def rd(p: String) = spark.read.format("geojsonl")
      .option("splitBytes", (1L << 20).toString).load(p)
    val src = rd(s"$dir/fix.geojsonl")
    sources.GeoJsonlSink.write(src, s"$dir/out")
    val back = rd(s"$dir/out")
    assert(back.schema.fieldNames.sorted === src.schema.fieldNames.sorted)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("name"), col("val"), col("flag"), hex(col("geom")).as("g"))
        .as[(String, Double, Boolean, String)].collect().toSet
    assert(canon(back) === canon(src))
    assert(back.count() === sources.FileFixtures.JlCount.toLong)
    // multiple part files (executor-parallel write)
    assert(new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".geojsonl")) > 1)
    // mode contract
    intercept[GraftError.TableExists](sources.GeoJsonlSink.write(src, s"$dir/out"))
    sources.GeoJsonlSink.write(src.limit(5), s"$dir/out", mode = "overwrite")
    assert(rd(s"$dir/out").count() === 5L)
  }
}
