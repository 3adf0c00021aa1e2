package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import java.nio.file.Files
import graft.sources.{FileFixtures, OsmPbfReader, ShapefileReader}

/** The oracle-checked file-source queries (q40-q42) verified against the
  * same closed-form expectations the DuckDB VALUES oracle is generated
  * from, plus the DBF 'I' -> LongType golden (shapefile.rs:66-80). */
class FileFixturesSpec extends AnyFunSuite with SparkTest {

  test("q40: GeoJSON fixture through the real reader matches closed form") {
    val rows = FileFixtures.geojsonScanQuery(spark)
      .orderBy("name").collect()
    val exp = FileFixtures.geoFeats.sortBy(_.name).map(f =>
      (f.name, f.valQ, f.flag01, f.gtype, f.npts, f.area2, f.x4, f.y4))
    assert(rows.length === exp.length)
    rows.zip(exp).foreach { case (r, e) =>
      assert((r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) === e)
    }
  }

  test("q41: shapefile fixture matches closed form; cnt is LongType") {
    val df = FileFixtures.shapefileScanQuery(spark)
    assert(df.schema("cnt").dataType === LongType)
    val rows = df.orderBy("nm").collect()
    val exp = FileFixtures.shpFeats.sortBy(_.nm).map(f =>
      (f.cnt.toLong, f.nm, f.ok01, f.vq2, f.npts, f.area2, f.x4, f.y4))
    rows.zip(exp).foreach { case (r, e) =>
      assert((r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) === e)
    }
  }

  test("q42: synthesized PBF through the real parser matches closed form") {
    val rows = FileFixtures.pbfScanQuery(spark).orderBy("way_id").collect()
    val exp = FileFixtures.pbfExpected.sortBy(_._1)
    assert(rows.length === 4)
    rows.zip(exp).foreach { case (r, e) =>
      assert((r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)) === e)
    }
  }

  test("PBF fixture: node coordinates decode via both dense and plain paths") {
    val dir = Files.createTempDirectory("graft-pbf-nodes").toString
    FileFixtures.writePbf(s"$dir/n.osm.pbf")
    val nodes = OsmPbfReader.nodes(spark, s"$dir/n.osm.pbf")
      .orderBy("node_id").collect()
    assert(nodes.length === 8)
    FileFixtures.pbfNodes.zip(nodes).foreach { case (n, r) =>
      assert(r.getLong(0) === n.id)
      assert(r.getDouble(1) === 1e-9 * (100L * n.rawLon)) // granularity 100
      assert(r.getDouble(2) === 1e-9 * (100L * n.rawLat))
      assert(r.getSeq[String](3) === n.tags.map(t => s"${t._1}=${t._2}"))
    }
  }

  test("DBF 'I' field: binary int32 LE -> LongType, negative round-trips") {
    val dir = Files.createTempDirectory("graft-dbf-i").toString
    FixtureWriters.writePolygonShp(s"$dir/i.shp",
      Seq(Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0))))
    FixtureWriters.writeDbf(s"$dir/i.dbf",
      Seq(("k", 'I', 4)), Seq(Seq("-2147483648")))
    val df = ShapefileReader.read(spark, s"$dir/i.shp")
    assert(df.schema("k").dataType === LongType)
    assert(df.collect().head.getLong(0) === Int.MinValue.toLong)
  }

  test("malformed numeric DBF cell surfaces MixedDataTypes, not NumberFormatException") {
    val dir = Files.createTempDirectory("graft-dbf-bad").toString
    FixtureWriters.writePolygonShp(s"$dir/b.shp",
      Seq(Seq((0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0))))
    FixtureWriters.writeDbf(s"$dir/b.dbf",
      Seq(("n", 'N', 9)), Seq(Seq("notanum")))
    assertThrows[GraftError.MixedDataTypes](
      ShapefileReader.read(spark, s"$dir/b.shp"))
  }
}
