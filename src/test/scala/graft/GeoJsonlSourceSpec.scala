package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.FileFixtures

/** The ndjson (GeoJSONL) DataSource V2: byte-range split semantics,
  * first-line schema inference, column pruning, malformed-line skip. */
class GeoJsonlSourceSpec extends AnyFunSuite with SparkTest {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-jl")
    FileFixtures.writeGeoJsonl(s"$d/fix.geojsonl")
    d.toString
  }
  private def read(splitBytes: Long) =
    spark.read.format("geojsonl").option("splitBytes", splitBytes.toString)
      .load(s"$dir/fix.geojsonl")

  test("schema: lexicographic attrs, geom LAST, `geom` property key skipped") {
    val s = read(1 << 20).schema
    assert(s.fieldNames.toSeq === Seq("flag", "name", "val", "geom"))
    assert(s("geom").dataType === BinaryType)
    assert(s("val").dataType === DoubleType)
    assert(s("flag").dataType === BooleanType)
  }

  test("byte-range splits reassemble the identical table (straddling lines once)") {
    // 64 KB splits cut mid-line ~hundreds of times across the ~7 MB file;
    // any dropped or doubled straddling line breaks count or name-set parity
    val whole = read(1L << 30) // single split
    val split = read(64L * 1024)
    assert(split.rdd.getNumPartitions > 50, "want many byte-range splits")
    assert(whole.rdd.getNumPartitions === 1)
    assert(split.count() === FileFixtures.JlCount)
    val a = whole.selectExpr("name", "val", "flag", "md5(geom) AS g")
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = split.selectExpr("name", "val", "flag", "md5(geom) AS g")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("a line starting EXACTLY at a split boundary is read exactly once") {
    // fixed-width lines + splitBytes = an exact multiple of the line width:
    // EVERY split boundary coincides with a line start. The naive Hadoop
    // emulation (skip-to-newline whenever start > 0) drops one line per
    // split here; the peek-at-start-minus-1 rule keeps them all.
    val d = Files.createTempDirectory("graft-jl-align")
    val width = 128 // line + '\n'
    def line(i: Int): String = {
      val raw = s"""{"type":"Feature","properties":{"name":"a${"%05d".format(i)}","pad":"PP"},"geometry":{"type":"Point","coordinates":[1,2]}}"""
      val padded = raw.replace("PP", "P" * (width - 1 - (raw.length - 2)))
      assert(padded.length == width - 1, s"${padded.length}")
      padded
    }
    val n = 40
    Files.writeString(Paths.get(s"$d/aligned.geojsonl"),
      (0 until n).map(line).mkString("", "\n", "\n"))
    val df = spark.read.format("geojsonl")
      .option("splitBytes", (width * 4).toString) // boundary every 4 lines
      .load(s"$d/aligned.geojsonl")
    assert(df.rdd.getNumPartitions === n / 4)
    val names = df.select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(names === (0 until n).map(i => s"a${"%05d".format(i)}"))
  }

  test("column pruning reaches the scan (geom decode skipped when pruned)") {
    val pruned = read(1 << 20).select("name")
    val scanLine = pruned.queryExecution.executedPlan.toString()
    assert(scanLine.contains("readSchema=struct<name:string>"),
      s"geom not pruned from the scan:\n$scanLine")
    assert(pruned.count() === FileFixtures.JlCount)
  }

  test("blank and non-Feature lines are skipped, not fatal") {
    val d = Files.createTempDirectory("graft-jl-bad")
    Files.writeString(Paths.get(s"$d/bad.geojsonl"),
      FileFixtures.JlFeat(0).line + "\n" +
        "\n" +
        """{"type":"FeatureCollection","features":[]}""" + "\n" +
        FileFixtures.JlFeat(1).line + "\n")
    val df = spark.read.format("geojsonl").load(s"$d/bad.geojsonl")
    assert(df.count() === 2)
  }

  test("reproject 4326->3857 matches the FeatureCollection reader's math") {
    val df = spark.read.format("geojsonl").option("reproject", "3857")
      .load(s"$dir/fix.geojsonl").limit(1)
    val wkb = df.select("geom").head().getAs[Array[Byte]](0)
    val g = graft.geom.WkbCodec.read(wkb)
    val (ex, ey) = graft.geom.Mercator.transform(
      FileFixtures.JlFeat(0).x.toDouble, FileFixtures.JlFeat(0).y.toDouble, 4326, 3857)
    assert(g.getCoordinate.x === ex && g.getCoordinate.y === ey)
  }
}
