package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{FileFixtures, GeoJsonReader, OsmPbfReader}

/** The GeoJSON FeatureCollection and OSM PBF DataSource V2 scans: parity
  * with the executor-RDD readers, partition planning, column pruning. */
class SourcesV2Spec extends AnyFunSuite with SparkTest {

  private val monaco = "/root/reference/examples/osmpbf/monaco-latest.osm.pbf"

  private lazy val gjDir = {
    val d = Files.createTempDirectory("graft-gj-v2")
    FileFixtures.writeGeoJson(s"$d/fix.geojson")
    d.toString
  }

  test("geojson DSV2: schema and rows match the streaming reader exactly") {
    val v2 = spark.read.format("geojson").load(s"$gjDir/fix.geojson")
    val v1 = GeoJsonReader.read(spark, s"$gjDir/fix.geojson")
    assert(v2.schema === v1.schema)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.selectExpr("name", "val", "flag", "md5(geom) AS g")
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(key(v2) === key(v1))
  }

  test("geojson DSV2: one partition per file; directory load unions files") {
    val d = Files.createTempDirectory("graft-gj-dir")
    FileFixtures.writeGeoJson(s"$d/a.geojson")
    FileFixtures.writeGeoJson(s"$d/b.geojson")
    val df = spark.read.format("geojson").load(d.toString)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() ===
      GeoJsonReader.read(spark, s"$d/a.geojson").count() * 2)
  }

  test("geojson DSV2: pruning `geom` reaches the scan (decode skipped)") {
    val pruned = spark.read.format("geojson").load(s"$gjDir/fix.geojson").select("name")
    val planned = pruned.queryExecution.executedPlan.toString()
    assert(planned.contains("readSchema=struct<name:string>"), planned)
    assert(pruned.count() > 0)
  }

  test("osmpbf DSV2: nodes/ways/relations match the RDD readers on monaco") {
    assume(Files.exists(Paths.get(monaco)))
    def cnt(el: String) =
      spark.read.format("osmpbf").option("element", el).load(monaco).count()
    assert(cnt("nodes") === OsmPbfReader.nodes(spark, monaco).count())
    assert(cnt("ways") === OsmPbfReader.ways(spark, monaco).count())
    assert(cnt("relations") === OsmPbfReader.relations(spark, monaco).count())
    // value parity on a sample: way ids + first tag
    val v2 = spark.read.format("osmpbf").option("element", "ways").load(monaco)
      .select(col("way_id"), try_element_at(col("tags"), lit(1)).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).take(100)
    val v1 = OsmPbfReader.ways(spark, monaco)
      .select(col("way_id"), try_element_at(col("tags"), lit(1)).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).take(100)
    assert(v2 === v1)
  }

  test("osmpbf DSV2: blob-range splits give multiple partitions; splitBlobs=1 is finest") {
    assume(Files.exists(Paths.get(monaco)))
    val nBlobs = OsmPbfReader.indexBlobs(monaco).count(_.blobType == "OSMData")
    val fine = spark.read.format("osmpbf").option("element", "nodes")
      .option("splitBlobs", "1").load(monaco)
    assert(fine.rdd.getNumPartitions === nBlobs)
    val coarse = spark.read.format("osmpbf").option("element", "nodes").load(monaco)
    assert(coarse.rdd.getNumPartitions === (nBlobs + 3) / 4)
    assert(fine.count() === coarse.count())
  }

  test("osmpbf DSV2: pruning to way_id skips refs/tags materialization") {
    assume(Files.exists(Paths.get(monaco)))
    val pruned = spark.read.format("osmpbf").option("element", "ways")
      .load(monaco).select("way_id")
    val planned = pruned.queryExecution.executedPlan.toString()
    assert(planned.contains("readSchema=struct<way_id:bigint>"), planned)
    assert(pruned.count() === OsmPbfReader.ways(spark, monaco).count())
  }

  test("osmpbf DSV2: bad element option fails validation") {
    val e = intercept[Exception] {
      spark.read.format("osmpbf").option("element", "bogus").load(monaco).count()
    }
    assert(e.getMessage.contains("nodes|ways|relations"))
  }
}
