package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import graft.GraftError
import graft.geom.{GeoJsonDecode, Mercator, WkbCodec}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** GeoJSON FeatureCollection source (reference S1/S2,
  * `/root/reference/src/format/geojson.rs:105-166` scan, `:16-103`
  * schema inference). Reference semantics kept exactly:
  *
  *  - non-FeatureCollection input -> warning + EMPTY result (`:119-124`);
  *  - schema inferred from the FIRST feature only (`:29-33`);
  *  - property keys named `geom`/`geometry` skipped (`:34-36`);
  *  - JSON Null contributes no column (`:83-84`);
  *  - JSON Number -> DoubleType, String -> StringType, Bool -> BooleanType;
  *  - nested objects/arrays -> warning, column dropped (`:85`);
  *  - conflicting types for one key -> [[GraftError.MixedDataTypes]];
  *  - optional per-feature 4326<->3857 reproject (P3), WKB geom LAST (P4/P6).
  *
  * Documented deviation: columns in lexicographic order (SURVEY §1.3 —
  * the reference's HashMap order is nondeterministic and can silently
  * mis-assign same-typed columns).
  *
  * Scale note: one .geojson file is a single JSON document, so the file is
  * the parallel unit ([[readDir]] parses on executors). For geometry JSON
  * already inside a 10^12-row table column, use [[geomFromGeoJson]] — a
  * per-row function, no driver involvement.
  */
object GeoJsonReader {
  private val mapper = new ObjectMapper()

  /** Column function: GeoJSON geometry string -> WKB binary (distributed
    * path for geometry columns in big tables). Backed by the native
    * Catalyst expression (no ScalaUDF conversion layer). */
  def geomFromGeoJson(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.ops.SqlFunctions.StGeomFromGeoJson(org.apache.spark.sql.GraftShim.expression(c)))

  def inferSchema(json: String): StructType = {
    val root = mapper.readTree(json)
    if (root.path("type").asText() != "FeatureCollection") {
      System.err.println("[geojson] not a FeatureCollection; empty schema")
      return StructType(Seq(StructField("geom", BinaryType, nullable = true)))
    }
    val feats = root.path("features")
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    if (feats.size() > 0) {
      // reference: FIRST feature only (geojson.rs:29-33)
      val props = feats.get(0).path("properties")
      props.properties().asScala.foreach { e =>
        val (k, v) = (e.getKey, e.getValue)
        if (k != "geom" && k != "geometry") {
          val dt: Option[DataType] =
            if (v.isNumber) Some(DoubleType)
            else if (v.isTextual) Some(StringType)
            else if (v.isBoolean) Some(BooleanType)
            else if (v.isNull) None
            else { System.err.println(s"[geojson] type of '$k' not supported, dropped"); None }
          dt.foreach { d =>
            fields.get(k) match {
              case Some(prev) if prev != d => throw GraftError.MixedDataTypes(k)
              case _ => fields(k) = d
            }
          }
        }
      }
    }
    StructType(fields.toSeq.sortBy(_._1).map { case (k, d) => StructField(k, d, nullable = true) } :+
      StructField("geom", BinaryType, nullable = true))
  }

  /** Executor-safe parse of one FeatureCollection string into Rows. */
  def parseRows(json: String, schema: StructType,
                fromSrid: Int, reproject: Option[Int]): Seq[Row] = {
    val root = mapper.readTree(json)
    if (root.path("type").asText() != "FeatureCollection") {
      System.err.println("[geojson] not a FeatureCollection; no rows")
      return Seq.empty
    }
    val attrs = schema.fields.dropRight(1)
    val feats = root.path("features")
    (0 until feats.size()).map { i =>
      val feat = feats.get(i)
      val props = feat.path("properties")
      val values = attrs.map { f =>
        val v = props.path(f.name)
        if (v.isMissingNode || v.isNull) null
        else (f.dataType, v) match {
          case (DoubleType, n) if n.isNumber   => n.asDouble()
          case (StringType, n) if n.isTextual  => n.asText()
          case (BooleanType, n) if n.isBoolean => n.asBoolean()
          case _ => throw GraftError.MixedDataTypes(f.name)
        }
      }
      val geomNode = feat.path("geometry")
      val geom =
        if (geomNode.isMissingNode || geomNode.isNull) null
        else {
          val g = GeoJsonDecode.decode(geomNode)
          reproject.foreach { to =>
            g.apply(new org.locationtech.jts.geom.CoordinateFilter {
              override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
                val (x, y) = Mercator.transform(c.x, c.y, fromSrid, to)
                c.x = x; c.y = y
              }
            })
            g.geometryChanged()
          }
          WkbCodec.write(g)
        }
      Row.fromSeq(values.toSeq :+ geom)
    }
  }

  def read(spark: SparkSession, path: String,
           fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    val json = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val schema = inferSchema(json)
    val rows = parseRows(json, schema, fromSrid, reproject)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  /** Many .geojson files parsed on executors, one per task. */
  def readDir(spark: SparkSession, dir: String,
              fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".geojson")).sorted.toSeq
    require(files.nonEmpty, s"no .geojson files under $dir")
    val schema = inferSchema(new String(Files.readAllBytes(Paths.get(files.head)), "UTF-8"))
    val rdd = spark.sparkContext.parallelize(files, files.length).flatMap { f =>
      parseRows(new String(Files.readAllBytes(Paths.get(f)), "UTF-8"), schema, fromSrid, reproject)
    }
    spark.createDataFrame(rdd, schema)
  }
}
