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

  /** Schema fields from the FIRST feature's properties (geojson.rs:29-33).
    * Shared with the ndjson DSV2 source ([[graft.sources.v2.GeoJsonlSource]])
    * so both GeoJSON shapes infer identically. */
  private[sources] def schemaFromFirstFeature(firstFeature: Option[JsonNode]): StructType = {
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    firstFeature.foreach { feat =>
      val props = feat.path("properties")
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

  def inferSchema(json: String): StructType = {
    val root = mapper.readTree(json)
    if (root.path("type").asText() != "FeatureCollection") {
      System.err.println("[geojson] not a FeatureCollection; empty schema")
      return StructType(Seq(StructField("geom", BinaryType, nullable = true)))
    }
    val feats = root.path("features")
    schemaFromFirstFeature(if (feats.size() > 0) Some(feats.get(0)) else None)
  }

  /** Streaming schema inference: reads the token stream only as far as the
    * FIRST feature (reference semantics), so inferring from a multi-GB file
    * costs a few KB of I/O instead of a whole-file DOM. */
  def inferSchemaStream(open: () => java.io.InputStream): StructType = {
    import com.fasterxml.jackson.core.{JsonParser, JsonToken}
    val in = open()
    val p: JsonParser = mapper.getFactory.createParser(in)
    try {
      if (p.nextToken() != JsonToken.START_OBJECT) {
        System.err.println("[geojson] not a FeatureCollection; empty schema")
        return StructType(Seq(StructField("geom", BinaryType, nullable = true)))
      }
      var isFc = false
      while (p.nextToken() == JsonToken.FIELD_NAME) {
        p.currentName() match {
          case "type" =>
            p.nextToken()
            if (p.getText != "FeatureCollection") {
              System.err.println("[geojson] not a FeatureCollection; empty schema")
              return StructType(Seq(StructField("geom", BinaryType, nullable = true)))
            }
            isFc = true
          case "features" =>
            if (!isFc) { // `type` after `features`: fall back to DOM
              p.close(); in.close()
              val src = scala.io.Source.fromInputStream(open(), "UTF-8")
              val json = try src.mkString finally src.close()
              return inferSchema(json)
            }
            if (p.nextToken() != JsonToken.START_ARRAY)
              return schemaFromFirstFeature(None)
            return schemaFromFirstFeature(
              if (p.nextToken() == JsonToken.START_OBJECT) Some(mapper.readTree[JsonNode](p))
              else None)
          case _ => p.nextToken(); p.skipChildren()
        }
      }
      schemaFromFirstFeature(None)
    } finally { p.close(); in.close() }
  }

  /** One feature subtree -> one Row (shared by the DOM and streaming paths). */
  private def rowFromFeature(feat: JsonNode, attrs: Array[StructField],
                             fromSrid: Int, reproject: Option[Int]): Row = {
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
    (0 until feats.size()).map(i => rowFromFeature(feats.get(i), attrs, fromSrid, reproject))
  }

  /** Streaming parse of one FeatureCollection: features decode one at a
    * time off the token stream (per-feature DOM, whole-file DOM never
    * built), so task memory stays flat no matter the file size — the
    * 100 TB-safe bulk-ingest path. `open` is called once (twice only in the
    * degenerate case where `features` precedes `type` in the JSON, which
    * falls back to the DOM parser to keep reference semantics exactly).
    * The returned iterator closes the stream on exhaustion. */
  def parseRowsStream(open: () => java.io.InputStream, schema: StructType,
                      fromSrid: Int, reproject: Option[Int]): Iterator[Row] = {
    val attrs = schema.fields.dropRight(1)
    featureStream(open).map(feat => rowFromFeature(feat, attrs, fromSrid, reproject))
  }

  /** Streaming per-feature JsonNode iterator over one FeatureCollection —
    * the shared core of [[parseRowsStream]] and the DataSource V2 scan
    * ([[graft.sources.v2.GeoJsonSource]]), so both decode features off the
    * token stream identically (per-feature DOM, whole-file DOM never
    * built; degenerate `features`-before-`type` ordering falls back to a
    * DOM walk to keep reference semantics exactly). */
  private[sources] def featureStream(
      open: () => java.io.InputStream): Iterator[JsonNode] = {
    import com.fasterxml.jackson.core.{JsonParser, JsonToken}
    val in = open()
    val p: JsonParser = mapper.getFactory.createParser(in)
    // idempotent close, ALSO registered as a task-completion hook: a
    // consumer that abandons the iterator early (limit/take/failure) would
    // otherwise leak this file handle until GC — in a long-lived executor
    // over thousands of files that climbs toward the fd ulimit
    val close: () => Unit = {
      var done = false
      () => if (!done) {
        done = true
        try p.close() finally in.close()
      }
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    def fallbackDom(): Iterator[JsonNode] = {
      close()
      val src = scala.io.Source.fromInputStream(open(), "UTF-8")
      val json = try src.mkString finally src.close()
      val root = mapper.readTree(json)
      if (root.path("type").asText() != "FeatureCollection") {
        System.err.println("[geojson] not a FeatureCollection; no rows")
        return Iterator.empty
      }
      val feats = root.path("features")
      (0 until feats.size()).iterator.map(feats.get)
    }
    if (p.nextToken() != JsonToken.START_OBJECT) {
      close()
      System.err.println("[geojson] not a FeatureCollection; no rows")
      return Iterator.empty
    }
    var isFc = false
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      p.currentName() match {
        case "type" =>
          p.nextToken()
          if (p.getText != "FeatureCollection") {
            close()
            System.err.println("[geojson] not a FeatureCollection; no rows")
            return Iterator.empty
          }
          isFc = true
        case "features" =>
          if (!isFc) return fallbackDom() // `type` after `features`: rare, not streamable
          if (p.nextToken() != JsonToken.START_ARRAY) { close(); return Iterator.empty }
          return new Iterator[JsonNode] {
            private var nextTok = p.nextToken()
            override def hasNext: Boolean = {
              val h = nextTok == JsonToken.START_OBJECT
              if (!h) close()
              h
            }
            override def next(): JsonNode = {
              val feat: JsonNode = mapper.readTree[JsonNode](p) // ONE feature subtree
              nextTok = p.nextToken()
              feat
            }
          }
        case _ => p.nextToken(); p.skipChildren()
      }
    }
    close()
    Iterator.empty // FeatureCollection with no features array
  }

  def read(spark: SparkSession, path: String,
           fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    val json = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val schema = inferSchema(json)
    val rows = parseRows(json, schema, fromSrid, reproject)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  /** Many .geojson files parsed on executors, one per task. Each task
    * streams its file (token-level parse, per-feature decode) — task memory
    * stays flat regardless of file size. */
  def readDir(spark: SparkSession, dir: String,
              fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".geojson")).sorted.toSeq
    require(files.nonEmpty, s"no .geojson files under $dir")
    val schema = inferSchemaStream(() => Files.newInputStream(Paths.get(files.head)))
    val rdd = spark.sparkContext.parallelize(files, files.length).flatMap { f =>
      parseRowsStream(() => new java.io.BufferedInputStream(
        Files.newInputStream(Paths.get(f)), 1 << 20), schema, fromSrid, reproject)
    }
    spark.createDataFrame(rdd, schema)
  }
}
