package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.GraftError
import graft.geom.{Mercator, ShapeDecode, WkbCodec}
import graft.geom.ShapeDecode._

/** Shapefile source (reference S3/S4,
  * `/root/reference/src/format/shapefile.rs:127-174` scan, `:14-125`
  * schema inference). Parses the `.shp` (geometry) + `.dbf` (attributes)
  * pair from scratch — no GDAL on the classpath, and the format is fully
  * public (ESRI whitepaper).
  *
  * Reference semantics kept: DBF `N`(numeric)/`F`(float) -> DoubleType
  * (FLOAT8), `C` -> StringType, `L` -> BooleanType, `I`(binary int32 LE,
  * dbase 7/FoxPro) -> LongType (the reference's `FieldValue::Integer ->
  * INT8` wire type, `shapefile.rs:66-80`); other field types unsupported
  * and dropped with a warning (`shapefile.rs:111`); geometry
  * decoded per [[ShapeDecode]] quirks; optional 4326<->3857 reproject per
  * row (P3); WKB appended as the LAST column named `geom` (P6/K1).
  * Documented deviation: attribute columns are emitted in LEXICOGRAPHIC
  * order (the reference's HashMap order is nondeterministic — SURVEY §1.3).
  *
  * Scale note: one shapefile is capped at 2 GB by its 32-bit length field,
  * so a single file is inherently a driver-side (dim) read; parallelism at
  * 100 TB comes from MANY files — `readDir` distributes one file per task.
  */
object ShapefileReader {

  final case class DbfField(name: String, typ: Char, length: Int, decimals: Int)

  // ---- .dbf parsing ----
  def dbfFields(bytes: Array[Byte]): Seq[DbfField] = {
    val headerSize = ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff)
    (32 until (headerSize - 1) by 32).takeWhile(o => bytes(o) != 0x0d).map { o =>
      val name = new String(bytes, o, 11, "ASCII").takeWhile(_ != '\u0000').trim // NUL-padded field name
      DbfField(name, bytes(o + 11).toChar, bytes(o + 16) & 0xff, bytes(o + 17) & 0xff)
    }
  }

  def dbfRecords(bytes: Array[Byte]): Seq[Map[String, String]] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = b.getInt(4)
    val headerSize = b.getShort(8) & 0xffff
    val recSize = b.getShort(10) & 0xffff
    val fields = dbfFields(bytes)
    (0 until nRec).flatMap { i =>
      val off = headerSize + i * recSize
      if (bytes(off) == 0x2a) None // deleted record
      else {
        var p = off + 1
        Some(fields.map { f =>
          val raw = new String(bytes, p, f.length, "ISO-8859-1")
          p += f.length
          f.name -> raw
        }.toMap)
      }
    }
  }

  // ---- .shp parsing ----
  def shpShapes(bytes: Array[Byte]): Seq[Shape] = {
    val b = ByteBuffer.wrap(bytes)
    b.order(ByteOrder.BIG_ENDIAN)
    require(b.getInt(0) == 9994, "not a shapefile (bad magic)")
    val fileWords = b.getInt(24)
    val out = scala.collection.mutable.ArrayBuffer.empty[Shape]
    var off = 100
    while (off < fileWords * 2) {
      val contentWords = ByteBuffer.wrap(bytes, off + 4, 4).order(ByteOrder.BIG_ENDIAN).getInt
      // slice() rebases index 0 to the record content (wrap alone keeps
      // absolute indices relative to the whole file)
      val c = ByteBuffer.wrap(bytes, off + 8, contentWords * 2).slice().order(ByteOrder.LITTLE_ENDIAN)
      out += parseShape(c)
      off += 8 + contentWords * 2
    }
    out.toSeq
  }

  private[sources] def parseShape(c: ByteBuffer): Shape = c.getInt(0) match {
    case 0 => SNull
    case 1 => SPoint(c.getDouble(4), c.getDouble(12))
    case t @ (3 | 5) =>
      val numParts = c.getInt(36)
      val numPoints = c.getInt(40)
      val partsOff = 44
      val parts = (0 until numParts).map(i => c.getInt(partsOff + i * 4))
      val ptsOff = partsOff + numParts * 4
      def pt(i: Int) = (c.getDouble(ptsOff + i * 16), c.getDouble(ptsOff + i * 16 + 8))
      val bounds = parts :+ numPoints
      val rings = (0 until numParts).map(p => (bounds(p) until bounds(p + 1)).map(pt))
      if (t == 3) SPolyLine(rings) else SPolygon(rings)
    case t => SUnsupported(t)
  }

  // ---- schema inference (S4; header-driven — the reference's full record
  // scan is redundant for DBF, same resulting DDL) ----
  def inferSchema(dbfBytes: Array[Byte]): StructType = {
    val fields = dbfFields(dbfBytes).flatMap { f =>
      f.typ match {
        case 'N' | 'F' => Some(StructField(f.name, DoubleType, nullable = true))
        case 'C'       => Some(StructField(f.name, StringType, nullable = true))
        case 'L'       => Some(StructField(f.name, BooleanType, nullable = true))
        case 'I'       => Some(StructField(f.name, LongType, nullable = true))
        case other =>
          System.err.println(s"[shapefile] field '${f.name}' type '$other' not supported, dropped")
          None
      }
    }
    // documented deviation: lexicographic order (reference HashMap order is racy)
    StructType(fields.sortBy(_.name) :+ StructField("geom", BinaryType, nullable = true))
  }

  private[sources] def parseValue(raw: String, dt: DataType, colName: String): Any = dt match {
    case LongType =>
      // DBF 'I' is a BINARY little-endian int32; the bytes survive the
      // ISO-8859-1 round trip in dbfRecords losslessly (1 byte <-> 1 char)
      if (raw.length < 4) null
      else ((raw.charAt(0) & 0xff) | (raw.charAt(1) & 0xff) << 8 |
        (raw.charAt(2) & 0xff) << 16 | (raw.charAt(3) & 0xff) << 24).toLong
    case _ =>
      val s = raw.trim
      if (s.isEmpty || s == "?") null
      else try dt match {
        case DoubleType  => s.toDouble
        case StringType  => s
        case BooleanType => "TtYy".contains(s.head)
        case _           => null
      } catch {
        // malformed cell (e.g. text in a numeric DBF field): surface the
        // reference's type-conflict taxonomy, not a bare NumberFormatException
        case _: NumberFormatException => throw GraftError.MixedDataTypes(colName)
      }
  }

  /** In-place 4326<->3857 reprojection of every coordinate (P3). */
  private[sources] def projectInPlace(g: org.locationtech.jts.geom.Geometry,
                                      fromSrid: Int, to: Int): Unit = {
    g.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val (x, y) = Mercator.transform(c.x, c.y, fromSrid, to)
        c.x = x; c.y = y
      }
    })
    g.geometryChanged()
  }

  /** Executor-safe: parse one `.shp`+`.dbf` pair into Rows of `schema`. */
  def parseFileRows(shpPath: String, schema: StructType,
                    fromSrid: Int, reproject: Option[Int]): Seq[Row] = {
    val dbfPath = shpPath.dropRight(4) + ".dbf"
    val shpBytes = Files.readAllBytes(Paths.get(shpPath))
    val dbfBytes = Files.readAllBytes(Paths.get(dbfPath))
    val attrs = schema.fields.dropRight(1)
    val records = dbfRecords(dbfBytes)
    val shapes = shpShapes(shpBytes)
    require(records.length == shapes.length,
      s"shp/dbf record count mismatch: ${shapes.length} vs ${records.length}")
    shapes.zip(records).map { case (shape, rec) =>
      val geom = ShapeDecode.toGeometry(shape)
      val projected = (geom, reproject) match {
        case (null, _) | (_, None) => geom
        case (g, Some(to)) => projectInPlace(g, fromSrid, to); g
      }
      Row.fromSeq(attrs.map(f => parseValue(rec(f.name), f.dataType, f.name)).toSeq :+
        (if (projected == null) null else WkbCodec.write(projected)))
    }
  }

  /** Read one `.shp`+`.dbf` pair into a DataFrame.
    * @param reproject optional target srid (4326<->3857 only, like the
    *                  reference's CLI validation F4). */
  def read(spark: SparkSession, shpPath: String,
           fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    require(shpPath.endsWith(".shp"), s"expected .shp path: $shpPath")
    val schema = inferSchema(Files.readAllBytes(Paths.get(shpPath.dropRight(4) + ".dbf")))
    val rows = parseFileRows(shpPath, schema, fromSrid, reproject)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  /** Many shapefiles -> one DataFrame, parsed ON EXECUTORS one file per
    * task (the 100 TB path: a single shapefile is <= 2 GB by format, so
    * files are the parallel unit; schema from the first file's header). */
  def readDir(spark: SparkSession, dir: String,
              fromSrid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".shp")).sorted.toSeq
    require(files.nonEmpty, s"no .shp files under $dir")
    val schema = inferSchema(Files.readAllBytes(Paths.get(files.head.dropRight(4) + ".dbf")))
    val rdd = spark.sparkContext.parallelize(files, files.length)
      .flatMap(f => parseFileRows(f, schema, fromSrid, reproject))
    spark.createDataFrame(rdd, schema)
  }
}
