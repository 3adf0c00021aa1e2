package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftError

/** File-type dispatch (reference S8,
  * `/root/reference/src/format/common.rs:65-80`): extension -> reader;
  * unknown -> [[GraftError.UnsupportedFileExtension]]. OsmPBF inputs force
  * srid 4326 like the reference (`src/utils/cli.rs:64`). */
object SourceDispatch {

  sealed trait FileType
  case object Shapefile extends FileType
  case object GeoJson extends FileType
  case object OsmPbf extends FileType

  def determineFileType(path: String): FileType =
    path.toLowerCase match {
      case p if p.endsWith(".shp")     => Shapefile
      case p if p.endsWith(".geojson") => GeoJson
      case p if p.endsWith(".pbf")     => OsmPbf
      case _ => throw GraftError.UnsupportedFileExtension(path)
    }

  /** Arg validation per the reference (F4, `src/utils/validate.rs:6-34`):
    * input must exist, srid restricted to {4326, 3857}. */
  def validateArgs(input: String, srid: Int, reproject: Option[Int]): Unit = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(input)))
      throw GraftError.FailedValidation(s"input does not exist: $input")
    val ok = Set(4326, 3857)
    if (!ok(srid)) throw GraftError.FailedValidation(s"srid must be 4326 or 3857, got $srid")
    reproject.foreach(r =>
      if (!ok(r)) throw GraftError.FailedValidation(s"reproject must be 4326 or 3857, got $r"))
  }

  def read(spark: SparkSession, path: String,
           srid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    validateArgs(path, srid, reproject)
    determineFileType(path) match {
      case Shapefile => ShapefileReader.read(spark, path, srid, reproject)
      case GeoJson   => GeoJsonReader.read(spark, path, srid, reproject)
      case OsmPbf    =>
        // reference parity (`src/utils/cli.rs:64-66`): pbf is always 4326 and
        // `read_osmpbf` never reprojects (reproject only touches shp/geojson,
        // `shapefile.rs:159`/`geojson.rs:147`); fixed schema tags[] + geom
        OsmPbfReader.read(spark, path).select("tags", "geom")
    }
  }

  /** Many files of ONE format under a directory -> one DataFrame, parsed
    * on executors (the 100 TB ingest shape: files are the parallel unit;
    * PBF additionally parallelizes per blob inside each file). Mixed
    * formats in one dir are rejected — per-format schema rules differ. */
  def readDir(spark: SparkSession, dir: String,
              srid: Int = 4326, reproject: Option[Int] = None): DataFrame = {
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      throw GraftError.FailedValidation(s"not a directory: $dir")
    validateArgs(dir, srid, reproject)
    import scala.jdk.CollectionConverters._
    val kinds = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.toString)
      .flatMap(p => scala.util.Try(determineFileType(p)).toOption.map(t => (t, p)))
      .toSeq.groupBy(_._1)
    kinds.keySet.toList match {
      case Nil => throw GraftError.FailedValidation(s"no supported files under $dir")
      case List(Shapefile) => ShapefileReader.readDir(spark, dir, srid, reproject)
      case List(GeoJson)   => GeoJsonReader.readDir(spark, dir, srid, reproject)
      case List(OsmPbf)    =>
        kinds(OsmPbf).map(_._2).sorted
          .map(p => OsmPbfReader.read(spark, p).select("tags", "geom"))
          .reduce(_ unionAll _)
      case many => throw GraftError.FailedValidation(
        s"mixed formats under $dir: ${many.mkString(", ")}")
    }
  }
}
