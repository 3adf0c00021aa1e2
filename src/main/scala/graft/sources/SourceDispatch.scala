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
}
