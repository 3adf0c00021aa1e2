package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Layers, WebPagesSynth}
import graft.ops.{EntityExtract, KnnJoin, PipJoin, TileAssign}

/** The flagship spatial pipeline (north rule): web pages -> geo-entity
  * extraction -> cell index -> point-in-polygon resolve (broadcast covering
  * index) -> kNN POIs -> tile assignment. One narrow stage end-to-end after
  * the scans: the polygon and POI layers are broadcast dims, so the
  * 10^12-row page side never shuffles; `text` survives byte-identical.
  */
object Pipeline {
  val CellLevel = 6
  val TileZ = 8
  val K = 3

  def entities(spark: SparkSession, sfDir: String): DataFrame =
    EntityExtract.entities(WebPagesSynth.pages(spark, sfDir))

  /** Full pipeline: entity rows enriched with poly_id, kNN ranks, tiles. */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val ents = entities(spark, sfDir)
    val withPoly = PipJoin.broadcastJoin(spark, ents, Layers.polygons(spark, sfDir), CellLevel)
    val withKnn = KnnJoin.broadcastKnn(spark, withPoly, Layers.pois(spark, sfDir), K, CellLevel)
    TileAssign.assign(withKnn, TileZ)
  }

  /** Bench variant: pages amplified `rep`x by replicating the documents
    * table with shifted doc_ids (same formulas => same skew profile), so
    * sf0.1's 5k docs become millions of pages. */
  def entitiesAmplified(spark: SparkSession, sfDir: String, rep: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val amplified = docs
      .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("doc_id", col("doc_id") * rep + col("rep"))
      .drop("rep")
    val d = col("doc_id")
    val markers = concat_ws(" ",
      transform(sequence(lit(0), WebPagesSynth.nEnts(d) - 1), k =>
        concat(lit("GEO("), WebPagesSynth.lonm(d, k).cast("string"), lit(";"),
          WebPagesSynth.latm(d, k).cast("string"), lit(")"))))
    val pages = amplified.select(
      WebPagesSynth.urlOf(d).as("url"),
      concat(col("text"), lit(" "), markers).as("text"),
      col("lang"))
    EntityExtract.entities(pages)
  }

  def runAmplified(spark: SparkSession, sfDir: String, rep: Int): DataFrame = {
    val ents = entitiesAmplified(spark, sfDir, rep)
    val withPoly = PipJoin.broadcastJoin(spark, ents, Layers.polygons(spark, sfDir), CellLevel)
    val withKnn = KnnJoin.broadcastKnn(spark, withPoly, Layers.pois(spark, sfDir), K, CellLevel)
    TileAssign.assign(withKnn, TileZ)
  }
}
