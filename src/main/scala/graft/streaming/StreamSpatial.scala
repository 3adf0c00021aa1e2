package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Pipeline
import graft.ops.EntityExtract
import graft.sources.Layers

/** The flagship spatial pipeline as a STREAM: extraction (regex +
  * posexplode), point-in-polygon resolve and kNN (native expressions over
  * broadcast dims — stream-static enrichment) and tile assignment are all
  * stateless column transforms, so the exact batch code path runs
  * unmodified under Structured Streaming: no state store, no watermark,
  * append mode. Continuous ingest of a 10^12-page table is `readStream`
  * on its landing dir -> this transform -> [[StreamIngest]]; the broadcast
  * covering index is built once per query start, exactly like the batch
  * job's once-per-job driver cost.
  */
object StreamSpatial {

  /** pages stream (url, text, lang, ...) -> enriched entity stream with
    * poly_ids / knn_pois arrays + tile columns; text byte-identical. */
  def enrich(spark: SparkSession, pagesStream: DataFrame, sfDir: String): DataFrame = {
    val containing = graft.ops.GeoExpressions.containingCol(
      spark, Layers.polygons(spark, sfDir), Pipeline.CellLevel)
    val knn = graft.ops.GeoExpressions.knnCol(
      spark, Layers.pois(spark, sfDir), Pipeline.K, Pipeline.CellLevel)
    Pipeline.enrichPrebuilt(EntityExtract.entities(pagesStream), containing, knn)
  }
}
