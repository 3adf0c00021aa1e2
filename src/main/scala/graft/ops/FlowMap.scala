package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.WebPagesSynth

/** Origin-destination flow aggregation (the flow-map / spatial-interaction
  * primitive): each link-graph edge becomes a (source cell -> destination
  * cell) flow on the 64x64 lattice, counted per cell pair — the OD matrix
  * gravity models and flow maps consume. A document's location is its
  * first extracted geo-entity (k = 0 exists for every page: nEnts >= 1).
  *
  * Scale shape: the location table is ONE row per document (a projection
  * of the scan — no exchange to build); edges equi-join it twice on
  * doc_id (plain shuffled hash joins — both sides are |V|- and |E|-sized,
  * nothing broadcastable at web scale, AQE handles skewed hubs), then ONE
  * map-side-combinable groupBy on the four cell keys, whose output is
  * bounded by the 4096^2 cell-pair space regardless of edge count. */
object FlowMap {

  private def cell64(v: Column, off: Double, span: Double): Column =
    greatest(lit(0L), least(lit(63L), floor((v + off) / span * 64.0).cast("long")))

  /** q129 entry: OD flows of the synthetic link graph over 64x64 cells.
    * Output: (scx, scy, dcx, dcy, flows), all BIGINT. */
  def odFlows(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lon0 = WebPagesSynth.lonm(col("doc_id"), lit(0L)) / 20.0 - 180.0
    val lat0 = WebPagesSynth.latm(col("doc_id"), lit(0L)) / 20.0 - 70.0
    val loc = docs.select(col("doc_id"),
      cell64(lon0, 180.0, 360.0).as("cx"), cell64(lat0, 90.0, 180.0).as("cy"))
    LinkGraph.synthEdges(docs)
      .join(loc.select(col("doc_id").as("src"), col("cx").as("scx"), col("cy").as("scy")), "src")
      .join(loc.select(col("doc_id").as("dst"), col("cx").as("dcx"), col("cy").as("dcy")), "dst")
      .groupBy("scx", "scy", "dcx", "dcy")
      .agg(count(lit(1)).as("flows"))
  }

  /** DuckDB replica: same closed-form edges, same k=0 location, same
    * clamped 64-cell math. */
  def odFlowsSql(): String = {
    val lon0 = s"(${WebPagesSynth.lonmSql("0")} / 20.0 - 180.0)"
    val lat0 = s"(${WebPagesSynth.latmSql("0")} / 20.0 - 70.0)"
    val cx = s"greatest(0, least(63, CAST(floor(($lon0 + 180.0) / 360.0 * 64.0) AS BIGINT)))"
    val cy = s"greatest(0, least(63, CAST(floor(($lat0 + 90.0) / 180.0 * 64.0) AS BIGINT)))"
    s"""WITH nn AS (SELECT count(*) AS n_docs FROM documents),
       | e AS (SELECT DISTINCT src, dst FROM (
       |   SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 17 + 7) % nn.n_docs AS dst
       |   FROM documents d, nn, (SELECT unnest(range(6)) AS j) j
       |   WHERE j.j <= 2 + d.doc_id % 3) WHERE src <> dst),
       | loc AS (SELECT doc_id, $cx AS cx, $cy AS cy FROM documents),
       | j AS (SELECT a.cx AS scx, a.cy AS scy, b.cx AS dcx, b.cy AS dcy
       |   FROM e JOIN loc a ON a.doc_id = e.src JOIN loc b ON b.doc_id = e.dst)
       | SELECT scx, scy, dcx, dcy, count(*) AS flows
       | FROM j GROUP BY 1, 2, 3, 4"""
      .stripMargin.replace("\n", " ")
  }
}
