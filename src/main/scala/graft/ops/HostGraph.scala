package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Host-graph contraction — the standard first reduction of a web crawl's
  * page-level link graph (the Common Crawl host/PLD graph pipeline):
  * collapse pages to their hosts and aggregate the page edges into
  * weighted host edges. Downstream link analysis (ranking, spam
  * detection) runs on the host graph because it is orders of magnitude
  * smaller and robust to per-page crawl noise; the intra-host diagonal
  * (self-edges after contraction) measures navigation-template density.
  *
  * Output per host pair: `n_links` (page-edge multiplicity) and
  * `n_src_pages` (distinct linking pages — the host-pair support,
  * robust against one template page emitting thousands of links).
  *
  * Scale shape: the host key is a ROW-LOCAL projection of the page id /
  * URL (no dim join anywhere), so the whole contraction is one
  * map-side-combinable groupBy over the edge list; the distinct-support
  * count is the standard two-level exact distinct (groupBy the pair+src
  * first). Output is host²-bounded, never page-bounded. The synthetic
  * URL scheme plants a hot host (1/7 of all pages) so the contracted
  * graph exhibits the hub skew the host graph exists to expose. */
object HostGraph {

  /** Row-local host of a page id — mirrors `WebPagesSynth.urlOf`. */
  def hostOf(d: Column): Column =
    when(d % 7 === 0, lit("hot.example.com"))
      .otherwise(concat(lit("d"), (d % 40).cast("string"), lit(".example.com")))

  /** @return (src_host, dst_host, n_links, n_src_pages). */
  def contract(edges: DataFrame): DataFrame =
    edges.select(hostOf(col("src")).as("src_host"),
        hostOf(col("dst")).as("dst_host"), col("src"))
      .groupBy("src_host", "dst_host", "src").agg(count(lit(1)).as("c"))
      .groupBy("src_host", "dst_host")
      .agg(sum("c").as("n_links"), count(lit(1)).as("n_src_pages"))

  /** q154 entry: host graph of the synthetic page-level link graph. */
  def docHostGraph(spark: SparkSession, sfDir: String): DataFrame =
    contract(LinkGraph.synthEdges(spark.read.parquet(s"$sfDir/documents.parquet")))

  /** DuckDB replica of [[docHostGraph]]. */
  def hostGraphSql(): String =
    s"""WITH nn AS (SELECT count(*) AS n_docs FROM documents),
       | e AS (SELECT DISTINCT src, dst FROM (
       |   SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 17 + 7) % nn.n_docs AS dst
       |   FROM documents d, nn, (SELECT unnest(range(6)) AS j) j
       |   WHERE j.j <= 2 + d.doc_id % 3) WHERE src <> dst),
       | h AS (SELECT CASE WHEN src % 7 = 0 THEN 'hot.example.com'
       |     ELSE 'd' || (src % 40) || '.example.com' END AS src_host,
       |   CASE WHEN dst % 7 = 0 THEN 'hot.example.com'
       |     ELSE 'd' || (dst % 40) || '.example.com' END AS dst_host,
       |   src FROM e),
       | p AS (SELECT src_host, dst_host, src, count(*) AS c FROM h
       |   GROUP BY 1, 2, 3)
       | SELECT src_host, dst_host, CAST(sum(c) AS BIGINT) AS n_links,
       |   count(*) AS n_src_pages
       | FROM p GROUP BY 1, 2"""
      .stripMargin.replace("\n", " ")
}
