package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analysis over the document corpus — PageRank, the canonical
  * web-scale quality prior for training-data curation.
  *
  * Determinism: the whole computation is INTEGER arithmetic, so it is
  * hash-checked against a DuckDB replica. Ranks are scaled by [[Scale]];
  * the two float-looking steps are IEEE double ops on exact integers that
  * both engines execute identically (floor(pr / outdeg): the operands are
  * exact, the division is correctly rounded, so both engines floor the
  * same double; floor(0.85 * s): same argument), and every SUM is over
  * BIGINTs — order-independent, unlike a float PageRank whose partial-sum
  * order makes cross-engine hashing impossible.
  *
  * Shape per iteration (the canonical distributed PageRank): contributions
  * = one equi-join of the rank vector with the edge list on src (edges
  * pre-partitioned once, ranks re-shuffled per round), then one
  * partial-aggregating groupBy on dst. Nothing driver-side, no adjacency
  * materialized per node. Fixed iteration count keeps the lineage shallow
  * (5 rounds); at larger R cut it with localCheckpoint like
  * [[Dedup.components]] does per round.
  *
  * The synthetic edge list is closed-form from doc_id (deterministic k-out
  * graph, self-loops removed, duplicates deduped) so the oracle re-derives
  * it from the same formula.
  */
object LinkGraph {

  /** Rank fixed-point scale (1.0 == 1e6). */
  val Scale = 1000000L
  /** Damping 0.85 as (teleport, damp) integer/double pair. */
  val Teleport = 150000L // floor(0.15 * Scale)

  /** Closed-form k-out link graph over the documents table:
    * doc i links to (i * 31 + j * 17 + 7) % N for j in 0..2 + i % 3,
    * self-loops dropped, duplicate targets deduped. */
  def synthEdges(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    Scalars.join(docs.select(col("doc_id")), n)
      .select(col("doc_id").as("src"),
        explode(sequence(lit(0L), lit(2L) + col("doc_id") % 3)).as("j"),
        col("n_docs"))
      .select(col("src"), ((col("src") * 31 + col("j") * 17 + 7) % col("n_docs")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** `iters` rounds of integer PageRank over (src, dst) edges; every node
    * in `nodes` gets a rank (teleport-only if nothing links to it).
    * Output: (doc_id, pr) — BIGINT scaled by [[Scale]]. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // materialize the (src, dst, deg) table once: every iteration probes
    // it, and without the cut the edge synthesis + degree groupBy replay
    // `iters` times (lineage also stays flat across rounds)
    val e = edges.join(outdeg, "src").localCheckpoint()
    var pr = nodes.select(col("doc_id"), lit(Scale).as("pr"))
    for (_ <- 1 to iters) {
      val sums = e.join(pr, e("src") === pr("doc_id"))
        .select(col("dst"), floor(col("pr") / col("deg")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      pr = nodes.select(col("doc_id"))
        .join(sums, nodes("doc_id") === sums("dst"), "left")
        .select(col("doc_id"),
          (lit(Teleport) + floor(lit(0.85) * coalesce(col("s"), lit(0L))).cast("long")).as("pr"))
    }
    pr
  }

  /** q86 entry: PageRank over the synthetic link graph of `documents`. */
  def docPageRank(spark: SparkSession, sfDir: String, iters: Int = 5): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    pageRank(docs.select("doc_id"), synthEdges(docs), iters)
  }

  /** DuckDB replica: edges from the same closed form, `iters` chained
    * rank CTEs, identical integer/floor op sequence. */
  def pageRankSql(iters: Int = 5): String = {
    val base =
      s"""nodes AS (SELECT doc_id FROM documents),
         | nn AS (SELECT count(*) AS n_docs FROM documents),
         | e AS (SELECT DISTINCT src, dst FROM (
         |   SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 17 + 7) % nn.n_docs AS dst
         |   FROM documents d, nn, (SELECT unnest(range(6)) AS j) j
         |   WHERE j.j <= 2 + d.doc_id % 3) WHERE src <> dst),
         | od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         | pr0 AS (SELECT doc_id, CAST($Scale AS BIGINT) AS pr FROM nodes)"""
    val rounds = (1 to iters).map { k =>
      s"""pr$k AS (SELECT n.doc_id,
         |   $Teleport + CAST(floor(0.85 * COALESCE(s.s, 0)) AS BIGINT) AS pr
         | FROM nodes n LEFT JOIN (
         |   SELECT e.dst AS doc_id, sum(CAST(floor(p.pr / od.deg) AS BIGINT)) AS s
         |   FROM pr${k - 1} p JOIN od ON od.src = p.doc_id JOIN e ON e.src = p.doc_id
         |   GROUP BY e.dst) s ON s.doc_id = n.doc_id)"""
    }
    (Seq("WITH " + base) ++ rounds).mkString(", ")
      .stripMargin.replace("\n", " ") + s" SELECT doc_id, pr FROM pr$iters"
  }
}
