package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial autocorrelation — global Moran's I over the 64x64 cell lattice
  * (the ESDA hot-spot statistic: is the entity-density surface clustered,
  * dispersed, or random?). The reference stops at loading geometry; this
  * is the first analytics layer a web-extraction atlas runs on top
  * (PySAL/GeoDa compute the identical statistic single-node).
  *
  * Integer-exact formulation: with T = total points and N = 4096 lattice
  * cells, the deviation z_i = n_i - T/N is fractional — so both engines
  * work with Z_i = N*n_i - T (the deviation scaled by N, an exact BIGINT;
  * sum(Z) == 0 by construction). The N^2 factor cancels in Moran's ratio:
  * I = (N / W) * sum_w(Z_i Z_j) / sum(Z_i^2). The query emits the exact
  * integer numerators (n_cells, t, sum_z2, w_sum, sum_wzz) and leaves the
  * one float division to the consumer — the driver hash stays exact.
  *
  * Weights: queen (8-neighbor) contiguity, w_ij = 1, lattice-bounded
  * (edge cells have 3/5 neighbors — encoded by the join miss, no CASE).
  *
  * Scale shape: ONE map-side-combinable groupBy over the points is the
  * only fact-table exchange; everything after runs on <= N rows (the
  * lattice is a config constant, not data-sized), with the neighbor step
  * a broadcast self-join. At 10^12 points this is scan + one exchange.
  */
object SpatialStats {

  val Grid = 64
  val NCells: Long = (Grid * Grid).toLong

  private def cellX(lon: Column): Column =
    greatest(lit(0L), least(lit(Grid - 1L), floor((lon + 180.0) / 360.0 * Grid).cast("long")))
  private def cellY(lat: Column): Column =
    greatest(lit(0L), least(lit(Grid - 1L), floor((lat + 90.0) / 180.0 * Grid).cast("long")))

  /** One row: (n_cells, t, sum_z2, w_sum, sum_wzz) — all BIGINT, exact. */
  def moranNumerators(spark: SparkSession, ents: DataFrame): DataFrame = {
    val counts = ents.select(cellX(col("lon")).as("cx"), cellY(col("lat")).as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n"))
    val lattice = spark.range(NCells)
      .select((col("id") / Grid).cast("long").as("cx"), (col("id") % Grid).as("cy"))
    val tot = ents.agg(count(lit(1)).as("t"))
    val cells = Scalars.join(
      lattice.join(counts, Seq("cx", "cy"), "left").na.fill(0L, Seq("n")), tot)
      .select(col("cx"), col("cy"), col("t"), (lit(NCells) * col("n") - col("t")).as("z"))
    val zOnly = cells.select(col("cx"), col("cy"), col("z"))
    val offsets = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    val nb = zOnly
      .select(col("cx"), col("cy"), col("z").as("zi"),
        explode(array(offsets.map { case (dx, dy) =>
          struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
        }: _*)).as("o"))
      .select((col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"), col("zi"))
    val pairAgg = nb.join(broadcast(zOnly), Seq("cx", "cy"))
      .agg(count(lit(1)).as("w_sum"), sum(col("zi") * col("z")).as("sum_wzz"))
    val cellAgg = cells.agg(count(lit(1)).as("n_cells"), max(col("t")).as("t"),
      sum(col("z") * col("z")).as("sum_z2"))
    Scalars.join(cellAgg, pairAgg)
      .select("n_cells", "t", "sum_z2", "w_sum", "sum_wzz")
  }

  /** DuckDB replica: same lattice, same scaled deviations, same queen
    * join; the five scalars come back as one row. */
  def moranNumeratorsSql(entsCte: String, lonExpr: String, latExpr: String): String = {
    val cx = s"greatest(0, least(${Grid - 1}, CAST(floor(($lonExpr + 180.0) / 360.0 * $Grid) AS BIGINT)))"
    val cy = s"greatest(0, least(${Grid - 1}, CAST(floor(($latExpr + 90.0) / 180.0 * $Grid) AS BIGINT)))"
    s"""WITH $entsCte,
       | pts AS (SELECT $cx AS cx, $cy AS cy FROM ents e),
       | counts AS (SELECT cx, cy, count(*) AS n FROM pts GROUP BY 1, 2),
       | lat AS (SELECT i // $Grid AS cx, i % $Grid AS cy
       |   FROM (SELECT unnest(range($NCells)) AS i)),
       | tot AS (SELECT count(*) AS t FROM pts),
       | z AS (SELECT l.cx, l.cy, $NCells * coalesce(c.n, 0) - t.t AS z
       |   FROM lat l LEFT JOIN counts c ON l.cx = c.cx AND l.cy = c.cy CROSS JOIN tot t),
       | offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
       |   AS o(dx, dy)),
       | pairs AS (SELECT a.z AS zi, b.z AS zj FROM z a CROSS JOIN offs o
       |   JOIN z b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy)
       | SELECT CAST((SELECT count(*) FROM z) AS BIGINT) AS n_cells,
       |   CAST((SELECT t FROM tot) AS BIGINT) AS t,
       |   CAST((SELECT sum(z * z) FROM z) AS BIGINT) AS sum_z2,
       |   CAST((SELECT count(*) FROM pairs) AS BIGINT) AS w_sum,
       |   CAST((SELECT sum(zi * zj) FROM pairs) AS BIGINT) AS sum_wzz"""
      .stripMargin.replace("\n", " ")
  }
}
