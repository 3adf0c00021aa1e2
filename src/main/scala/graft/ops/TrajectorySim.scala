package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trajectory similarity join — discrete symmetric Hausdorff distance
  * between point trails (the ST_HausdorffDistance / trajectory-clustering
  * primitive): H(A,B) = max( max_a min_b d(a,b), max_b min_a d(a,b) ),
  * computed on squared lattice distances so every value is exact BIGINT.
  *
  * Candidate generation is the eps-block discipline: trails are paired
  * only when their FIRST points share a `Block`-sized lattice cell — a
  * plain equi-join on (bx, by), each unordered pair emitted exactly once
  * via the url ordering, never an all-pairs product. That co-started
  * restriction IS the query semantics (compare trails from the same
  * origin area), not an approximation of a global join.
  *
  * One-pass max-of-mins: rather than materializing the pair-point table
  * for two directed passes, each (pair, point-point) row is exploded into
  * its two side tags (ia*2 on the A side, ib*2+1 on the B side — disjoint
  * by parity, and a plain BIGINT so the hottest stream of the query never
  * allocates a string key); min(d2) per (pair, side) is the per-point
  * nearest distance in EITHER direction, and max over sides is exactly
  * the symmetric Hausdorff. Both groupBys are map-side combinable, and
  * the x2 explode happens before the partial aggregate.
  *
  * Scale shape: the fanout is bounded by (trails per block)^2 x (points
  * per trail)^2 — block size is the operator's skew knob, same as eps in
  * [[PointPattern.dbscan]]; the joins are hash equi-joins end to end.
  */
object TrajectorySim {

  /** Start-cell block edge in lattice units (120 u = 6 degrees). */
  val Block = 120L

  /** @param pts rows of (`keyCol`, `seqCol`, lonm, latm) — integer lattice
    *            coordinates, `seqCol` = 0 marks the trail start
    * @return (url_a, url_b, n_sides, h2): co-started trail pairs with
    *         point-count sum and squared symmetric Hausdorff, all BIGINT */
  def hausdorffPairs(pts: DataFrame, keyCol: String = "url",
                     seqCol: String = "ent_idx"): DataFrame = {
    val starts = pts.filter(col(seqCol) === lit(0))
      .select(col(keyCol).as("u"),
        expr(s"lonm div ${Block}L").as("bx"), expr(s"latm div ${Block}L").as("by"))
    val pairs = starts.as("a").join(starts.as("b"),
        col("a.bx") === col("b.bx") && col("a.by") === col("b.by") &&
          col("a.u") < col("b.u"))
      .select(col("a.u").as("url_a"), col("b.u").as("url_b"))
    val pa = pts.select(col(keyCol).as("url_a"), col(seqCol).as("ia"),
      col("lonm").as("ax"), col("latm").as("ay"))
    val pb = pts.select(col(keyCol).as("url_b"), col(seqCol).as("ib"),
      col("lonm").as("bx"), col("latm").as("by"))
    val dx = col("ax") - col("bx")
    val dy = col("ay") - col("by")
    pairs.join(pa, "url_a").join(pb, "url_b")
      .select(col("url_a"), col("url_b"), (dx * dx + dy * dy).as("d2"),
        explode(array(col("ia") * 2, col("ib") * 2 + 1)).as("side"))
      .groupBy("url_a", "url_b", "side").agg(min("d2").as("m"))
      .groupBy("url_a", "url_b")
      .agg(count(lit(1)).as("n_sides"), max("m").as("h2"))
  }

  /** DuckDB replica: same start-block pairing, same squared distances,
    * same side-tagged max-of-mins. */
  def hausdorffPairsSql(entsCte: String): String =
    s"""WITH $entsCte,
       | pt AS (SELECT url, ent_idx, lonm, latm FROM ents e),
       | st AS (SELECT url, lonm // $Block AS bx, latm // $Block AS by
       |   FROM pt WHERE ent_idx = 0),
       | prs AS (SELECT a.url AS ua, b.url AS ub FROM st a JOIN st b
       |   ON a.bx = b.bx AND a.by = b.by AND a.url < b.url),
       | pp AS (SELECT p.ua, p.ub, pa.ent_idx AS ia, pb.ent_idx AS ib,
       |     (pa.lonm - pb.lonm) * (pa.lonm - pb.lonm)
       |       + (pa.latm - pb.latm) * (pa.latm - pb.latm) AS d2
       |   FROM prs p JOIN pt pa ON pa.url = p.ua JOIN pt pb ON pb.url = p.ub),
       | sides AS (SELECT ua, ub, ia * 2 AS side, min(d2) AS m
       |     FROM pp GROUP BY 1, 2, 3
       |   UNION ALL
       |   SELECT ua, ub, ib * 2 + 1 AS side, min(d2) AS m
       |     FROM pp GROUP BY 1, 2, 3)
       | SELECT ua AS url_a, ub AS url_b, count(*) AS n_sides,
       |   CAST(max(m) AS BIGINT) AS h2
       | FROM sides GROUP BY 1, 2"""
      .stripMargin.replace("\n", " ")
}
