package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Centrography (PySAL `pointpats.centrography`): per-class first- and
  * second-moment numerators of the point cloud — mean center, standard
  * distance, and the standard deviational ellipse are all closed-form
  * functions of (n, sum_x, sum_y, sxx, syy, sxy), so the query emits
  * those exact BIGINT sums and leaves the divisions/atan2 to the
  * consumer, keeping the driver hash exact.
  *
  * Scale shape: ONE map-side-combinable groupBy over the fact table —
  * the cheapest possible distributed statistic. Overflow bound: lattice
  * coords < 7200, so sxx < 5.2e7 * n; ANSI mode faults (not wraps) past
  * ~1.7e11 points per class — switch the sums to decimal(38,0) beyond
  * that. */
object Centrography {

  /** @param pts rows with (clsCol, lonm, latm)
    * @return per class: n, sum_x, sum_y, sxx, syy, sxy — all BIGINT */
  def summary(pts: DataFrame, clsCol: String = "lang"): DataFrame =
    pts.groupBy(clsCol).agg(
      count(lit(1)).as("n"),
      sum("lonm").as("sum_x"),
      sum("latm").as("sum_y"),
      sum(col("lonm") * col("lonm")).as("sxx"),
      sum(col("latm") * col("latm")).as("syy"),
      sum(col("lonm") * col("latm")).as("sxy"))

  /** DuckDB replica (sum(BIGINT) is HUGEINT — cast back). */
  def summarySql(entsCte: String): String =
    s"""WITH $entsCte
       | SELECT lang, count(*) AS n,
       |   CAST(sum(lonm) AS BIGINT) AS sum_x,
       |   CAST(sum(latm) AS BIGINT) AS sum_y,
       |   CAST(sum(lonm * lonm) AS BIGINT) AS sxx,
       |   CAST(sum(latm * latm) AS BIGINT) AS syy,
       |   CAST(sum(lonm * latm) AS BIGINT) AS sxy
       | FROM ents e GROUP BY lang"""
      .stripMargin.replace("\n", " ")
}
