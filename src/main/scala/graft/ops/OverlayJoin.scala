package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShim

/** Polygon–polygon `intersects` join (overlay): the geometry↔geometry
  * generalization of the reference's per-feature pipeline, shaped for
  * 10^12-row tables.
  *
  * Plan shape:
  *  1. each side computes its envelope once per row and EXPLODES to the
  *     grid cells the envelope covers at `level` (bbox cover — deliberately
  *     not the exact-refined cover, see the dedup rule);
  *  2. candidates equi-join on the cell key — a plain shuffle-on-key hash
  *     join (prunable, AQE-skew-splittable, salt-able like [[PipJoin]]);
  *  3. a candidate pair surviving in several shared cells is kept by
  *     exactly ONE task via the REPORTING-CELL rule: emit only from the
  *     cell containing the min corner of the two envelopes' intersection
  *     (`(max(axmin,bxmin), max(aymin,bymin))`). That corner lies in both
  *     bbox covers whenever the bboxes overlap, so every intersecting pair
  *     is emitted exactly once and the per-pair `distinct` shuffle — the
  *     usual cost of cover-join dedup — disappears into a per-row
  *     predicate;
  *  4. exact JTS `intersects` refines last (candidate order: cheap
  *     codegen'd cell equality first, geometry test only on survivors).
  */
object OverlayJoin {
  private def ex(c: Column) = GraftShim.expression(c)
  private def co(e: org.apache.spark.sql.catalyst.expressions.Expression) = GraftShim.column(e)

  private def xmin(g: Column) = co(SqlFunctions.StUnaryGeom(ex(g), "st_xmin", _.getEnvelopeInternal.getMinX,
    org.apache.spark.sql.types.DoubleType))
  private def ymin(g: Column) = co(SqlFunctions.StUnaryGeom(ex(g), "st_ymin", _.getEnvelopeInternal.getMinY,
    org.apache.spark.sql.types.DoubleType))
  private def bboxCells(g: Column, level: Int) = co(SqlFunctions.StBboxCells(ex(g), ex(lit(level))))
  private def cellAt(x: Column, y: Column, level: Int) = co(SqlFunctions.cellId(ex(x), ex(y), level))
  private def intersects(a: Column, b: Column) =
    co(SqlFunctions.StBinaryGeomPred(ex(a), ex(b), "st_intersects", (x, y) => x.intersects(y),
      org.apache.spark.sql.types.BooleanType))

  /** `a` and `b` are (idCol, `geom` WKB) frames; result is one row per
    * intersecting pair: (a_id, b_id). */
  def intersectsJoin(a: DataFrame, aIdCol: String, b: DataFrame, bIdCol: String,
                     level: Int): DataFrame = {
    def prep(df: DataFrame, idCol: String, p: String) =
      df.select(col(idCol).as(s"${p}_id"), col("geom").as(s"${p}_geom"),
          xmin(col("geom")).as(s"${p}_xmin"), ymin(col("geom")).as(s"${p}_ymin"),
          explode(bboxCells(col("geom"), level)).as(s"${p}_cell"))
    val ac = prep(a, aIdCol, "a")
    val bc = prep(b, bIdCol, "b")
    ac.join(bc, col("a_cell") === col("b_cell"))
      .filter(col("a_cell") ===
        cellAt(greatest(col("a_xmin"), col("b_xmin")),
               greatest(col("a_ymin"), col("b_ymin")), level))
      .filter(intersects(col("a_geom"), col("b_geom")))
      .select(col("a_id"), col("b_id"))
  }
}
