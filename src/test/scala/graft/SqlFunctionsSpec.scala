package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.WkbCodec
import graft.index.{CellGrid, Tiles}
import graft.ops.GraftFunctions

class SqlFunctionsSpec extends AnyFunSuite with SparkTest {

  private lazy val registered = { GraftFunctions.register(spark); true }

  test("pure-math st_* functions match the Scala implementations and codegen") {
    assert(registered)
    val rows = spark.sql(
      """SELECT st_cell_x(20.5, 6) AS cx, st_cell_y(0.5, 6) AS cy,
        |       st_cell_id(20.5, 0.5, 6) AS cid,
        |       st_tile_x(-87.65, 13) AS tx, st_tile_y(41.85, 13) AS ty,
        |       st_merc_x(180.0) AS mx, st_merc_y(0.0) AS my""".stripMargin).collect()(0)
    assert(rows.getLong(0) === CellGrid.cellX(20.5, 6))
    assert(rows.getLong(1) === CellGrid.cellY(0.5, 6))
    assert(rows.getLong(2) === CellGrid.cellId(20.5, 0.5, 6))
    assert(rows.getLong(3) === 2101L && rows.getLong(4) === 3045L)
    assert(math.abs(rows.getDouble(5) - 20037508.342789244) < 1e-6)
    assert(math.abs(rows.getDouble(6)) < 1e-8)
  }

  test("constant folding: literal-only st_cell_id folds to a literal in the plan") {
    assert(registered)
    val plan = spark.sql("SELECT st_cell_id(20.5, 0.5, 6) AS c").queryExecution.optimizedPlan
    assert(plan.expressions.map(_.toString).exists(_.contains(CellGrid.cellId(20.5, 0.5, 6).toString)))
  }

  test("JTS-backed st_* functions: geojson decode, type, wkt, transform, contains") {
    assert(registered)
    import spark.implicits._
    val df = Seq("""{"type":"Point","coordinates":[1,2]}""").toDF("gj")
    df.createOrReplaceTempView("gjv")
    val r = spark.sql(
      """SELECT st_geometrytype(st_geomfromgeojson(gj)) AS t,
        |       st_astext(st_geomfromgeojson(gj)) AS wkt,
        |       st_astext(st_transform(st_geomfromgeojson(gj), 4326, 3857)) AS wkt3857,
        |       st_contains(st_geomfromgeojson('{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'),
        |                   st_point(1.0, 2.0)) AS inside,
        |       st_contains(st_geomfromgeojson('{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}'),
        |                   st_point(9.0, 9.0)) AS outside
        |FROM gjv""".stripMargin).collect()(0)
    assert(r.getString(0) === "Point")
    assert(r.getString(1) === "POINT (1 2)")
    assert(r.getString(2).startsWith("POINT (111319.49"))
    assert(r.getBoolean(3) === true && r.getBoolean(4) === false)
  }

  test("st_* available through the extensions injection point") {
    // verify the class wires up without error (full two-session test would
    // need a second SparkContext; the builder path is exercised here)
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw
  }

  test("OGC-ish geometry function library") {
    assert(registered)
    val r = spark.sql(
      """SELECT st_area(g) AS area, st_length(g) AS len, st_npoints(g) AS np,
        |       st_isvalid(g) AS v, st_astext(st_centroid(g)) AS c,
        |       st_geometrytype(st_envelope(g)) AS env,
        |       st_x(st_point(3.0, 4.0)) AS px, st_y(st_point(3.0, 4.0)) AS py,
        |       st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)) AS d,
        |       st_intersects(g, st_point(1.0, 1.0)) AS i,
        |       st_within(st_point(1.0, 1.0), g) AS w,
        |       st_area(st_buffer(st_point(0.0, 0.0), 1.0)) > 3.0 AS buf
        |FROM (SELECT st_geomfromgeojson('{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}') AS g)"""
        .stripMargin).collect()(0)
    assert(r.getDouble(0) === 4.0)
    assert(r.getDouble(1) === 8.0)
    assert(r.getLong(2) === 5L)
    assert(r.getBoolean(3))
    assert(r.getString(4) === "POINT (1 1)")
    assert(r.getString(5) === "Polygon")
    assert(r.getDouble(6) === 3.0 && r.getDouble(7) === 4.0)
    assert(r.getDouble(8) === 5.0)
    assert(r.getBoolean(9) && r.getBoolean(10) && r.getBoolean(11))
  }

  test("SpatialFilterPushdown: constant-polygon filter pushes a bbox into the parquet scan") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.{GraftShim => GS}
    import graft.ops.{SpatialFilterPushdown, SqlFunctions}
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pushdown").toString
    (1 to 1000).map(i => (i.toLong, (i % 20) - 5.0, ((i * 7) % 20) - 5.0))
      .toDF("id", "lon", "lat").write.mode("overwrite").parquet(s"$dir/pts")
    val pts = spark.read.parquet(s"$dir/pts")
    val polyWkb = WkbCodec.write(WkbCodec.polygon(
      Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))))
    def containsCol = GS.column(SqlFunctions.StContains(Literal(polyWkb),
      SqlFunctions.StPoint(GS.expression(col("lon")), GS.expression(col("lat")))))
    val baseline = pts.filter(containsCol).select("id").as[Long].collect().sorted
    val had = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = had :+ SpatialFilterPushdown
    try {
      val q = pts.filter(containsCol)
      val plan = q.queryExecution.executedPlan.toString
      // (the PushedFilters list is truncated in toString — assert the
      // leading entries plus the per-column DataFilters)
      assert(plan.contains("GreaterThanOrEqual(lon,0.0)") && plan.contains("LessThanOrEqual(lon,10.0)")
        && plan.contains("GreaterThanOrEqual(lat,0.0)"),
        s"bbox not pushed to scan:\n$plan")
      assert(plan.contains("st_contains_exact"), "exact JTS check must remain")
      assert(q.select("id").as[Long].collect().sorted.toSeq === baseline.toSeq)
      assert(baseline.nonEmpty) // the test must actually select something
    } finally spark.experimental.extraOptimizations = had
  }
}
