package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GridCluster

class GridClusterSpec extends AnyFunSuite with SparkTest {

  /** Local reference: same cell formula, union-find over 8-adjacent dense
    * cells, label = component min packed key, sparse = -1. */
  private def brute(pts: Seq[(Double, Double)], level: Int, minPts: Int): Seq[Long] = {
    val n = 1L << level
    def cx(lon: Double) = math.max(0L, math.min(n - 1, math.floor((lon + 180.0) / 360.0 * n).toLong))
    def cy(lat: Double) = math.max(0L, math.min(n - 1, math.floor((lat + 90.0) / 180.0 * n).toLong))
    val keys = pts.map { case (lon, lat) => cx(lon) * n + cy(lat) }
    val dense = keys.groupBy(identity).filter(_._2.size >= minPts).keySet
    val parent = scala.collection.mutable.Map[Long, Long](dense.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    for (k <- dense; dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) {
      val x = k / n + dx; val y = k % n + dy
      val nk = x * n + y
      if (x >= 0 && x < n && y >= 0 && y < n && dense(nk)) union(k, nk)
    }
    // path-compress to the true min: find walks to the root, and union
    // keeps the smaller root, so the root IS the component min
    keys.map(k => if (dense(k)) find(k) else -1L)
  }

  private def run(pts: Seq[(Double, Double)], level: Int, minPts: Int): Seq[Long] = {
    import spark.implicits._
    val df = pts.zipWithIndex.map { case ((lon, lat), i) => (i.toLong, lon, lat) }
      .toDF("id", "lon", "lat")
    GridCluster.cluster(df, "lon", "lat", level, minPts.toLong)
      .select("id", "cluster").as[(Long, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
  }

  test("planted fixture == local union-find reference (merge, noise, isolation)") {
    // level 4: 16x16 cells of 22.5 x 11.25 degrees
    val cell = (cx: Int, cy: Int, j: Int) =>
      (-180.0 + cx * 22.5 + 1.0 + j * 0.1, -90.0 + cy * 11.25 + 1.0 + j * 0.1)
    val pts =
      // two 8-adjacent dense cells (diagonal) -> must merge
      (0 until 4).map(j => cell(3, 3, j)) ++ (0 until 4).map(j => cell(4, 4, j)) ++
      // an edge-adjacent pair -> must merge
      (0 until 3).map(j => cell(8, 8, j)) ++ (0 until 3).map(j => cell(8, 9, j)) ++
      // an isolated dense cell (gap of one sparse cell) -> own cluster
      (0 until 5).map(j => cell(8, 11, j)) ++
      // sparse cells -> noise
      Seq(cell(1, 1, 0), cell(12, 2, 0), cell(12, 2, 1))
    val got = run(pts, 4, 3)
    val want = brute(pts, 4, 3)
    assert(got === want)
    // shape assertions, independent of the reference
    assert(got.take(8).distinct.size === 1, "diagonal dense cells must merge")
    assert(got.slice(8, 14).distinct.size === 1, "edge-adjacent dense cells must merge")
    assert(got.slice(14, 19).distinct.size === 1)
    assert(got.slice(14, 19).head !== got.slice(8, 14).head, "gap must separate clusters")
    assert(got.takeRight(3).forall(_ === -1L), "sparse cells are noise")
  }

  test("pseudo-random corpus == reference at two (level, minPts) settings") {
    val pts = (0 until 400).map { i =>
      (((i * 131 + 17) % 720) / 2.0 - 180.0, ((i * 197 + 5) % 360) / 2.0 - 90.0)
    }
    for ((level, minPts) <- Seq((3, 2), (5, 3)))
      assert(run(pts, level, minPts) === brute(pts, level, minPts),
        s"level=$level minPts=$minPts")
  }

  test("q106 at sf0.001: urban square spans two dense lat cells, one label") {
    val out = SparkEntry.queries("q106_grid_cluster")(spark, Sf)
    val labels = out.filter(col("cluster") =!= -1L)
      .select("cluster").distinct().collect().map(_.getLong(0))
    // the urban component's label is its min cell key: cx=142, cy=128
    assert(labels.contains(142L * 256 + 128))
    // and it really merged two cells: dense points on BOTH sides of the
    // level-8 lat boundary at 0.703125 carry the same label
    val ents = Pipeline.entities(spark, Sf)
      .select(col("url"), col("ent_idx"), col("lon"), col("lat"))
    val urban = GridCluster.cluster(ents, "lon", "lat",
        GridCluster.DefaultLevel, GridCluster.DefaultMinPts)
      .filter(col("cluster") === 142L * 256 + 128)
    assert(urban.filter(col("lat") < 0.703125).count() >= 3)
    assert(urban.filter(col("lat") >= 0.703125).count() >= 3)
  }
}
