package graft.index

import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import graft.geom.WkbCodec

import scala.collection.mutable

/** Broadcastable polygon covering index (north-rule operator): each polygon
  * is covered by the grid cells (at `level`) its envelope intersects,
  * refined by an exact JTS intersection test; point lookups probe the
  * point's cell then refine with `PreparedGeometry.contains`. Dense cells
  * (many candidate polygons — the skewed "urban" case) get a per-cell
  * STRtree so a lookup is O(log n) in candidates, not O(n).
  *
  * Ships WKB over the wire (serializable, compact); prepared geometries and
  * trees are rebuilt lazily once per executor JVM (`@transient lazy val`).
  * This is the scale path for the reference's per-feature geometry pipeline
  * (`/root/reference/src/format/geo.rs:5-48`): the polygon side is the
  * broadcast dim, the point side streams through a narrow map — no shuffle.
  */
class CoverIndex(
    val level: Int,
    val polyIds: Array[Long],
    val polyWkbs: Array[Array[Byte]],
    val cellToPolys: Map[Long, Array[Int]],
    val denseThreshold: Int = 16
) extends Serializable {

  @transient private lazy val geoms: Array[Geometry] = polyWkbs.map(WkbCodec.read)
  @transient private lazy val prepared: Array[PreparedGeometry] = {
    val pf = new PreparedGeometryFactory
    geoms.map(pf.create)
  }
  /** STRtree over candidate envelopes for cells above denseThreshold. */
  @transient private lazy val denseTrees: Map[Long, STRtree] =
    cellToPolys.iterator.filter(_._2.length >= denseThreshold).map { case (cell, idxs) =>
      val t = new STRtree()
      idxs.foreach(i => t.insert(geoms(i).getEnvelopeInternal, Integer.valueOf(i)))
      t.build()
      cell -> t
    }.toMap

  def cellKey(cx: Long, cy: Long): Long = (cx << 32) | cy

  private val empty = Array.empty[Long]

  /** Polygon ids exactly containing the point (JTS `contains`: boundary
    * excluded — the synthetic layers keep points off boundaries), sorted.
    * Allocation-light: runs once per fact row (10^12 times), so per-probe
    * garbage is a GC/scaling tax. */
  def containing(lon: Double, lat: Double): Array[Long] = {
    val key = cellKey(CellGrid.cellX(lon, level), CellGrid.cellY(lat, level))
    val idxs = cellToPolys.getOrElse(key, null)
    if (idxs == null) return empty
    val pt = WkbCodec.point(lon, lat)
    val tree = denseTrees.getOrElse(key, null)
    if (tree != null) {
      val cands = tree.query(new Envelope(lon, lon, lat, lat))
      val out = new Array[Long](cands.size())
      var m = 0; var j = 0
      while (j < cands.size()) {
        val i = cands.get(j).asInstanceOf[Integer].intValue()
        if (prepared(i).contains(pt)) { out(m) = polyIds(i); m += 1 }
        j += 1
      }
      val res = java.util.Arrays.copyOf(out, m)
      java.util.Arrays.sort(res)
      res
    } else {
      val out = new Array[Long](idxs.length)
      var m = 0; var j = 0
      while (j < idxs.length) {
        val i = idxs(j)
        if (prepared(i).contains(pt)) { out(m) = polyIds(i); m += 1 }
        j += 1
      }
      val res = java.util.Arrays.copyOf(out, m)
      java.util.Arrays.sort(res)
      res
    }
  }

  def candidateCount(lon: Double, lat: Double): Int = {
    val key = cellKey(CellGrid.cellX(lon, level), CellGrid.cellY(lat, level))
    cellToPolys.get(key).map(_.length).getOrElse(0)
  }
}

object CoverIndex {

  /** Build on the driver from a collected (small/dim) polygon layer. */
  def build(polyIds: Array[Long], polyWkbs: Array[Array[Byte]], level: Int): CoverIndex = {
    val cellMap = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < polyIds.length) {
      val g = WkbCodec.read(polyWkbs(i))
      coverCells(g, level).foreach { case (cx, cy) =>
        cellMap.getOrElseUpdate((cx << 32) | cy, mutable.ArrayBuffer.empty) += i
      }
      i += 1
    }
    new CoverIndex(level, polyIds, polyWkbs, cellMap.view.mapValues(_.toArray).toMap)
  }

  /** Cells at `level` whose rectangle intersects the geometry (bbox cover +
    * exact refine, SURVEY.md §2b "covering index"). */
  def coverCells(g: Geometry, level: Int): Seq[(Long, Long)] = {
    val env = g.getEnvelopeInternal
    val cand = CellGrid.coverBBox(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, level)
    if (cand.size <= 1) cand
    else {
      val pf = new PreparedGeometryFactory().create(g)
      cand.filter { case (cx, cy) =>
        val id = CellGrid.pack(cx, cy, level)
        val (x0, y0, x1, y1) = CellGrid.bounds(id)
        pf.intersects(WkbCodec.polygon(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1))))
      }
    }
  }
}
