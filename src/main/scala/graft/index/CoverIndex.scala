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
  /** Primitive probe index (r6): the per-row cell lookup through
    * `Map[Long, _]` boxed the packed key on EVERY fact-row probe (plus a
    * second boxed lookup for the dense-tree map). Rebuilt per executor
    * JVM as three parallel arrays — sorted keys, candidate lists, and the
    * STRtree for cells above denseThreshold (null below) — so a probe is
    * one allocation-free binary search. */
  @transient private lazy val probeKeys: Array[Long] = cellToPolys.keys.toArray.sorted
  @transient private lazy val probeVals: Array[Array[Int]] = probeKeys.map(cellToPolys)
  @transient private lazy val probeTrees: Array[STRtree] = probeVals.map { idxs =>
    if (idxs.length >= denseThreshold) {
      val t = new STRtree()
      idxs.foreach(i => t.insert(geoms(i).getEnvelopeInternal, Integer.valueOf(i)))
      t.build()
      t
    } else null
  }

  def cellKey(cx: Long, cy: Long): Long = (cx << 32) | cy

  private val empty = Array.empty[Long]

  /** Polygon ids exactly containing the point (JTS `contains`: boundary
    * excluded — the synthetic layers keep points off boundaries), sorted.
    * Allocation-light: runs once per fact row (10^12 times), so per-probe
    * garbage is a GC/scaling tax — the probe Point and dense-tree query
    * Envelope are per-thread mutables ([[graft.geom.ProbePoint]], r6), and
    * the result copy is skipped when every candidate matched. */
  def containing(lon: Double, lat: Double): Array[Long] = {
    val key = cellKey(CellGrid.cellX(lon, level), CellGrid.cellY(lat, level))
    val slot = java.util.Arrays.binarySearch(probeKeys, key)
    if (slot < 0) return empty
    val idxs = probeVals(slot)
    val pt = graft.geom.ProbePoint.at(lon, lat)
    val tree = probeTrees(slot)
    if (tree != null) {
      // reusable visitor: STRtree.query(env) allocates an ArrayList per
      // probe; the visitor form accumulates into a per-thread int buffer
      val vis = CoverIndex.visitor.get()
      vis.reset()
      tree.query(graft.geom.ProbePoint.envelope(lon, lat), vis)
      val cands = vis.buf
      val nc = vis.size
      val out = new Array[Long](nc)
      var m = 0; var j = 0
      while (j < nc) {
        val i = cands(j)
        if (prepared(i).contains(pt)) { out(m) = polyIds(i); m += 1 }
        j += 1
      }
      val res = if (m == out.length) out else java.util.Arrays.copyOf(out, m)
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
      val res = if (m == out.length) out else java.util.Arrays.copyOf(out, m)
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

  /** Growable per-thread candidate collector for the dense-cell STRtree
    * probe (r6) — `query(env)` allocates a fresh ArrayList per call. */
  final class IntVisitor extends org.locationtech.jts.index.ItemVisitor {
    var buf: Array[Int] = new Array[Int](64)
    var size: Int = 0
    def reset(): Unit = size = 0
    override def visitItem(item: AnyRef): Unit = {
      if (size == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(size) = item.asInstanceOf[Integer].intValue()
      size += 1
    }
  }
  private[index] val visitor: ThreadLocal[IntVisitor] = new ThreadLocal[IntVisitor] {
    override def initialValue(): IntVisitor = new IntVisitor
  }

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
