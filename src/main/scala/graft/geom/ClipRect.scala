package graft.geom

import scala.collection.mutable.ArrayBuffer

/** Sutherland–Hodgman polygon clipping against an axis-aligned rectangle
  * (the convex clip region of tile/cell content generation), plus the
  * doubled shoelace area.
  *
  * Numeric contract: intersections are computed multiplication-BEFORE-
  * division, `v0 + ((v1 - v0) * (c - u0)) / (u1 - u0)`, so when the input
  * ring lives on an integer lattice with slope-±1 or axis-aligned edges
  * and the clip bounds are integers (the synthetic diamond layers scaled
  * by 80), every intermediate product and the final coordinate are exact
  * integers in double — the clip is EXACT, and the doubled shoelace area
  * of every piece is an exact integer. That is what lets the tile-content
  * query's area-partition invariant (Σ over cells of clipped area == whole
  * polygon area) be checked by an integer DuckDB oracle instead of a
  * float tolerance. General float rings degrade gracefully to standard
  * double-precision clipping.
  */
object ClipRect {

  /** Clip a ring (implicitly closed, no repeated last point required)
    * against [x0,x1]×[y0,y1]. Returns the clipped ring's vertices (possibly
    * empty; may contain collinear/duplicate boundary points — harmless for
    * area and WKB). */
  def clip(ring: Array[Double], x0: Double, y0: Double, x1: Double, y1: Double): Array[Double] = {
    // edge encoding: 0=left(x>=x0) 1=right(x<=x1) 2=bottom(y>=y0) 3=top(y<=y1)
    var cur = ring
    var e = 0
    while (e < 4 && cur.length >= 2) {
      cur = clipHalfPlane(cur, e, if (e == 0) x0 else if (e == 1) x1 else if (e == 2) y0 else y1)
      e += 1
    }
    cur
  }

  private def inside(x: Double, y: Double, edge: Int, c: Double): Boolean = edge match {
    case 0 => x >= c
    case 1 => x <= c
    case 2 => y >= c
    case 3 => y <= c
  }

  // intersection of segment (x0,y0)-(x1,y1) with the boundary line of edge
  private def cross(px: Double, py: Double, qx: Double, qy: Double,
                    edge: Int, c: Double): (Double, Double) =
    if (edge <= 1) (c, py + ((qy - py) * (c - px)) / (qx - px))
    else (px + ((qx - px) * (c - py)) / (qy - py), c)

  private def clipHalfPlane(ring: Array[Double], edge: Int, c: Double): Array[Double] = {
    val n = ring.length / 2
    val out = new ArrayBuffer[Double](ring.length + 4)
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val px = ring(2 * i); val py = ring(2 * i + 1)
      val qx = ring(2 * j); val qy = ring(2 * j + 1)
      val pIn = inside(px, py, edge, c)
      val qIn = inside(qx, qy, edge, c)
      if (pIn) { out += px; out += py }
      if (pIn != qIn) {
        val (ix, iy) = cross(px, py, qx, qy, edge, c)
        out += ix; out += iy
      }
      i += 1
    }
    out.toArray
  }

  /** Doubled signed shoelace area (positive for CCW rings). Exact when all
    * coordinates are integers below 2^26. */
  def area2x(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    s
  }

  /** Copy of `ring` with consecutive duplicate vertices dropped (including
    * the last->first wraparound) — WKB emission wants minimal rings, and a
    * clip against an edge through a vertex emits that vertex twice. */
  def dedupeRing(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new scala.collection.mutable.ArrayBuffer[Double](ring.length)
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (ring(2 * i) != ring(2 * j) || ring(2 * i + 1) != ring(2 * j + 1)) {
        out += ring(2 * i); out += ring(2 * i + 1)
      }
      i += 1
    }
    out.toArray
  }
}
