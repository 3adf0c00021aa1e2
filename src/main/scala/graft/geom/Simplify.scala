package graft.geom

/** Ramer–Douglas–Peucker polyline simplification (the per-zoom
  * generalization step of a vector-tile pipeline; PostGIS ST_Simplify
  * class). Iterative stack form (no recursion depth limit), deterministic:
  * the split point is the FIRST index attaining the maximum perpendicular
  * distance, and a point is kept iff its distance exceeds `tol` strictly.
  * Output vertices are a subset of input vertices; endpoints always kept.
  */
object Simplify {

  /** coords as packed [x0,y0,x1,y1,...]; returns the kept subset, same
    * packing. `tol` in coordinate units. */
  def rdp(coords: Array[Double], tol: Double): Array[Double] = {
    val n = coords.length / 2
    if (n <= 2 || tol <= 0) return coords.clone()
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val tol2 = tol * tol
    val stack = new scala.collection.mutable.ArrayDeque[(Int, Int)]()
    stack.append((0, n - 1))
    while (stack.nonEmpty) {
      val (a, b) = stack.removeLast()
      if (b > a + 1) {
        val ax = coords(2 * a); val ay = coords(2 * a + 1)
        val bx = coords(2 * b); val by = coords(2 * b + 1)
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        var best = -1
        var bestD2 = tol2
        var i = a + 1
        while (i < b) {
          val px = coords(2 * i) - ax; val py = coords(2 * i + 1) - ay
          // squared perpendicular distance to segment a-b (degenerate
          // segment => plain point distance)
          val d2 =
            if (len2 == 0) px * px + py * py
            else {
              val t = math.max(0.0, math.min(1.0, (px * dx + py * dy) / len2))
              val ex = px - t * dx; val ey = py - t * dy
              ex * ex + ey * ey
            }
          if (d2 > bestD2) { bestD2 = d2; best = i }
          i += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack.append((a, best))
          stack.append((best, b))
        }
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[Double](coords.length)
    var i = 0
    while (i < n) {
      if (keep(i)) { out += coords(2 * i); out += coords(2 * i + 1) }
      i += 1
    }
    out.toArray
  }
}
