package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}
import graft.geom.WkbCodec

/** Sample-based STR (Sort-Tile-Recursive) spatial partitioner.
  *
  * The fixed quadtree grid ([[PipJoin.pointCellKey]]) partitions SPACE
  * uniformly, so a dense urban cell concentrates data and needs the
  * salting machinery of [[PipJoin.shuffleJoin]]. STR instead partitions
  * the DATA: a bounded coordinate sample is sorted by lon and cut into
  * ~sqrt(P) equal-count slabs, and each slab is cut by lat into equal-count
  * cells (Leutenegger et al., STR packing, ICDE 1997 — the same
  * sample-fit-assign shape SpatialHadoop/Sedona use for their spatial
  * partitioners). Every partition then holds ~n/P points REGARDLESS of
  * spatial skew — balance is by construction, not by a hot-cell sketch,
  * which is the right trade when the polygon side is too big to broadcast
  * AND the point distribution is so skewed that per-cell salting would
  * need per-cell factors.
  *
  * Assignment is pure bounds math on broadcast cut arrays:
  *  - a point maps to EXACTLY ONE partition (binary search lon-slab, then
  *    lat-cell; a coordinate equal to a cut goes right — half-open
  *    intervals, no double counting);
  *  - a polygon replicates to every partition rectangle its envelope
  *    intersects ([[StrBounds.overlapping]]). Because a contained point's
  *    partition is always one of those (monotone bucket function over a
  *    closed envelope), each candidate (point, polygon) pair meets in
  *    exactly one partition — no pair dedup, unlike cell-cover joins where
  *    a polygon and point can share several cover cells.
  *
  * The join output is therefore identical to [[PipJoin.broadcastJoin]] /
  * [[PipJoin.shuffleJoin]] for ANY fitted bounds — the sample only steers
  * balance, never correctness (q105 is hash-checked against q13's oracle).
  *
  * 100 TB shape: the sample is a bounded collect (fraction + hard LIMIT),
  * the cut arrays are a few KB broadcast, points shuffle ONCE on `_part`
  * (equal-count partitions by construction), the polygon side shuffles
  * its envelope-replicated rows to the same partitioning, and the
  * shuffle-hash join + prepared refine run fully parallel with no reducer
  * hot spot.
  */
final class StrBounds(val xCuts: Array[Double],
                      val yCuts: Array[Array[Double]]) extends Serializable {

  /** partition id of slab s, cell r = offsets(s) + r. */
  private val offsets: Array[Int] = yCuts.scanLeft(0)(_ + _.length + 1)

  def numPartitions: Int = offsets(yCuts.length)

  /** count of cuts <= v: v equal to a cut goes RIGHT (half-open cells). */
  private def bucketOf(cuts: Array[Double], v: Double): Int = {
    var lo = 0; var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def partitionOf(lon: Double, lat: Double): Int = {
    val s = bucketOf(xCuts, lon)
    offsets(s) + bucketOf(yCuts(s), lat)
  }

  /** All partition ids whose rectangle intersects the closed envelope —
    * a superset of partitionOf(p) for every point p in the envelope,
    * because bucketOf is monotone in its argument. */
  def overlapping(minX: Double, minY: Double, maxX: Double, maxY: Double): Array[Int] = {
    val s1 = bucketOf(xCuts, maxX)
    val out = Array.newBuilder[Int]
    var s = bucketOf(xCuts, minX)
    while (s <= s1) {
      val cuts = yCuts(s)
      val r1 = bucketOf(cuts, maxY)
      var r = bucketOf(cuts, minY)
      while (r <= r1) { out += offsets(s) + r; r += 1 }
      s += 1
    }
    out.result()
  }
}

/** (lon, lat) -> STR partition id over the broadcast cut arrays. Native
  * (not ScalaUDF) for the same reason as [[PolyContainsExpr]]: this runs
  * once per fact row on the 10^12-point side, and the two binary searches
  * must read doubles straight off the InternalRow — no boxing. */
case class StrPartitionExpr(left: Expression, right: Expression,
                            bc: Broadcast[StrBounds])
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(lon: Any, lat: Any): Any =
    bc.value.partitionOf(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "str_partition"
}

object StrPartition {

  /** Classic STR fit: sort by x, cut into ceil(sqrt(p)) equal-count slabs;
    * within each slab (membership by the fitted x-bounds, so cuts match
    * what assignment will see) sort by y and cut into ceil(p / slabs)
    * equal-count cells. Duplicate coordinates may collapse adjacent cuts —
    * the empty cells that produces are harmless (no point maps to them). */
  def fit(xs: Array[Double], ys: Array[Double], targetPartitions: Int): StrBounds = {
    require(xs.length == ys.length && xs.nonEmpty, "fit needs a non-empty sample")
    val p = math.max(1, targetPartitions)
    val nSlabs = math.ceil(math.sqrt(p.toDouble)).toInt
    val perSlab = math.ceil(p.toDouble / nSlabs).toInt
    val sortedX = xs.sorted
    val n = xs.length
    // cut k sits at the first sample index of slab k (equal-count runs)
    val xCuts = (1 until nSlabs).map(k => sortedX(math.min(n - 1, k * n / nSlabs)))
      .distinct.toArray
    val bySlab = Array.fill(xCuts.length + 1)(Array.newBuilder[Double])
    var i = 0
    while (i < n) {
      var lo = 0; var hi = xCuts.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (xCuts(mid) <= xs(i)) lo = mid + 1 else hi = mid
      }
      bySlab(lo) += ys(i)
      i += 1
    }
    val yCuts = bySlab.map { b =>
      val sl = b.result().sorted
      if (sl.isEmpty) Array.empty[Double]
      else (1 until perSlab).map(k => sl(math.min(sl.length - 1, k * sl.length / perSlab)))
        .distinct.toArray
    }
    new StrBounds(xCuts, yCuts)
  }

  /** Fit from a bounded sample of the point side: `fraction` row sample
    * capped at `maxSample` rows — the collect is bounded no matter the
    * input size (at 100 TB the fraction shrinks; balance only needs the
    * sample to see the density profile, not every row). */
  def fitFromSample(points: DataFrame, lonCol: String, latCol: String,
                    targetPartitions: Int, fraction: Double = 0.05,
                    maxSample: Int = 100000, seed: Long = 42L): StrBounds = {
    val rows = points.select(col(lonCol), col(latCol))
      .sample(withReplacement = false, fraction, seed).limit(maxSample).collect()
    require(rows.nonEmpty, "empty sample — raise fraction")
    fit(rows.map(_.getDouble(0)), rows.map(_.getDouble(1)), targetPartitions)
  }

  def partitionIdCol(spark: SparkSession, bounds: StrBounds): (Column, Column) => Column = {
    val bc = spark.sparkContext.broadcast(bounds)
    (lon, lat) => ExpressionUtils.column(StrPartitionExpr(
      ExpressionUtils.expression(lon), ExpressionUtils.expression(lat), bc))
  }

  /** Point-in-polygon join over the STR partitioning: points tag their
    * single partition, polygons (poly_id, geom WKB) explode to their
    * envelope-overlapping partitions (a dim-side udf, same precedent as
    * the cover udf in [[PipJoin.shuffleJoin]]), shuffle-hash equi-join on
    * `_part`, envelope prefilter, exact prepared-geometry refine. Output
    * columns = the point columns + poly_id, hash-identical to
    * [[PipJoin.broadcastJoin]].
    *
    * The envelope prefilter is the classic filter-refine split: the join
    * on `_part` alone pairs every point in a partition with every polygon
    * overlapping that partition's rectangle, so the per-pair predicate
    * runs len(partition)·polys(rect) times. Four primitive double
    * compares (envelope carried from the same dim-side pass that computed
    * the overlap list) reject the overwhelming majority before the
    * prepared-geometry evaluation — measured 11.6M pairs -> ~0.1M refine
    * calls at sf0.1, 2.4x wall on this query. Envelope containment is
    * implied by polygon containment (closed envelope), so the filter
    * never changes the output. */
  def pipJoin(spark: SparkSession, points: DataFrame, polygons: DataFrame,
              bounds: StrBounds,
              lonCol: String = "lon", latCol: String = "lat"): DataFrame = {
    val bc = spark.sparkContext.broadcast(bounds)
    val envUdf = udf { (wkb: Array[Byte]) =>
      val env = WkbCodec.read(wkb).getEnvelopeInternal
      (bc.value.overlapping(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY),
        env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
    }
    val polyParts = polygons.select(col("poly_id"), col("geom"))
      .withColumn("_e", envUdf(col("geom")))
      .select(col("poly_id"), col("geom"), explode(col("_e._1")).as("_part"),
        col("_e._2").as("_minx"), col("_e._3").as("_miny"),
        col("_e._4").as("_maxx"), col("_e._5").as("_maxy"))
    val pts = points.withColumn("_part",
      ExpressionUtils.column(StrPartitionExpr(
        ExpressionUtils.expression(col(lonCol)), ExpressionUtils.expression(col(latCol)), bc)))
    // shuffle_hash: both sides exchange on _part (the STR partitioning) and
    // join in place — the plan the partitioner exists to produce; without
    // the hint a small polygon side would broadcast and bypass it
    pts.join(polyParts.hint("shuffle_hash"), Seq("_part"))
      .filter(col(lonCol) >= col("_minx") && col(lonCol) <= col("_maxx") &&
        col(latCol) >= col("_miny") && col(latCol) <= col("_maxy"))
      .filter(GeoExpressions.preparedContains(
        col("poly_id"), col("geom"), col(lonCol), col(latCol)))
      .drop("_part", "geom", "_minx", "_miny", "_maxx", "_maxy")
  }
}
