package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, GeomAggregates}
import graft.geom.WkbCodec

class AsofExtentSpec extends AnyFunSuite with SparkTest {

  test("asof join == brute-force latest-prior match (incl. equal-ts inclusivity)") {
    import spark.implicits._
    // deterministic event streams with interleaved, shared, and missing keys
    val left = (1 to 200).map(i => (i.toLong, (i * 7919L) % 13, (i * 37L) % 500))
      .toDF("lid", "k", "ts")
    val right = (1 to 150).map(i => (1000L + i, (i * 104729L) % 13, (i * 53L) % 500))
      .toDF("rid", "k", "ts")
    val got = AsofJoin.asof(left, right.select(col("k"), col("ts"), col("rid")),
        "k", "ts", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val rrows = right.as[(Long, Long, Long)].collect()
    val lrows = left.as[(Long, Long, Long)].collect()
    for ((lid, k, ts) <- lrows) {
      val cands = rrows.filter(r => r._2 == k && r._3 <= ts)
      val want = if (cands.isEmpty) None
        // tie-break among equal best-ts rights: max payload (documented order)
        else Some(cands.maxBy(r => (r._3, r._1))._1)
      assert(got(lid) === want, s"lid=$lid k=$k ts=$ts")
    }
    assert(lrows.length === got.size)
  }

  test("asofBucketed == asof on a planted hot key, and the window splits it") {
    import spark.implicits._
    // one hot key (k=0) carrying 80% of rows, plus normal keys — the shape
    // that serializes asof()'s single window partition
    val left = (1 to 400).map(i =>
      (i.toLong, if (i % 5 == 0) (i % 7).toLong + 1 else 0L, (i * 37L) % 1000))
      .toDF("lid", "k", "ts")
    val right = (1 to 300).map(i =>
      (1000L + i, if (i % 5 == 0) (i % 7).toLong + 1 else 0L, (i * 53L) % 1000))
      .toDF("rid", "k", "ts")
    val r = right.select(col("k"), col("ts"), col("rid"))
    val want = AsofJoin.asof(left, r, "k", "ts", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val bucketed = AsofJoin.asofBucketed(left, r, "k", "ts", Seq("rid"), nBuckets = 8)
    val got = bucketed.select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got === want)
    // skew evidence: the window partition spec includes the time bucket, so
    // the hot key's rows spread over >1 window partition
    val winSpecs = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(winSpecs.nonEmpty && winSpecs.forall(_.size == 2),
      s"expected (key, bucket) window partitioning, got $winSpecs")
    // and the hot key actually lands in >1 bucket on this data
    val hotBuckets = AsofJoin.asofBucketed(left, r, "k", "ts", Seq("rid"), nBuckets = 8)
      .filter(col("k") === 0)
    assert(hotBuckets.count() > 0)
    val nb = left.filter(col("k") === 0)
      .select((col("ts") * 8 / 1000).cast("int")).distinct().count()
    assert(nb > 1, "planted hot key should span multiple time buckets")
  }

  test("st_extent aggregate: bbox union per group, map-side-combinable, SQL-registered") {
    import spark.implicits._
    val df = Seq(
      (0L, WkbCodec.write(WkbCodec.diamond(10.0, 5.0, 1.0))),
      (0L, WkbCodec.write(WkbCodec.diamond(-3.0, 8.0, 0.5))),
      (1L, WkbCodec.write(WkbCodec.point(2.5, -7.25)))
    ).toDF("g", "geom").repartition(3) // forces partial buffers + merge
    val out = df.groupBy("g").agg(GeomAggregates.extent(col("geom")).as("e"))
      .select($"g", $"e.minx", $"e.miny", $"e.maxx", $"e.maxy")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(out(0) === ((0L, -3.5, 4.0, 11.0, 8.5)))
    assert(out(1) === ((1L, 2.5, -7.25, 2.5, -7.25)))
    // SQL surface
    graft.ops.GraftFunctions.register(spark)
    df.createOrReplaceTempView("geoms")
    val viaSql = spark.sql(
      "SELECT g, st_extent(geom).minx AS mn FROM geoms GROUP BY g ORDER BY g")
      .as[(Long, Double)].collect()
    assert(viaSql.toSeq === Seq((0L, -3.5), (1L, 2.5)))
    // physical plan uses ObjectHashAggregate (imperative buffer, partial agg)
    val plan = df.groupBy("g").agg(GeomAggregates.extent(col("geom")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
  }
}
