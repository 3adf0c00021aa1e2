package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the load-bearing queries so plan
  * regressions (lost pushdown, broken codegen, wrong join strategy) are
  * visible. Run: `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.local.dir", Scratch.dir)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    show("q01 lineitem agg (expect: parquet pushdown, partial agg, WSCG)")(
      SparkEntry.queries("q01_lineitem_agg")(spark, sfDir))
    show("q02 join topn (expect: BroadcastHashJoin on customer)")(
      SparkEntry.queries("q02_join_topn")(spark, sfDir))
    show("flagship pipeline (expect: single narrow WSCG stage after scan+small repart)")(
      Pipeline.run(spark, sfDir))
    show("q13 pip join broadcast (expect: no shuffle before explode)")(
      SparkEntry.queries("q13_pip_join")(spark, sfDir))
    show("q21 minhash (expect: partial aggs; NO WindowExec anywhere — vocab rank is denseIds)")(
      SparkEntry.queries("q21_minhash_lsh")(spark, sfDir))
    show("q27 ann topk (expect: broadcast of queries side; declared brute-force baseline)")(
      SparkEntry.queries("q27_ann_topk")(spark, sfDir))
    show("q33 ann topk blocked (expect: equi-join on blk, ObjectHashAggregate partial, no BNLJ)")(
      SparkEntry.queries("q33_ann_topk_blocked")(spark, sfDir))
    show("q34 ann topk multiprobe lsh (expect: equi-join on bucket)")(
      SparkEntry.queries("q34_ann_topk_lsh")(spark, sfDir))
    show("q44 ann topk ivf (expect: equi-join on cid; centroid assign/probe are literal-array column math — no join, no BNLJ)")(
      SparkEntry.queries("q44_ann_topk_ivf")(spark, sfDir))
    show("q57 pruned bbox (expect: PushedFilters with cell BETWEENs on the parquet scan — manifest pruned the buckets, parquet stats prune row groups)")(
      SparkEntry.queries("q57_pruned_bbox")(spark, sfDir))
    show("q36 dedup components (hybrid: star rounds while edges > threshold, union-find " +
      "finish below it — at bench SF the edge set is small, so expect the local finish)")(
      SparkEntry.queries("q36_dedup_components")(spark, sfDir))
    show("q43 shapefile DSv2 (expect: BatchScan shapefile with pruned ReadSchema)")(
      SparkEntry.queries("q43_shapefile_dsv2")(spark, sfDir))
    show("q51 rasterize (expect: WSCG explode+filter, partial HashAggregate, ONE shuffle on group keys)")(
      SparkEntry.queries("q51_rasterize")(spark, sfDir))
    show("q53 asof join (expect: Union -> ONE Exchange on key -> Sort -> WindowExec; no range join)")(
      SparkEntry.queries("q53_asof_join")(spark, sfDir))
    show("q55 overlay join (expect: explode both sides, ONE SortMergeJoin/SHJ on cell, " +
      "reporting-cell + intersects as post-join filter, NO distinct shuffle on pairs)")(
      SparkEntry.queries("q55_overlay_join")(spark, sfDir))
    show("q56 distance join (expect: single equi-join on _cell, ring explode only on left, " +
      "codegen'd bbox pre-filter, exact refine; no cross join)")(
      SparkEntry.queries("q56_distance_join")(spark, sfDir))
    show("q54 extent (expect: ObjectHashAggregate partial+final — map-side combined bbox)")(
      SparkEntry.queries("q54_extent")(spark, sfDir))
    show("q59 knn geodesic (expect: same zero-shuffle broadcast-probe shape as q15 — " +
      "one narrow projection over the scan, KnnPoisExpr probe, posexplode)")(
      SparkEntry.queries("q59_knn_geodesic")(spark, sfDir))
    show("q61 dwithin geodesic (expect: single equi-join on _cell, per-row variable x-span " +
      "explode only on left, haversine-term refine; no cross join)")(
      SparkEntry.queries("q61_dwithin_geodesic")(spark, sfDir))
    show("q53 asof bucketed (expect: WindowExec partitioned on (user_id, _b); " +
      "summary agg partial-combined; no range join)")(
      SparkEntry.queries("q53_asof_join")(spark, sfDir))
    spark.stop()
  }
}
