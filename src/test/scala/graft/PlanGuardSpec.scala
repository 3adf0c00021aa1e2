package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the properties that make a plan survive a
  * 100x scale-up are structural, so assert them on the PLAN, not on wall
  * time. Every non-baseline query must be free of
  *  - cartesian products / broadcast nested-loop joins (all-pairs
  *    candidate generation — the classic scale-killer), and
  *  - unpartitioned window operators (single-partition sort of the world).
  * The two declared brute-force ORACLE BASELINES (q27/q29 exact top-k) are
  * exempt from the join rule by design — their scale-path replacements are
  * q33/q34/q44.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTest {

  // q29 is the one remaining declared brute-force baseline (float cosine);
  // q27 now runs the blocked equi-join shape like q33
  private val bruteForceBaselines = Set("q29_cosine_topk")

  private def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.sparkPlan

  private def globalWindows(plan: LogicalPlan): Seq[LogicalWindow] =
    plan.collect { case w: LogicalWindow if w.partitionSpec.isEmpty => w }

  test("no query plan contains an unpartitioned window") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      val bad = globalWindows(df.queryExecution.optimizedPlan)
      assert(bad.isEmpty,
        s"$name has ${bad.size} unpartitioned Window op(s) — single-partition sort at scale")
    }
  }

  test("prod dedup entry points run the heavy-hitter-capped path by default") {
    // the cap manifests as a bucket-size / shingle-frequency aggregate +
    // filter in the logical plan (aliases bsz / sh_df are internal to the
    // capped branches, so their presence IS the capped path)
    val p21 = SparkEntry.queries("q21_minhash_lsh")(spark, Sf)
      .queryExecution.analyzed.toString
    assert(p21.contains("bsz"), "q21 default must run the capped LSH-bucket path")
    val p23 = SparkEntry.queries("q23_jaccard_pairs")(spark, Sf)
      .queryExecution.analyzed.toString
    assert(p23.contains("sh_df"), "q23 default must run the capped shingle path")
  }

  test("no non-baseline query plan contains a cartesian or nested-loop join") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!bruteForceBaselines.contains(name)) {
        val df = fn(spark, Sf)
        val bad = physical(df).collect {
          case j: BroadcastNestedLoopJoinExec => j.nodeName
          case j: CartesianProductExec => j.nodeName
        }
        assert(bad.isEmpty,
          s"$name plan contains ${bad.mkString(", ")} — all-pairs candidate generation")
      }
    }
  }
}
