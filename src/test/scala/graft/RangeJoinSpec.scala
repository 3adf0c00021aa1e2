package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTest {

  test("containsJoin == theta-join brute force, invariant to bucket size; no BNLJ") {
    import spark.implicits._
    val probes = (0 until 3000).map(i => (i.toLong, ((i * 7919) % 5000).toLong))
      .toDF("probe_id", "k")
    val ranges = (0 until 400).map { i =>
      val lo = ((i * 104729) % 5000).toLong
      (i.toLong, lo, lo + 3 + i % 25)
    }.toDF("range_id", "lo", "hi")

    val expect = probes.as[(Long, Long)].collect().flatMap { case (p, k) =>
      ranges.as[(Long, Long, Long)].collect().collect {
        case (r, lo, hi) if k >= lo && k < hi => (p, r)
      }
    }.toSet
    assert(expect.nonEmpty && expect.size < 3000L * 400, "test data must be selective")

    for (bucket <- Seq(1L, 64L, 1000000L)) {
      val got = graft.ops.RangeJoin.containsJoin(probes, "k", ranges, "lo", "hi", bucket)
        .select("probe_id", "range_id").as[(Long, Long)].collect().toSet
      assert(got === expect, s"bucket=$bucket")
    }

    val plan = graft.ops.RangeJoin.containsJoin(probes, "k", ranges, "lo", "hi", 64L)
      .queryExecution.sparkPlan
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j.nodeName
      case j: CartesianProductExec => j.nodeName
    }
    assert(bad.isEmpty, s"range join must stay an equi-join: $bad")
  }

  test("boundary semantics: lo inclusive, hi exclusive, duplicates never emitted") {
    import spark.implicits._
    val probes = Seq((1L, 10L), (2L, 14L), (3L, 15L), (4L, 9L)).toDF("probe_id", "k")
    // one range wide enough to span several buckets at bucket=4
    val ranges = Seq((7L, 10L, 15L)).toDF("range_id", "lo", "hi")
    val got = graft.ops.RangeJoin.containsJoin(probes, "k", ranges, "lo", "hi", 4L)
      .select("probe_id", "range_id").as[(Long, Long)].collect().toList
    assert(got.sorted === List((1L, 7L), (2L, 7L)))
  }
}
