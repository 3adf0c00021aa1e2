package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite with SparkTest {

  test("tokenHeavyHitters == exact GROUP BY HAVING, k=255, fixture corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val k = 255
    val exact = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    val n = exact.count()
    val want = exact.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .as[(String, Long)].collect().toMap
    val got = HeavyHitters.tokenHeavyHitters(docs, k)
      .as[(String, Long)].collect().toMap
    assert(want.nonEmpty, "fixture must contain heavy hitters at k=255")
    assert(got === want)
  }

  test("MG guarantee holds under adversarial partitioning (merge order)") {
    import spark.implicits._
    // zipf-ish stream: key K appears ~N/K times; k=9 counters, so true
    // heavy hitters are keys with freq * 10 > n — the summary must keep
    // every one of them no matter how the stream is partitioned
    val rows = (1L to 200L).flatMap(key => Seq.fill((2000 / key).toInt)(key))
    val n = rows.size.toLong
    val k = 9
    val truth = rows.groupBy(identity).map { case (kk, vs) => kk -> vs.size.toLong }
    val heavies = truth.collect { case (kk, c) if c * (k + 1) > n => kk }.toSet
    assert(heavies.nonEmpty)
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("key").repartition(parts, col("key") * 7919 % 13)
      val cand = df.agg(HeavyHitters.mgCandidates(col("key"), k).as("c"))
        .select(explode(col("c")).as("k")).as[Long].collect().toSet
      assert(cand.size <= k, s"parts=$parts: summary exceeded k")
      assert(heavies.subsetOf(cand),
        s"parts=$parts: lost ${heavies -- cand} (true heavy hitters)")
    }
  }

  test("confirm-pass candidates are broadcast, never a shuffled join") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = HeavyHitters.tokenHeavyHitters(docs, 255).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "candidate semi-join must broadcast")
    assert(!plan.contains("BroadcastNestedLoop"), "no BNLJ in the confirm pass")
  }
}
