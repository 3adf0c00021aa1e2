package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ContactJoin

class ContactJoinSpec extends AnyFunSuite with SparkTest {

  // sf0.01: at sf0.001 the event stream is too short for any user pair to
  // share two buckets (vacuously empty output) and no bucket is crowded
  private val SfDir = "/root/testdata/sf0.01"

  // brute-force replica from the raw visit rows
  private lazy val visitRows: Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    ContactJoin.visits(spark, SfDir).as[(Long, Long, Long, Long)].collect().toSeq
  }

  private lazy val want: Map[(Long, Long), Long] = {
    val byBucket = visitRows.groupBy(v => (v._2, v._3, v._4))
      .filter(_._2.map(_._1).distinct.size <= ContactJoin.MaxBucketUsers)
    val pairs = byBucket.values.toSeq.flatMap { vs =>
      val us = vs.map(_._1).distinct.sorted
      for (i <- us.indices; j <- (i + 1) until us.size) yield (us(i), us(j))
    }
    pairs.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= ContactJoin.MinShared).toMap
  }

  private lazy val got: Map[(Long, Long), Long] = {
    import spark.implicits._
    ContactJoin.companions(spark, SfDir).as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
  }

  test("companions equal the brute-force bucket-pair count") {
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("the MinShared filter and the crowded-bucket exclusion both bind on the fixture") {
    // some pair shares exactly one calm bucket (filtered), and some bucket
    // exceeds MaxBucketUsers (excluded) — otherwise the thresholds are
    // dead parameters and the spec proves nothing about them
    val byBucket = visitRows.groupBy(v => (v._2, v._3, v._4)).view
      .mapValues(_.map(_._1).distinct).toMap
    assert(byBucket.values.exists(_.size > ContactJoin.MaxBucketUsers.toInt),
      "no crowded bucket in fixture")
    val calm = byBucket.filter(_._2.size <= ContactJoin.MaxBucketUsers)
    val oneOff = calm.values.toSeq.flatMap { us =>
      val s = us.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).count(_._2.size < ContactJoin.MinShared)
    assert(oneOff > 0, "MinShared never filters on fixture")
  }

  test("visits are distinct per (user, cell, day) — multiplicity collapses") {
    assert(visitRows.distinct.size === visitRows.size)
  }
}
