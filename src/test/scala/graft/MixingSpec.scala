package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Mixing

class MixingSpec extends AnyFunSuite with SparkTest {

  test("rarest language kept in full; head language thinned toward sqrt") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val before = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val kept = Mixing.docTemperatureSample(spark, Sf)
      .as[(Long, String)].collect()
    val after = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val rarest = before.minBy(_._2)._1

    assert(after(rarest) === before(rarest), "rarest language is never thinned")
    // every language's realized keep rate tracks q_l = sqrt(n_min/n_l)
    // within the Bernoulli noise of a few hundred draws
    val nMin = before.values.min.toDouble
    before.foreach { case (l, n) =>
      val q = math.sqrt(nMin / n)
      val got = after.getOrElse(l, 0L).toDouble / n
      assert(math.abs(got - q) < 0.15, s"$l keep rate $got vs expected $q")
    }
    // the flattening actually flattens: max/min lang ratio shrinks
    val ratioBefore = before.values.max.toDouble / before.values.min
    val ratioAfter = after.values.max.toDouble / after.values.min
    assert(ratioAfter < ratioBefore, s"$ratioAfter !< $ratioBefore")
  }

  test("deterministic: same input, same sample, membership closed-form") {
    import spark.implicits._
    val a = Mixing.docTemperatureSample(spark, Sf).as[(Long, String)].collect().toSet
    val b = Mixing.docTemperatureSample(spark, Sf).as[(Long, String)].collect().toSet
    assert(a === b)
    // membership is the stated closed form
    val before = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val nMin = before.values.min
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect()
    val want = docs.filter { case (id, l) =>
      val thr = math.floor(Mixing.DrawM.toDouble *
        math.sqrt(nMin.toDouble / before(l))).toLong
      (id * 2654435761L + 12345L) % Mixing.DrawM < thr
    }.toSet
    assert(a === want)
  }
}
