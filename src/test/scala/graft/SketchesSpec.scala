package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkTest {

  test("CMS counters == brute-force bucket sums; estimates dominate truth") {
    import spark.implicits._
    val (depth, width) = (4, 64)
    // skewed keys with weights
    val rows = (0 until 5000).map { i =>
      val k = ((i * i) % 97).toLong // zipf-ish collisions
      (k, 1L + i % 3)
    }
    val got = rows.toDF("k", "w")
      .agg(graft.ops.Sketches.cms(col("k"), col("w"), depth, width))
      .as[Seq[Long]].head()

    val expect = new Array[Long](depth * width)
    rows.foreach { case (k, w) =>
      for (i <- 0 until depth) {
        val b = ((k * graft.ops.Sketches.CmsA(i) + graft.ops.Sketches.CmsB(i))
          % graft.ops.Sketches.P % width).toInt
        expect(i * width + b) += w
      }
    }
    assert(got.toArray.toSeq === expect.toSeq)

    // per-key estimate (min over rows) must dominate the true count
    val truth = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    truth.foreach { case (k, t) =>
      val est = (0 until depth).map { i =>
        val b = ((k * graft.ops.Sketches.CmsA(i) + graft.ops.Sketches.CmsB(i))
          % graft.ops.Sketches.P % width).toInt
        expect(i * width + b)
      }.min
      assert(est >= t, s"key $k")
    }
    // width 64 << 97 keys: at least one estimate must actually overcount,
    // or the test isn't exercising collisions
    assert(truth.exists { case (k, t) =>
      (0 until depth).map { i =>
        val b = ((k * graft.ops.Sketches.CmsA(i) + graft.ops.Sketches.CmsB(i))
          % graft.ops.Sketches.P % width).toInt
        expect(i * width + b)
      }.min > t
    })
  }

  test("HLL registers: deterministic state + estimate within the m=64 band") {
    import spark.implicits._
    val docs = graft.ops.Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
    val regs = graft.ops.Sketches.hllRegisters(docs)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(r => r._2 -> r._3).toMap }
    // ground truth: distinct tokens per language
    val truth = docs.select(col("lang"),
        explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
      .distinct().groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(truth.keySet === regs.keySet)
    truth.foreach { case (lang, exact) =>
      val est = graft.ops.Sketches.hllEstimate(regs(lang))
      // 1.04/sqrt(64) = 13% standard error; allow 3 sigma
      assert(math.abs(est - exact) <= 0.4 * exact + 3,
        s"$lang: est $est vs exact $exact")
    }
    // registers are a pure function of the token set: rerun must be identical
    val regs2 = graft.ops.Sketches.hllRegisters(docs)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(r => r._2 -> r._3).toMap }
    assert(regs2 === regs)
  }

  test("Bloom membership: zero false negatives, some false positives, deterministic") {
    import spark.implicits._
    val docs = graft.ops.Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
    val out = graft.ops.Sketches.bloomContamination(docs, evalMod = 100)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    // structural guarantee: every eval-set token hits
    out.filter(_._2 == 1L).foreach { case (tok, _, hit) =>
      assert(hit === 1L, s"false negative for eval token $tok")
    }
    val inEval = out.count(_._2 == 1L)
    val nonEvalHits = out.count(r => r._2 == 0L && r._3 == 1L)
    val nonEval = out.count(_._2 == 0L)
    assert(inEval > 0 && nonEval > 0)
    // m=4096, k=3 over a few hundred eval keys: false-positive rate must be
    // small but the test corpus is big enough that the FP mechanism shows
    assert(nonEvalHits < nonEval / 4, s"fp rate too high: $nonEvalHits/$nonEval")
    // deterministic: rerun identical (this is what makes it hash-checkable)
    val again = graft.ops.Sketches.bloomContamination(docs, evalMod = 100)
      .as[(String, Long, Long)].collect()
    assert(again.toSet === out.toSet)
  }

  test("cmsHeavyHitters: sketch estimate >= exact count for every heavy hitter") {
    import spark.implicits._
    val docs = graft.ops.Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
    val out = graft.ops.Sketches.cmsHeavyHitters(docs, minCount = 50)
      .as[(String, Long, Long)].collect()
    assert(out.length > 10)
    out.foreach { case (tok, t, e) => assert(e >= t, tok) }
  }
}
