package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LmScore

class LmScoreSpec extends AnyFunSuite with SparkTest {

  /** Local reference: same tokenization, bigram MLE, floor/scale fold. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val bigrams = docs.flatMap { case (id, text) =>
      val a = text.split(" ").filter(_.nonEmpty)
      a.iterator.zip(a.iterator.drop(1)).map { case (w1, w2) => (id, w1, w2) }.toSeq
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.size.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val scored = bigrams.groupBy(_._1).map { case (id, g) =>
      val s = g.map { case (_, w1, w2) =>
        math.floor(c2((w1, w2)).toDouble / c1(w1).toDouble * LmScore.ScaleU).toLong
      }.sum
      id -> (g.size.toLong, s)
    }
    docs.map { case (id, _) => id -> scored.getOrElse(id, (0L, 0L)) }.toMap
  }

  test("planted fixture: repeated template outscores unique prose; short docs zero") {
    import spark.implicits._
    val docs = Seq[(Long, String)](
      (0L, "click here to buy now"),
      (1L, "click here to buy now"),
      (2L, "click here to buy now"),
      (3L, "a quiet fox wandered the empty orchard"),
      (4L, "word"), // < 2 tokens -> no bigrams
      (5L, ""))
    val got = LmScore.lmScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = brute(docs)
    assert(got === want)
    // every bigram of the x3 template has p = 1.0 -> score = n_bigrams * 1e6
    assert(got(0L) === (4L, 4000000L))
    assert(got(0L) === got(1L))
    // unique-prose bigrams are also corpus-unique here (p = 1 each), but a
    // shared-prefix doc drags its first bigram below 1.0:
    assert(got(4L) === (0L, 0L) && got(5L) === (0L, 0L))
  }

  test("conditional split: shared head token divides probability mass exactly") {
    import spark.implicits._
    // "go north" x3 and "go south" x1: p(north|go)=3/4, p(south|go)=1/4
    val docs = Seq[(Long, String)](
      (0L, "go north"), (1L, "go north"), (2L, "go north"), (3L, "go south"))
    val got = LmScore.lmScore(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(0L) === 750000L && got(3L) === 250000L)
  }

  test("q111 on the sf documents fixture == local fold") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("q111_lm_score")(spark, Sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === brute(docs))
    assert(got.values.map(_._2).toSet.size > 10, "scores must differentiate docs")
  }
}
