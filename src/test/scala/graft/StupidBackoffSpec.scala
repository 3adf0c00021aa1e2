package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.ops.{Retrieval, StupidBackoff}

class StupidBackoffSpec extends AnyFunSuite with SparkTest {

  /** Reference scorer mirroring the integer op sequence. */
  private def brute(corpus: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val train = corpus.filter(_._1 % StupidBackoff.TrainMod != 0)
    val uni = train.flatMap(d => toks(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val bi = train.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(d => toks(d._2).sliding(3).filter(_.size == 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = uni.values.sum
    corpus.map { case (id, text) =>
      val ts = toks(text).sliding(3).filter(_.size == 3).toSeq
      val scores = ts.map { t =>
        val Seq(w1, w2, w3) = t
        tri.get(t) match {
          case Some(c3) => c3 * StupidBackoff.ScaleU / bi(Seq(w1, w2))
          case None => bi.get(Seq(w2, w3)) match {
            case Some(c2) => c2 * StupidBackoff.Scale1 / uni(w2)
            case None => uni.getOrElse(w3, 0L) * StupidBackoff.Scale2 / tot
          }
        }
      }
      id -> (ts.size.toLong, scores.sum)
    }.toMap
  }

  private def run(df: DataFrame): Map[Long, (Long, Long)] = {
    import spark.implicits._
    StupidBackoff.score(df).as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("all three levels fire and match brute force on a planted corpus") {
    import spark.implicits._
    // docs 1, 2 train (id % 3 != 0); docs 0, 3 held out
    val docs = Seq(
      (1L, "a b c d a b c"), // trains trigrams a-b-c, b-c-d, c-d-a, d-a-b
      (2L, "b c e f"),       // train tokens total = 11
      (0L, "x b c z z"),     // x-b-c: level 2; b-c-z, c-z-z: OOV zeros
      (3L, "z z a"))         // z-z-a: level 3 via seen unigram a
    val corpus = docs.toDF("doc_id", "text")
    val got = run(corpus)
    assert(got === brute(docs))
    // level 2: c2(b,c)=3, c1(b)=3 -> 3*400000/3; the two OOV trigrams add 0
    assert(got(0L) === ((3L, 400000L)))
    // level 3: c1(a)=2, total=11 -> floor(2*160000/11)
    assert(got(3L) === ((1L, 29090L)))
    // level 1 on a train doc: its own trigrams are all seen
    assert(got(1L)._2 > 400000L)
  }

  test("fixture corpus brute-force parity") {
    import spark.implicits._
    val corpus = Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
    val local = corpus.as[(Long, String, String)].collect()
      .map(t => (t._1, t._3)).toSeq
    val got = run(corpus.select("doc_id", "text"))
    assert(got === brute(local))
    assert(got.nonEmpty && got.values.exists(_._2 > 0L))
  }
}
