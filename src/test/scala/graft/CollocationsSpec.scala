package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Collocations

class CollocationsSpec extends AnyFunSuite with SparkTest {

  private def brute(texts: Seq[String], minCount: Long):
      Map[(String, String), (Long, Long, Long, Long)] = {
    val toks = texts.map(_.split(" ").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val n = toks.map(_.size.toLong).sum
    toks.flatMap(a => a.zip(a.drop(1)))
      .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= minCount)
      .map { case ((w1, w2), c) => (w1, w2) -> (c, uni(w1), uni(w2), n) }
  }

  private def run(texts: Seq[String], minCount: Long):
      Map[(String, String), (Long, Long, Long, Long)] = {
    import spark.implicits._
    Collocations.pmiPairs(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      minCount)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
  }

  test("planted corpus: brute-force parity; bigrams never cross doc boundaries") {
    val texts = Seq(
      "new york new york new york",
      "york new means nothing here",
      "a b a b a b",
      "solo")
    val got = run(texts, 3L)
    assert(got === brute(texts, 3L))
    assert(got.contains(("new", "york")) && got(("new", "york"))._1 === 3L)
    assert(got.contains(("a", "b")) && got(("a", "b"))._1 === 3L)
    assert(!got.contains(("york", "new")) || got(("york", "new"))._1 >= 3L,
      "below-threshold pairs are filtered")
    // the doc-final 'york' pairs with nothing: n_tokens counts it, bigrams don't
    assert(got.values.head._4 === texts.map(_.split(" ").count(_.nonEmpty)).sum.toLong)
  }

  test("high-PMI planted phrase beats a frequent-but-independent pair") {
    // 'tick tock' always adjacent; 'x'/'y' frequent but never adjacent-only pairs
    val texts = Seq.fill(5)("tick tock") ++ Seq.fill(10)("x q y q x q y q")
    val got = run(texts, 3L)
    val (cxy, c1, c2, n) = got(("tick", "tock"))
    val pmiTick = math.log(n.toDouble * cxy / (c1.toDouble * c2))
    val (qc, q1, q2, _) = got(("x", "q"))
    val pmiXq = math.log(n.toDouble * qc / (q1.toDouble * q2))
    assert(pmiTick > pmiXq, s"$pmiTick vs $pmiXq")
  }

  test("fixture documents: brute-force parity") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").as[String].collect().toSeq
    val got = {
      Collocations.pmiPairs(spark.read.parquet(s"$Sf/documents.parquet")
        .select("doc_id", "text"))
        .as[(String, String, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    }
    assert(got === brute(texts, Collocations.MinCount))
    assert(got.nonEmpty)
  }
}
