package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

class ContainmentSpec extends AnyFunSuite with SparkTest {

  test("planted wrapper found; near-dup and unrelated excluded") {
    import spark.implicits._
    // doc 0: long page; doc 1: its first 6 tokens (quote — contained,
    // Jaccard-diluted); doc 2: near-dup of doc 0 (Jaccard >= 1/2 —
    // q23 territory, must be EXCLUDED here); doc 3: unrelated
    val base = "w1 w2 w3 w4 w5 w6 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    val corpus = Seq(
      (0L, base),
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, base + " y1"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus).as[(Long, Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2)).toSet
    // quote in original AND in the near-dup of the original; never (0, 2)
    assert(got === Set((1L, 0L), (1L, 2L)), s"got $got")
  }

  test("quote corpus: every planted quote is found against its source") {
    import spark.implicits._
    val corpus = Dedup.quoteCorpus(spark, Sf)
    val got = Dedup.containmentPairs(corpus)
      .as[(Long, Long, Long, Long, Long)].collect()
    // each planted quote (id + 2000000) must surface as the contained side
    // of its own source — unless the truncated text has < 3 tokens (no
    // shingles) or the shared shingles got df-capped away
    val pairs = got.map(t => (t._1, t._2)).toSet
    val planted = corpus.filter($"doc_id" >= 2000000L).select("doc_id")
      .as[Long].collect()
    assert(planted.nonEmpty)
    val found = planted.count(q => pairs.contains((q, q - 2000000L)))
    assert(found >= planted.length / 2,
      s"only $found of ${planted.length} planted quotes found")
    // exactness: every emitted pair satisfies both integer filters
    assert(got.forall { case (_, _, inter, na, nb) =>
      inter * 5 >= na * 4 && inter * 2 < na + nb - inter && na <= nb })
  }

  test("brute-force parity on a small corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().take(30)
    val quoted = docs ++ docs.filter(_._1 % 5 == 0).map { case (id, t) =>
      val a = t.split(" ").filter(_.nonEmpty)
      (id + 2000000L, a.take(math.max(3, 2 * a.length / 5)).mkString(" "))
    }
    val corpus = quoted.toSeq.toDF("doc_id", "text")

    // reference: exact shingle sets, df cap, containment + not-near-dup
    val shing = quoted.map { case (id, t) =>
      val a = t.split(" ").filter(_.nonEmpty)
      id -> a.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = shing.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val kept = shing.view.mapValues(_.filter(s =>
      df(s) <= Dedup.MaxShingleFreqDefault)).toMap
    val ids = quoted.map(_._1)
    val want = (for {
      i <- ids; j <- ids if i < j
      si = kept(i); sj = kept(j) if si.nonEmpty && sj.nonEmpty
      inter = (si & sj).size
      (small, big, na, nb) =
        if (si.size < sj.size || (si.size == sj.size && i < j))
          (i, j, si.size, sj.size) else (j, i, sj.size, si.size)
      if inter * 5 >= na * 4 && inter * 2 < na + nb - inter
    } yield (small, big, inter.toLong, na.toLong, nb.toLong)).toSet

    val got = Dedup.containmentPairs(corpus)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }
}
