package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{KneserNey, Retrieval}

class KneserNeySpec extends AnyFunSuite with SparkTest {

  test("hand-computed micro-corpus, incl. the canonical francisco case") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "san francisco is big"),
      (1L, "san francisco is old"),
      (2L, "san francisco san diego"),
      (3L, "big is big"),
      (4L, "x")).toDF("doc_id", "text")
    val got = KneserNey.knCounts(corpus).as[(String, Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap

    // francisco: frequent (3) but completes ONLY "san" -> n_left = 1;
    // rights {is, san}
    assert(got("francisco") === ((3L, 1L, 2L)),
      s"francisco: ${got("francisco")}")
    // is: same order of frequency but diverse lefts {francisco, big} —
    // the discrimination KN smoothing exists for; rights {big, old}
    assert(got("is") === ((3L, 2L, 2L)), s"is: ${got("is")}")
    // san: starts 3 docs (no left there) + one left type {francisco};
    // rights {francisco, diego}
    assert(got("san") === ((4L, 1L, 2L)), s"san: ${got("san")}")
    assert(got("x") === ((1L, 0L, 0L)), "single-token doc contributes no bigrams")
    assert(got("diego") === ((1L, 1L, 0L)), "trailing word has no rights")
  }

  test("fixture corpus invariants: type counts bound token counts") {
    import spark.implicits._
    val corpus = Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
    val rows = KneserNey.knCounts(corpus).as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val vocab = rows.map(_._1)
    assert(vocab.distinct.length === vocab.length, "one row per vocab word")
    // N1+(.w) <= c(w): each distinct left type needs >= 1 occurrence of w
    // with a left neighbor
    assert(rows.forall { case (_, c1, nl, nr) => nl <= c1 && nr <= c1 && c1 >= 1 })
    // the corpus is multi-doc prose: some word must have diverse lefts
    assert(rows.exists(_._3 >= 2), "no word with >= 2 left types — degenerate corpus")
    // totals: sum over w of N1+(.w) = |distinct bigram types| = sum of N1+(w.)
    assert(rows.map(_._3).sum === rows.map(_._4).sum)
  }
}
