package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Novelty}

class NoveltySpec extends AnyFunSuite with SparkTest {

  private def shingles(text: String): Set[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("planted docs: novelty counts exactly the shingles first seen earlier") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),          // shingles: abc bcd cde — all novel
      (2L, "c d e f g"),          // cde seen in doc 1; def efg novel
      (3L, "a b c d e"),          // full mirror of doc 1 -> all seen
      (4L, "x y"))                // too short: no shingles, no row
    val got = Novelty.shingleNovelty(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(1L -> (3L, 0L), 2L -> (3L, 1L), 3L -> (3L, 3L)))
  }

  test("fixture corpus: brute-force parity; planted mirror docs are fully stale") {
    import spark.implicits._
    val corpus = Dedup.corpus(spark, Sf)
    val rows = corpus.as[(Long, String)].collect()
    val firstDoc = rows.flatMap { case (d, t) => shingles(t).map(_ -> d) }
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
    val want = rows.flatMap { case (d, t) =>
      val sh = shingles(t)
      if (sh.isEmpty) None
      else Some(d -> (sh.size.toLong, sh.count(s => firstDoc(s) < d).toLong))
    }.toMap
    val got = Novelty.shingleNovelty(corpus)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === want)
    // every mirrored duplicate (doc_id + 1000000) has all shingles seen
    val mirrors = got.keys.filter(_ >= 1000000L)
    assert(mirrors.nonEmpty)
    mirrors.foreach { d => assert(got(d)._1 === got(d)._2, s"mirror $d fully stale") }
    // the earliest shingled doc is fully novel
    val dMin = got.keys.min
    assert(got(dMin)._2 === 0L)
  }
}
