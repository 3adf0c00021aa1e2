package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SubstrDedup

class SubstrDedupSpec extends AnyFunSuite with SparkTest {

  private def run(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    SubstrDedup.dupSpans(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  /** Local reference: duplicated k-windows by DIRECT STRING comparison (so
    * a fold collision on the Spark side would surface as a mismatch), then
    * the same island merge. */
  private def brute(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
    val wins = toks.flatMap { case (id, a) =>
      if (a.size < k) Nil
      else (0 to a.size - k).map(i => (id, i, a.slice(i, i + k).mkString(" ")))
    }
    val dupKeys = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    wins.filter(w => dupKeys(w._3)).groupBy(_._1).flatMap { case (id, ws) =>
      val is = ws.map(_._2).sorted
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var start = is.head; var last = is.head; var cnt = 1L
      for (i <- is.tail) {
        if (i - last > k) { spans += ((start.toLong, (last + k).toLong, cnt)); start = i; cnt = 0 }
        last = i; cnt += 1
      }
      spans += ((start.toLong, (last + k).toLong, cnt))
      spans.map { case (s, e, c) => (id, s, e, c) }
    }.toSet
  }

  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("planted cross-doc phrase: span covers exactly the shared tokens") {
    val phrase = words("p", 12)
    val docs = Seq(
      1L -> s"${words("a", 5)} $phrase ${words("b", 5)}",
      2L -> s"${words("c", 7)} $phrase ${words("d", 3)}")
    val got = run(docs, 8)
    // 12-token phrase, k=8: dup windows at offsets 0..4 inside the phrase
    assert(got === Set((1L, 5L, 17L, 5L), (2L, 7L, 19L, 5L)))
    assert(got === brute(docs, 8))
  }

  test("within-doc repetition produces two spans; far-apart islands split") {
    val phrase = words("p", 9)
    val docs = Seq(1L -> s"$phrase ${words("x", 20)} $phrase",
                   2L -> words("z", 30))
    val got = run(docs, 8)
    // occurrences at 0..8 and 29..37; dup windows {0,1} and {29,30};
    // island gap 29 - 1 = 28 > k -> two spans, each covering one phrase
    assert(got === Set((1L, 0L, 9L, 2L), (1L, 29L, 38L, 2L)))
    assert(got === brute(docs, 8))
  }

  test("overlapping duplicated regions merge into one maximal span") {
    // doc 1 shares tokens 0..14 with doc 2 and tokens 10..24 with doc 3:
    // islands overlap -> ONE span 0..25 in doc 1
    val a = words("s", 25)
    val arr = a.split(" ")
    val docs = Seq(
      1L -> a,
      2L -> s"${words("u", 4)} ${arr.slice(0, 15).mkString(" ")}",
      3L -> s"${arr.slice(10, 25).mkString(" ")} ${words("v", 4)}")
    val got = run(docs, 8)
    // dup windows {0..7} (shared with doc 2) and {10..17} (doc 3); gap
    // 10 - 7 = 3 <= k -> one island: span [0, 25), 16 windows
    assert(got.filter(_._1 == 1L) === Set((1L, 0L, 25L, 16L)))
    assert(got === brute(docs, 8))
  }

  test("no duplication -> empty; short docs (< k tokens) never crash") {
    assert(run(Seq(1L -> words("a", 20), 2L -> words("b", 20), 3L -> "tiny doc"), 8).isEmpty)
  }

  test("pseudo-random corpus with seeded duplicates == string-compare reference") {
    // 30 docs of structured tokens; every 5th doc repeats doc i-5's middle
    val base = (0 until 30).map { i =>
      i.toLong -> (0 until 40).map(j => s"w${(i * 131 + j * 17) % 97}_${j % 13}").mkString(" ")
    }
    val docs = base.map { case (id, t) =>
      if (id % 5 == 4) {
        val donor = base((id - 4).toInt)._2.split(" ").slice(10, 26).mkString(" ")
        id -> (t.split(" ").take(8).mkString(" ") + " " + donor + " " + t.split(" ").drop(24).mkString(" "))
      } else id -> t
    }
    assert(run(docs, 8) === brute(docs, 8))
  }

  test("q107 at sf0.001: whole-doc duplicates yield full-width spans") {
    import spark.implicits._
    val out = SparkEntry.queries("q107_dup_spans")(spark, Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every %3==0 doc is duplicated verbatim at +1000000: both copies must
    // carry one span starting at 0
    val ids = out.map(_._1).toSet
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id").as[Long].collect().filter(_ % 3 == 0)
    docs.foreach { d =>
      assert(ids.contains(d), s"doc $d missing")
      assert(ids.contains(d + 1000000), s"dup of $d missing")
    }
    assert(out.filter(r => ids.contains(r._1) && r._1 % 3 == 0 && r._1 < 1000000)
      .forall(_._2 == 0L), "verbatim dup spans start at token 0")
  }
}
