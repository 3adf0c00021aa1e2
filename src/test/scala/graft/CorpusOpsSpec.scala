package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

class CorpusOpsSpec extends AnyFunSuite with SparkTest {

  test("linedCorpus: 8-token lines, boilerplate planted by doc_id rules") {
    import spark.implicits._
    val words = (1 to 20).map(i => s"w$i").mkString(" ") // 20 tokens -> 2 lines
    val d = Seq((3L, words), (7L, words), (21L, words), (1L, words), (2L, "short text"))
      .toDF("doc_id", "text")
    val r = CorpusOps.linedCorpus(d).as[(Long, String)].collect().toMap
    val l1 = (1 to 8).map(i => s"w$i").mkString(" ")
    val l2 = (9 to 16).map(i => s"w$i").mkString(" ")
    assert(r(1L) === s"$l1\n$l2")
    assert(r(3L) === s"${CorpusOps.Boiler1}\n$l1\n$l2")
    assert(r(7L) === s"$l1\n$l2\n${CorpusOps.Boiler2}")
    assert(r(21L) === s"${CorpusOps.Boiler1}\n$l1\n$l2\n${CorpusOps.Boiler2}")
    assert(r(2L) === "") // < 8 tokens: no full line
  }

  test("lineDedup: cross-doc repeated lines removed, order kept, empty-doc row survives") {
    import spark.implicits._
    val boiler = "click here to subscribe"
    val docs = ((1 to 6).map(i => (i.toLong, s"$boiler\nunique line $i\nanother $i")) :+
      (7L, s"only unique here\nsecond line") :+
      (8L, boiler)) // all-boilerplate doc
      .toDF("doc_id", "text")
    val r = CorpusOps.lineDedup(docs, minDocs = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r.length === 8)
    (1 to 6).foreach { i =>
      assert(r(i - 1) === (i.toLong, s"unique line $i\nanother $i", 1L))
    }
    assert(r(6) === (7L, "only unique here\nsecond line", 0L))
    assert(r(7) === (8L, "", 1L))
  }

  test("lineDedup: a line repeated WITHIN one doc counts one distinct doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup\ndup\ndup\ndup\ndup\nkeep me"), // 5 copies, 1 doc
      (2L, "other\nlines")).toDF("doc_id", "text")
    val r = CorpusOps.lineDedup(docs, minDocs = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // "dup" appears in only 1 distinct doc -> NOT boilerplate
    assert(r(0) === (1L, "dup\ndup\ndup\ndup\ndup\nkeep me", 0L))
  }

  test("lineDedup: NULL text behaves as one empty line (n_removed never negative)") {
    import spark.implicits._
    val docs = Seq((1L, Some("a line\nb line")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val r = graft.ops.CorpusOps.lineDedup(docs, minDocs = 5)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, "a line\nb line", 0L), (2L, "", 0L)))
  }

  test("lineDedup: brute-force parity on randomized corpora (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val vocabLines = (1 to 12).map(i => s"line v$i")
      val docs = (1 to 40).map { id =>
        val n = 1 + rnd.nextInt(6)
        (id.toLong, Seq.fill(n)(vocabLines(rnd.nextInt(vocabLines.size))).mkString("\n"))
      }
      val minDocs = 2 + rnd.nextInt(3)
      // brute force: distinct-doc count per line
      val cnt = docs.flatMap { case (id, t) => t.split("\n").distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val boiler = cnt.filter(_._2 >= minDocs).keySet
      val want = docs.map { case (id, t) =>
        val kept = t.split("\n", -1).filterNot(boiler)
        (id, kept.mkString("\n"), (t.split("\n", -1).length - kept.length).toLong)
      }.sortBy(_._1)
      val got = graft.ops.CorpusOps.lineDedup(docs.toDF("doc_id", "text"), minDocs)
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(got.toSeq === want, s"trial $trial minDocs $minDocs")
    }
  }

  test("packShards: equals the global-order cumulative sum, across block boundaries") {
    import spark.implicits._
    val docs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(1 + (i * 7) % 13)("tok").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.ops.CorpusOps.packShards(docs, budget = 50, blockSize = 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    val want = (1 to 300).map { i =>
      val n = (1 + (i * 7) % 13).toLong
      val r = (i.toLong, n, cum / 50)
      cum += n
      r
    }
    assert(got.toSeq === want)
    // shards are contiguous runs and every shard except the last reaches
    // its budget with <= one straddling doc
    val byShard = got.groupBy(_._3).toSeq.sortBy(_._1)
    byShard.dropRight(1).foreach { case (s, xs) =>
      val tot = xs.map(_._2).sum
      assert(tot >= 50 - 12, s"shard $s underfilled: $tot")
    }
  }

  test("groupQuantiles: exact lower discrete quantile, brute-force parity") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1 to 500).map { i =>
      (i.toLong, if (i % 4 == 0) "en" else "de", (10 + rnd.nextInt(90)).toLong)
    }.toDF("doc_id", "lang", "n_chars")
    val got = graft.ops.CorpusOps.groupQuantiles(docs, "n_chars", "lang", Seq(1, 50, 90, 100))
      .as[(String, Long, Long)].collect().toSet
    val local = docs.as[(Long, String, Long)].collect()
    val want = local.groupBy(_._2).flatMap { case (g, xs) =>
      val vs = xs.map(_._3).sorted
      Seq(1, 50, 90, 100).map { p =>
        val target = (p * vs.length + 99) / 100
        (g, p.toLong, vs(target - 1)) // lower discrete quantile: rank = ceil(p*n/100)
      }
    }.toSet
    assert(got === want)
    // pct=100 is the max — sanity anchor
    local.groupBy(_._2).foreach { case (g, xs) =>
      assert(got.contains((g, 100L, xs.map(_._3).max)))
    }
  }

  test("stratifiedSample: n smallest draws per group, brute-force parity") {
    import spark.implicits._
    val docs = (1 to 200).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val got = CorpusOps.stratifiedSample(docs, n = 7)
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, r, id, d) => (g, r, id, d) }.sortBy(x => (x._1, x._2))
    def draw(id: Long) = ((id % 2147483647L) * 2654435761L) % 2147483647L
    val want = (1 to 200).map(i => (if (i % 3 == 0) "en" else "de", i.toLong))
      .groupBy(_._1).toSeq.flatMap { case (g, xs) =>
        xs.map(_._2).sortBy(id => (draw(id), id)).take(7).zipWithIndex
          .map { case (id, p) => (g, (p + 1).toLong, id, draw(id)) }
      }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === want)
    // partial-agg shape: no window sort over the full corpus
    val plan = CorpusOps.stratifiedSample(docs, n = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sample plan fell back to a window:\n$plan")
  }
}
