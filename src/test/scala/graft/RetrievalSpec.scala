package graft

import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkTest {

  // the topic-enriched corpus, collected once: the brute force runs over
  // the SAME strings the operator tokenizes
  private lazy val docs: Array[(Long, String)] = {
    import spark.implicits._
    graft.ops.Retrieval.corpus(spark.read.parquet(s"$Sf/documents.parquet"))
      .select("doc_id", "text").as[(Long, String)].collect()
  }

  private def corpusDf = graft.ops.Retrieval.corpus(
    spark.read.parquet(s"$Sf/documents.parquet"))

  private def tf(text: String): Map[String, Long] =
    text.split(" ").filter(_.nonEmpty).groupBy(identity).map { case (t, a) => t -> a.length.toLong }

  test("tfIdfTopK == brute-force integer scoring (exact, including ties)") {
    import spark.implicits._
    val n = docs.length
    val tfs = docs.map { case (id, t) => id -> tf(t) }.toMap
    val dfm = tfs.values.flatMap(_.keys).groupBy(identity).map { case (t, a) => t -> a.size }
    val w = dfm.collect { case (t, df) if df * 2 <= n =>
      t -> math.floor(graft.ops.Retrieval.IdfScale * n / df).toLong
    }
    val queries = docs.map(_._1).filter(_ % 50 == 0)
    val expect = queries.flatMap { q =>
      val qtoks = tfs(q).keySet
      val scored = docs.collect { case (d, _) if d != q =>
        val sc = qtoks.iterator.flatMap(t => w.get(t).map(_ * tfs(d).getOrElse(t, 0L))).sum
        (d, sc)
      }.filter(_._2 > 0)
      scored.sortBy { case (d, sc) => (-sc, d) }.take(10).zipWithIndex.map {
        case ((d, sc), i) => (q, (i + 1).toLong, d, sc)
      }
    }.toSet
    val got = graft.ops.Retrieval.tfIdfTopK(corpusDf, k = 10, qmod = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
    assert(got.size >= 10 * queries.length / 2, "retrieval must actually rank candidates")
  }

  test("bm25TopK ranking == brute-force double scoring (gap-guarded)") {
    import spark.implicits._
    val n = docs.length
    val tfs = docs.map { case (id, t) => id -> tf(t) }.toMap
    val dfm = tfs.values.flatMap(_.keys).groupBy(identity).map { case (t, a) => t -> a.size }
    val dl = tfs.map { case (id, m) => id -> m.values.sum }
    val avgdl = dl.values.sum.toDouble / dl.size
    val (k1, b) = (1.2, 0.75)
    val idf = dfm.collect { case (t, df) if df * 2 <= n =>
      t -> math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val queries = docs.map(_._1).filter(_ % 50 == 0)
    val expect = queries.map { q =>
      val qtoks = tfs(q).keySet
      val scored = docs.collect { case (d, _) if d != q =>
        val sc = qtoks.iterator.flatMap { t =>
          idf.get(t).flatMap { iw =>
            tfs(d).get(t).map { f =>
              iw * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * dl(d) / avgdl))
            }
          }
        }.sum
        (d, sc)
      }.filter(_._2 > 0)
      val ranked = scored.sortBy { case (d, sc) => (-sc, d) }.take(10)
      // rank decidability: adjacent non-tied scores must be separated far
      // beyond float-sum reordering noise, or be exact ties broken by id
      ranked.sliding(2).foreach {
        case Array((_, a), (_, bb)) =>
          assert(a == bb || a - bb > 1e-9 * math.max(math.abs(a), 1.0),
            s"near-tie in brute-force BM25 for query $q: $a vs $bb")
        case _ =>
      }
      q -> ranked.map(_._1).toVector
    }.toMap.filter(_._2.nonEmpty)
    val got = graft.ops.Retrieval.bm25TopK(corpusDf, k = 10, qmod = 50)
      .select("query_id", "rank", "nn_id").as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toVector }
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("bm25TopKInt == brute-force integer scoring (exact, including ties)") {
    import spark.implicits._
    val n = docs.length
    val tfs = docs.map { case (id, t) => id -> tf(t) }.toMap
    val dfm = tfs.values.flatMap(_.keys).groupBy(identity).map { case (t, a) => t -> a.size }
    val dl = tfs.collect { case (id, m) if m.nonEmpty => id -> m.values.sum }
    val sumdl = dl.values.sum
    val m = dl.size.toLong
    val idfw = dfm.collect { case (t, df) if df * 2 <= n =>
      t -> math.floor(graft.ops.Retrieval.Bm25Scale *
        math.log(1.0 + (n - df + 0.5) / (df + 0.5))).toLong
    }
    val queries = docs.map(_._1).filter(_ % 50 == 0)
    val expect = queries.flatMap { q =>
      val qtoks = tfs(q).keySet
      val scored = docs.collect { case (d, _) if d != q =>
        val sc = qtoks.iterator.flatMap { t =>
          idfw.get(t).flatMap { iw =>
            tfs(d).get(t).map { f =>
              (iw * 22 * f * sumdl) / (10 * f * sumdl + 3 * sumdl + 9 * dl(d) * m)
            }
          }
        }.sum
        (d, sc)
      }.filter(_._2 > 0)
      scored.sortBy { case (d, sc) => (-sc, d) }.take(10).zipWithIndex.map {
        case ((d, sc), i) => (q, (i + 1).toLong, d, sc)
      }
    }.toSet
    val got = graft.ops.Retrieval.bm25TopKInt(corpusDf, k = 10, qmod = 50)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
    assert(got.size >= 10 * queries.length / 2, "retrieval must actually rank candidates")
  }

  test("bm25 fixed-point idf floors sit far from their boundaries") {
    // the one float touchpoint of bm25TopKInt is floor(Bm25Scale * ln(x)):
    // a cross-engine ln divergence (<= a few ulps, ~2e-11 at these
    // magnitudes) could only flip the floor if the value sat within that
    // distance of an integer. Measure the REAL margins over every realized
    // df at this SF and pin a floor 5 orders looser than the divergence.
    val n = docs.length
    val dfs = docs.flatMap { case (_, t) => t.split(" ").filter(_.nonEmpty).distinct }
      .groupBy(identity).values.map(_.length).toSet
    val margins = dfs.filter(_ * 2 <= n).map { df =>
      val v = graft.ops.Retrieval.Bm25Scale * math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      math.min(v - math.floor(v), math.ceil(v) - v)
    }
    assert(margins.nonEmpty)
    assert(margins.min > 1e-6, s"idf too close to a floor boundary: min margin ${margins.min}")
  }
}
