package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FuzzyMatch

class FuzzyMatchSpec extends AnyFunSuite with SparkTest {

  test("blockedMatch: distance refine, blocking cut, length band") {
    import spark.implicits._
    val clean = Seq("alpha beta", "alpha betas", "alpxa beta", "gamma delta",
      "alphabetagamma").toDF("title")
    val dirty = Seq(
      (1L, "alpha betX"),  // dist 1/2 to "alpha beta"/"alpha betas" (same block);
                           // "alpxa beta" is dist 2 but block "alpx" -> cut
      (2L, "xlpha beta"),  // dist 1 to "alpha beta" BUT block "xlph" -> cut
      (3L, "alphabet"),    // dist 2 to "alpha beta", length delta 2 (kept);
                           // "alphabetagamma" shares the block, delta 6 -> band-cut
      (4L, "gamma delka"), // dist 1 to "gamma delta"
      (5L, "zzzz nothing")).toDF("id", "s")
    val got = FuzzyMatch.blockedMatch(dirty, clean)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "alpha beta", 1L), (1L, "alpha betas", 2L),
      (3L, "alpha beta", 2L),
      (4L, "gamma delta", 1L)))
  }

  test("q110 fixture: every planted probe recovers its source title at dist 1") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet").select("doc_id", "text")
    val got = FuzzyMatch.docFuzzyMatch(docs)
      .as[(Long, String, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._3 <= FuzzyMatch.MaxDist))
    assert(got.forall(_._1 % 5 == 0), "only dirty-side ids appear")
    // blocking + band provably keep the truth pair: each probe (one char
    // deleted past the prefix) must match SOME title at distance exactly 1
    val byId = got.groupBy(_._1)
    val probes = docs.selectExpr("doc_id",
        "concat_ws(' ', slice(filter(split(text, ' '), t -> t != ''), 1, 3)) AS title")
      .where(s"doc_id % 5 = 0 AND length(title) >= ${FuzzyMatch.BlockPrefix + 4}")
      .as[(Long, String)].collect()
    assert(probes.nonEmpty)
    probes.foreach { case (id, _) =>
      assert(byId.contains(id) && byId(id).exists(_._3 <= 1L), s"doc $id lost its match")
    }
  }
}
