package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HammingDedup

class HammingDedupSpec extends AnyFunSuite with SparkTest {

  private lazy val corpus = HammingDedup.editedCorpus(spark, Sf)

  // distinct fingerprints + class sizes, computed once for the suite
  private lazy val classes: Map[Long, (Long, Long)] = { // h -> (rep, n)
    import spark.implicits._
    HammingDedup.simhash64(corpus).as[(Long, Long)].collect()
      .groupBy(_._2).map { case (h, v) =>
        h -> (v.map(_._1).min, v.length.toLong)
      }
  }

  private lazy val got: Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    HammingDedup.hammingPairs(corpus).as[(Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
  }

  test("band join equals brute force over distinct fingerprints (pigeonhole completeness)") {
    val hs = classes.toSeq
    val want = (for {
      (ha, (ra, na)) <- hs; (hb, (rb, nb)) <- hs if ra < rb
      d = java.lang.Long.bitCount(ha ^ hb).toLong if d >= 1 && d <= HammingDedup.HamD
    } yield (ra, rb) -> (d, na, nb)).toMap
    assert(got === want)
    assert(got.nonEmpty) // the fixture plants pairs inside the radius
  }

  test("planted edited mirrors within the radius are all recalled") {
    import spark.implicits._
    val sig = HammingDedup.simhash64(corpus).as[(Long, Long)].collect().toMap
    val planted = sig.keys.filter(d => d < 2000000 && sig.contains(d + 2000000))
      .map { d =>
        val ham = java.lang.Long.bitCount(sig(d) ^ sig(d + 2000000)).toLong
        (d, ham)
      }.toSeq
    val inRadius = planted.filter { case (_, h) => h >= 1 && h <= HammingDedup.HamD }
    assert(inRadius.nonEmpty, "fixture must plant pairs inside the Hamming radius")
    inRadius.foreach { case (d, ham) =>
      val ra = classes(sig(d))._1
      val rb = classes(sig(d + 2000000))._1
      val key = if (ra < rb) (ra, rb) else (rb, ra)
      assert(got.contains(key), s"planted pair for doc $d (hamming $ham) missing")
      assert(got(key)._1 === ham)
    }
  }

  test("native plane aggregate equals the 64-column form (r6 reimplementation equality)") {
    import spark.implicits._
    val fast = HammingDedup.simhash64(corpus).as[(Long, Long)].collect().toMap
    val slow = HammingDedup.simhash64Columns(corpus).as[(Long, Long)].collect().toMap
    assert(fast === slow)
    assert(fast.nonEmpty)
  }

  test("one row per fingerprint pair (first-agreeing-band dedup, no distinct pass)") {
    import spark.implicits._
    val rows = HammingDedup.hammingPairs(corpus)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
  }

  test("exact-duplicate mass collapses: n counts the fingerprint class size") {
    val byRep = classes.values.map { case (rep, n) => rep -> n }.toMap
    got.foreach { case ((ra, rb), (_, na, nb)) =>
      assert(na === byRep(ra) && nb === byRep(rb))
    }
  }
}
