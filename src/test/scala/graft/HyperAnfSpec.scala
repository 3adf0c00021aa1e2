package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{HyperAnf, LinkGraph}

class HyperAnfSpec extends AnyFunSuite with SparkTest {

  /** Reference hash/register, mirroring the closed form. */
  private def reg(id: Long): (Long, Long) = {
    val h1 = (id * 2654435761L) % 4294967296L
    val h2 = (h1 * 40503L + 17L) % 4294967296L
    val rest = h2 / HyperAnf.M
    var rho = 1L
    while (rho < HyperAnf.RhoMax && (rest & ((1L << rho) - 1)) != (1L << (rho - 1)))
      rho += 1
    (h2 % HyperAnf.M, rho)
  }

  test("registers equal the HLL of the exact r-hop reach set (fixture graph)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val edges = LinkGraph.synthEdges(docs).as[(Long, Long)].collect()
    val nodes = docs.select("doc_id").as[Long].collect()
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    // exact ball(v, Rounds) by BFS
    def ball(v: Long): Set[Long] = {
      var cur = Set(v)
      for (_ <- 1 to HyperAnf.Rounds)
        cur = cur ++ cur.flatMap(w => out.getOrElse(w, Array.empty[Long]))
      cur
    }
    val want = nodes.flatMap { v =>
      ball(v).map(reg).groupBy(_._1).view.mapValues(_.map(_._2).max)
        .map { case (r, m) => (v, r, m) }
    }.toSet

    val got = HyperAnf.docAnf(spark, Sf).as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("estimates track exact ball sizes on a planted two-community graph") {
    import spark.implicits._
    // community A: 0..199 in a ring (ball(v,3) has 4 nodes); community B:
    // 200..399 complete-ish: each links to the next 20 (mod inside B), so
    // ball(v,3) is large
    val ringE = (0L until 200L).map(i => (i, (i + 1) % 200))
    val denseE = for { i <- 200L until 400L; j <- 1L to 20L }
      yield (i, 200L + ((i - 200L + j) % 200L))
    val nodes = (0L until 400L).toDF("doc_id")
    val st = HyperAnf.anf(nodes, (ringE ++ denseE).toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)

    def estimate(regs: Array[(Long, Long, Long)]): Double = {
      val m = HyperAnf.M.toInt
      val vals = Array.fill(m)(0L)
      regs.foreach { case (_, r, v) => vals(r.toInt) = v }
      val z = 1.0 / vals.map(v => math.pow(2.0, -v.toDouble)).sum
      val raw = 0.709 * m * m * z
      val zeros = vals.count(_ == 0L)
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
    }
    val ringEst = estimate(st(0L))
    val denseEst = estimate(st(300L))
    // exact sizes: ring ball = 4; dense ball = 1 + 20 + 40 + 60 = well
    // above 60 (unions overlap); the sketch must separate them cleanly
    assert(ringEst < 10.0, s"ring ball estimate too high: $ringEst")
    assert(denseEst > 30.0, s"dense ball estimate too low: $denseEst")
    assert(denseEst > 4 * ringEst, "estimates must separate the communities")
  }
}
