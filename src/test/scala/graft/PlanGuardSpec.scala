package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: the properties that make a plan survive a
  * 100x scale-up are structural, so assert them on the PLAN, not on wall
  * time. Every non-baseline query must be free of
  *  - cartesian products / broadcast nested-loop joins (all-pairs
  *    candidate generation — the classic scale-killer), and
  *  - unpartitioned window operators (single-partition sort of the world).
  * The two declared brute-force ORACLE BASELINES (q27/q29 exact top-k) are
  * exempt from the join rule by design — their scale-path replacements are
  * q33/q34/q44.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTest {

  // no exemptions remain: q27/q29 both run the blocked equi-join +
  // bounded-heap shape; the BNLJ brute forces live only inside specs
  private val bruteForceBaselines = Set.empty[String]

  private def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.sparkPlan

  private def globalWindows(plan: LogicalPlan): Seq[LogicalWindow] =
    plan.collect { case w: LogicalWindow if w.partitionSpec.isEmpty => w }

  test("no query plan contains an unpartitioned window over row-scale data") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, Sf)
      val bad = globalWindows(df.queryExecution.optimizedPlan)
        // exemption: q71's two-level prefix sum runs its only ordered scan
        // over the BLOCK-TOTAL aggregate (n_docs/blockSize rows), never the
        // corpus — recognized by the aggregate GROUPING ON THE BLOCK KEY
        // (an aggregate child alone would also match row-scale groupings
        // like a per-doc dedup, which the guard must keep catching)
        .filterNot(w => name == "q71_pack_shards" && (w.child match {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            a.groupingExpressions.exists(_.references.exists(_.name == "_blk"))
          case _ => false
        }))
      assert(bad.isEmpty,
        s"$name has ${bad.size} unpartitioned Window op(s) — single-partition sort at scale")
    }
  }

  test("prod dedup entry points run the heavy-hitter-capped path by default") {
    // semantic check, not plan text: the capped branches localCheckpoint
    // their bucket tables (a measured 2x win), which truncates lineage and
    // hides the cap aliases from the plan. Instead, plant a mega-bucket
    // just over the default cap and assert the DEFAULT call drops it.
    import spark.implicits._
    val n = graft.ops.Dedup.MaxBucketDefault + 1
    val mega = (0 until n).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    // n identical docs -> one LSH bucket of size n > MaxBucketDefault in
    // every band, and every shingle with doc-frequency n > the default
    // shingle cap: a capped default emits ZERO pairs (uncapped would emit
    // n(n-1)/2), so a silently-removed cap fails loudly here
    assert(graft.ops.Dedup.minhashPairs(mega).count() === 0L,
      "q21 entry point (minhashPairs defaults) must cap oversized LSH buckets")
    assert(graft.ops.Dedup.jaccardPairs(mega).count() === 0L,
      "q23 entry point (jaccardPairs defaults) must cap high-frequency shingles")
    // and the cap machinery itself: a small corpus under an explicit tiny
    // cap drops everything; uncapped emits all 66 pairs
    val small = (0 until 12).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    assert(graft.ops.Dedup.minhashPairs(small, maxBucket = Some(5)).count() === 0L)
    assert(graft.ops.Dedup.minhashPairs(small, maxBucket = None).count() === 66L)
    assert(graft.ops.Dedup.jaccardPairs(small, maxShingleFreq = Some(5)).count() === 0L)
    assert(graft.ops.Dedup.jaccardPairs(small, maxShingleFreq = None).count() === 66L)
  }

  test("parity vocab id join broadcasts when the dictionary is small") {
    import spark.implicits._
    // the exploded (doc, token) stream is the widest intermediate of the
    // dedup suite; with a small dictionary the id join must be a broadcast
    // hash join (the stream never enters an exchange keyed on strings).
    // denseIds is RDD-backed — without the explicit hint Catalyst has no
    // size stats and always picks a shuffle join.
    val docs = (0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma delta w$i x${i % 7} y${i % 3}"))
      .toDF("doc_id", "text")
    // the minhash sig stage localCheckpoints before bandPairs (hiding its
    // lineage from the q21 plan), so assert on the id-join subplan itself
    // (the exact shape minhashPairs builds) plus the end-to-end simhash
    // plan, where the join is visible
    val sh = graft.ops.Dedup.shingled(docs)
    val idJoin = sh.join(graft.ops.Dedup.shVocab(sh), "sh")
    for (df <- Seq(idJoin, graft.ops.Dedup.simhash(docs))) {
      df.count()
      val stringShuffleJoins = physical(df).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.leftKeys.exists(_.dataType ==
              org.apache.spark.sql.types.StringType) => j.nodeName
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.leftKeys.exists(_.dataType ==
              org.apache.spark.sql.types.StringType) => j.nodeName
      }
      assert(stringShuffleJoins.isEmpty,
        s"vocab id join shuffled on token strings: $stringShuffleJoins")
      val bhj = physical(df).collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.leftKeys.exists(_.dataType ==
              org.apache.spark.sql.types.StringType) => j.nodeName
      }
      assert(bhj.nonEmpty, "small dictionary must broadcast into the id join")
    }
    // past the limit the fallback is the shuffle join (a 10^9-entry vocab
    // is not a dim) — exercised with a temporarily tiny limit is not
    // possible (val), so assert the guard constant is sane instead
    assert(graft.ops.Dedup.BroadcastVocabLimit >= 1000000L)
  }

  test("prod minhash signature stage is exchange-free (row-local, no explode)") {
    import spark.implicits._
    val docs = (0 until 8).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val sig = graft.ops.Dedup.minhashSigProd(docs)
    val exchanges = physical(sig).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.nodeName
    }
    assert(exchanges.isEmpty,
      s"minhashSigProd plan contains ${exchanges.mkString(", ")} — the signature " +
        "must be computed inside the row (the exploded shingle stream is the " +
        "widest intermediate of the pipeline)")
    val generates = sig.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generates.isEmpty, "minhashSigProd must not explode shingles")
  }

  test("shingled (doc_id, sh) stream needs no global distinct exchange") {
    import spark.implicits._
    val docs = (0 until 8).map(i => (i.toLong, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val sh = graft.ops.Dedup.shingled(docs)
    val aggsOrExchanges = physical(sh).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.nodeName
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a.nodeName
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a.nodeName
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a.nodeName
    }
    assert(aggsOrExchanges.isEmpty,
      s"shingled plan contains ${aggsOrExchanges.mkString(", ")} — per-doc distinct " +
        "shingles are row-local; a global distinct shuffles the widest string stream")
  }

  test("no non-baseline query plan contains a cartesian or nested-loop join") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!bruteForceBaselines.contains(name)) {
        val df = fn(spark, Sf)
        val bad = physical(df).collect {
          case j: BroadcastNestedLoopJoinExec => j.nodeName
          case j: CartesianProductExec => j.nodeName
        }
        assert(bad.isEmpty,
          s"$name plan contains ${bad.mkString(", ")} — all-pairs candidate generation")
      }
    }
  }

  test("q14 salted-shuffle PIP: no ScalaUDF in the refine path") {
    // the prepared-contains refine is a native Expression
    // (GeoExpressions.PreparedContainsExpr); a ScalaUDF reappearing here
    // means CatalystTypeConverters boxing of the WKB per candidate pair
    val df = SparkEntry.queries("q14_pip_join_salted")(spark, Sf)
    val hasNative = df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[graft.ops.PreparedContainsExpr])))
    assert(hasNative, "q14 refine must be the native PreparedContainsExpr")
    // dim-side UDFs (polygon synth, cover-cell explode) run once per
    // POLYGON and are fine; what must never come back is a ScalaUDF over
    // the point-side columns — that's a per-candidate-pair boxing cost
    val pairUdfs = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
            if u.references.exists(a => a.name == "lon" || a.name == "lat") => u.toString
      })
    }.flatten
    assert(pairUdfs.isEmpty, s"ScalaUDF over point columns in q14 plan: $pairUdfs")
    // r6 (verdict item 7): the polygon cover explode is the native
    // CoverCellsExpr — no ScalaUDF over the WKB geom column either (the
    // only remaining ScalaUDFs are the closed-form fixture synthesizers
    // over (cx, cy, r) scalars)
    val hasCover = df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[graft.ops.CoverCellsExpr])))
    assert(hasCover, "q14 cover must be the native CoverCellsExpr")
    val geomUdfs = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
            if u.references.exists(_.name == "geom") => u.toString
      })
    }.flatten
    assert(geomUdfs.isEmpty, s"ScalaUDF over geom in q14 plan: $geomUdfs")
  }

  test("q26 fingerprints: native expression, no ScalaUDF on the fact path") {
    val df = SparkEntry.queries("q26_fingerprint")(spark, Sf)
    val hasNative = df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[graft.ops.WinnowFingerprints])))
    assert(hasNative, "q26 must fingerprint via the native WinnowFingerprints")
    val udfs = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u.toString
      })
    }.flatten
    assert(udfs.isEmpty, s"ScalaUDF in q26 plan: $udfs")
  }

  test("q11 passthrough: the text column never enters an exchange") {
    // the north rule's byte-identical text must ride for free — matching is
    // done on (url, coords) and pages are LEFT SEMI joined on url, so no
    // shuffle (and no broadcast) ever carries text bytes
    val df = SparkEntry.queries("q11_text_passthrough")(spark, Sf)
    val leaks = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          if e.output.exists(_.name == "text") => s"shuffle(${e.output.map(_.name).mkString(",")})"
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
          if e.output.exists(_.name == "text") => s"broadcast(${e.output.map(_.name).mkString(",")})"
    }
    assert(leaks.isEmpty, s"text bytes cross the wire: ${leaks.mkString("; ")}")
    val semi = physical(df).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.sql == "LEFT SEMI" => j.nodeName
    }
    assert(semi.nonEmpty, "q11 must be a LEFT SEMI join on url")
  }
}
