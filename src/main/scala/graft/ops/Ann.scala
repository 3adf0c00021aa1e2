package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Exactness strategy: vectors are quantized to integers
  * (`round(x*1000)` — unit-norm input, so products fit comfortably in
  * int64) and similarity = integer dot product. Integer sums are
  * order-independent, so Spark and the DuckDB oracle agree exactly, and
  * cosine thresholds become exact cross-multiplied integer predicates
  * (4*dot_ab^2 >= dot_aa*dot_bb  <=>  |cos| >= 0.5). A float-cosine
  * variant exists for production use ([[cosineTopK]], rows-only checked).
  *
  * Scale paths: brute-force is the correctness baseline (broadcast the
  * query side); [[lshNearDup]] buckets by random-hyperplane signs
  * (deterministic {-1,0,1} planes, integer dots) so the candidate join is
  *  an equi-join on bucket — the 100 TB shape.
  */
object Ann {

  val Quant = 1000.0

  /** Near-dup test corpus with planted exact duplicates (vec_id % 5 == 0
    * mirrored at vec_id + 1000000) — random unit vectors almost never reach
    * cos 0.5, so without planting, near-dup output would be vacuous. */
  def corpus(embeddings: DataFrame): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    e.unionAll(e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
  }
  val corpusSql =
    "(SELECT vec_id, embedding FROM embeddings UNION ALL " +
      "SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)"

  /** Corpus with a planted, DECIDABLE top-`copies` neighborhood per query:
    * each query vector (vec_id % qmod == 0) gets `copies` exact copies at
    * vec_id + 1000000 + j (j = 1..copies). On the raw isotropic-random
    * table a per-query recall floor is UNDECIDABLE — a random query's true
    * top-k scatters uniformly over IVF cells, so nprobe/nlist bounds the
    * expected recall (~12% at 2/16) and the per-query minimum is 0 —
    * whereas with the planted neighborhood the exact top-`copies` IS the
    * copy set (dot = self-dot beats every random dot by ~sqrt(dim) sigmas,
    * measured with margin in DedupAnnSpec), identical vectors land in the
    * query's own cell (always probed), so recall@k is structurally 100%
    * and the q76/q77 floor contracts are hash-checkable. Offsets j ∈
    * [1, copies] with copies < qmod keep planted ids off the query set
    * (id % qmod = j ≠ 0) and collision-free (query spacing qmod > copies). */
  def plantedCorpus(embeddings: DataFrame, qmod: Int, copies: Int): DataFrame = {
    require(copies < qmod, s"copies=$copies must stay below qmod=$qmod")
    val e = embeddings.select(col("vec_id"), col("embedding"))
    e.unionAll(e.filter(col("vec_id") % qmod === 0)
      .select(explode(sequence(lit(1L), lit(copies.toLong))).as("j"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") + 1000000L + col("j")).as("vec_id"), col("embedding")))
  }

  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      transform(col("embedding"), x => round(x.cast("double") * Quant).cast("long")).as("q"))

  val quantSqlExpr = "[CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT) FOR x IN embedding]"

  // native single-loop dot over UnsafeArrayData (VectorExpressions) — the
  // zip_with/aggregate composition allocates an intermediate array and runs
  // two interpreted lambdas per candidate pair, which dominates ANN queries
  private def dotCol(a: Column, b: Column): Column = VectorExpressions.longDot(a, b)

  /** Exact top-k by integer dot (desc, id asc), query side = vec_id % qmod == 0,
    * self excluded. Output (query_id, rank, nn_id, dot).
    *
    * TEST BASELINE ONLY: this is a broadcast nested-loop over Q x N with a
    * window — the simplest possible form, kept as the brute-force
    * comparison target in DedupAnnSpec. Production entry points (q27/q33)
    * use [[topKBlocked]], whose equi-join + bounded-heap partial aggregate
    * is the shape that survives 100 TB. */
  def topK(embeddings: DataFrame, k: Int, qmod: Int): DataFrame = {
    val q = quantized(embeddings)
    val queries = q.filter(col("vec_id") % qmod === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val cands = q.select(col("vec_id").as("nn_id"), col("q").as("cq"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("nn_id").asc)
    broadcast(queries).join(cands, col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dotCol(col("qq"), col("cq")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "nn_id", "dot")
  }

  /** Exact top-k restructured for scale (the q27 shape fixed): the
    * candidate pairing is a block EQUI-join — queries replicated to each of
    * `blocks` block ids, candidates keyed by `nn_id % blocks` — so both
    * sides shuffle-partition on the key (no BroadcastNestedLoopJoin, no
    * requirement that the query side fit in a broadcast), and the top-k is
    * a bounded-heap PARTIAL aggregate ([[TopKByScore]]) with map-side
    * combine, so the final shuffle carries only heaps of k entries per
    * (partition, query) instead of the Q×N scored rows a window would
    * move. Same exact result as [[topK]] — hash-checked against the same
    * brute-force DuckDB oracle (q33 vs q27). */
  def topKBlocked(embeddings: DataFrame, k: Int, qmod: Int, blocks: Int = 32): DataFrame = {
    val q = quantized(embeddings)
    val queries = q.filter(col("vec_id") % qmod === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        explode(sequence(lit(0L), lit((blocks - 1).toLong))).as("blk"))
    val cands = q.select(col("vec_id").as("nn_id"), col("q").as("cq"),
      pmod(col("vec_id"), lit(blocks.toLong)).as("blk"))
    val dots = queries.join(cands, Seq("blk"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dotCol(col("qq"), col("cq")).as("dot"))
    dots.groupBy("query_id")
      .agg(TopKByScore(col("dot"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.nn_id").as("nn_id"), col("s.score").as("dot"))
  }

  // Random-hyperplane LSH: plane j weight for dim i is wji in {-1,0,1},
  // wji = ((i+1)*(j+3) mod 3) - 1 — deterministic, integer, oracle-friendly.
  // 12 planes = 4096 buckets: candidate pairs scale ~N^2/2^planes, and 8
  // planes (256 buckets) made the bucket join the slowest bench query at
  // sf0.1 (N=30k -> ~1.8M in-bucket pairs); identical vectors still share
  // a bucket, so planted-duplicate recall is unaffected, and the oracle
  // SQL is generated from this constant so both sides move together
  val NumPlanes = 12

  /** Composable reference form of one plane's sign bit — kept as the spec
    * for [[VectorExpressions.hyperplaneBucket]] (unit-tested equal), which
    * walks the array once for ALL planes instead of twice per plane. */
  private[graft] def planeSign(q: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(q, sequence(lit(1), size(q)), (x, i) => x * ((i * (j + 3)) % 3 - 1)),
      lit(0L), (acc, v) => acc + v)
    when(proj > 0, lit(1L << j)).otherwise(lit(0L))
  }

  private[graft] def bucketReference(q: Column): Column =
    (0 until NumPlanes).map(j => planeSign(q, j)).reduce(_ + _)

  def withBucket(quant: DataFrame): DataFrame =
    quant.withColumn("bucket", VectorExpressions.hyperplaneBucket(col("q"), NumPlanes))

  /** LSH-bucketed near-dup pairs: same bucket AND cos >= 0.5 (exact integer
    * predicate). Output (vec_a, vec_b, dot). */
  def lshNearDup(embeddings: DataFrame): DataFrame = {
    val qb = withBucket(quantized(corpus(embeddings)))
    val norms = qb.select(col("vec_id"), dotCol(col("q"), col("q")).as("nrm"), col("bucket"), col("q"))
    val a = norms.as("a"); val b = norms.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        dotCol(col("a.q"), col("b.q")).as("dot"),
        col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .filter(col("dot") > 0 && col("dot") * col("dot") * 4 >= col("na") * col("nb"))
      .select("vec_a", "vec_b", "dot")
  }

  /** Semantic-dedup closing step: [[lshNearDup]] pairs -> connected
    * components ([[Dedup.components]]' large/small-star rounds) -> a
    * canonical keep list over the FULL corpus. Singletons (no near-dup
    * pair) label themselves; each cluster keeps its min vec_id. This is
    * the production embedding-dedup shape at 100 TB: candidate generation
    * is the bucket equi-join, clustering runs O(log n) rounds over only
    * the near-dup EDGES (vastly smaller than the corpus), and the final
    * labeling is one left equi-join corpus x labels where the labels side
    * holds only docs that had at least one pair. Output
    * (vec_id, cluster, keep) with keep = 1 iff vec_id is its cluster's
    * canonical representative. */
  def embNearDupClusters(embeddings: DataFrame): DataFrame = {
    val pairs = lshNearDup(embeddings)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val labels = Dedup.components(pairs)
      .select(col("doc_id").as("vec_id"), col("component"))
    corpus(embeddings).select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster"),
        when(coalesce(col("component"), col("vec_id")) === col("vec_id"), 1L)
          .otherwise(0L).as("keep"))
  }

  /** Bit-flip masks for multiprobe: every mask with <= probeRadius bits set
    * (r=2 on 12 planes: 79 masks). Shared with the DuckDB oracle SQL so the
    * probe set cannot drift between engines. */
  def probeMasks(probeRadius: Int): Seq[Long] =
    (0 until (1 << NumPlanes))
      .filter(m => java.lang.Integer.bitCount(m) <= probeRadius)
      .map(_.toLong)

  /** Sublinear approximate top-k: multiprobe hyperplane LSH. Each query
    * probes its own bucket plus every bucket within Hamming distance <=
    * `probeRadius` of it (bit-flip masks exploded on the query side), so
    * the candidate join is an EQUI-join on bucket touching only
    * sum(C(NumPlanes,i), i<=r)/2^NumPlanes of the corpus (r=2 on 12
    * planes: 79/4096 ~ 2%) instead of all N. Exact integer rerank + bounded-heap
    * top-k ([[TopKByScore]]) within candidates. "Approximate" relative to
    * exhaustive search, but fully DETERMINISTIC integer math end to end —
    * so the whole probe-join-rerank pipeline is replicated in DuckDB SQL
    * and hash-checked (q34), not merely rows-only. */
  def topKLsh(embeddings: DataFrame, k: Int, qmod: Int, probeRadius: Int = 2): DataFrame = {
    val qb = withBucket(quantized(embeddings))
    val masks = probeMasks(probeRadius)
    val cands = qb.select(col("vec_id").as("nn_id"), col("q").as("cq"), col("bucket"))
    val queries = qb.filter(col("vec_id") % qmod === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        explode(typedLit(masks)).as("mask"), col("bucket"))
      .select(col("query_id"), col("qq"),
        col("bucket").bitwiseXOR(col("mask")).as("bucket"))
    queries.join(cands, Seq("bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dotCol(col("qq"), col("cq")).as("dot"))
      .groupBy("query_id")
      .agg(TopKByScore(col("dot"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.nn_id").as("nn_id"), col("s.score").as("dot"))
  }

  // ---------------- IVF (inverted-file) ANN ----------------

  /** Deterministic Lloyd k-means trained on a bounded SAMPLE, the way a
    * real IVF build works (FAISS trains its coarse quantizer on ~a few
    * hundred vectors per centroid, never the full corpus — at 100 TB an
    * exact full-corpus k-means would re-shuffle or re-scan everything per
    * round for centroids that a sample estimates just as well). Sample =
    * the `sampleCap` lowest vec_ids (reproducible, no RNG; one TakeOrdered
    * job), init = the first `nlist` of them, then `iters` Lloyd rounds run
    * ON THE DRIVER over that sample: assign by d2 = vv - 2·v·c + cc with
    * (d2, cid) tie-break — the same formula [[assignCells]] applies
    * distributedly — and sequential-sum means (bit-deterministic, unlike
    * the distributed float avg this replaces). The full corpus is touched
    * exactly once afterwards, by the one distributed [[assignCells]] pass.
    * Returns (cid, c: Array[Double], cc). */
  private[graft] def kmeansCentroids(vecs: DataFrame, nlist: Int, iters: Int,
                                     sampleCap: Int = 65536): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] =
      vecs.orderBy("vec_id").limit(sampleCap).select(col("v"))
        .collect().map(_.getSeq[Double](0).toArray)
    // fewer sample rows than requested cells (tiny/empty table): train
    // however many centroids the sample supports instead of indexing past
    // the array — callers see k <= nlist centroids, which every downstream
    // consumer (centLit array, nprobe slice) already tolerates
    val k = math.min(nlist, sample.length)
    if (k == 0)
      return spark.emptyDataset[(Long, Seq[Double])].toDF("cid", "c")
        .withColumn("cc", lit(0.0))
    val dim = sample.head.length
    var cents: Array[Array[Double]] = sample.take(k).map(_.clone())
    val vv = sample.map(v => { var s = 0.0; var i = 0; while (i < dim) { s += v(i) * v(i); i += 1 }; s })
    (0 until iters).foreach { _ =>
      val cc = cents.map(c => { var s = 0.0; var i = 0; while (i < dim) { s += c(i) * c(i); i += 1 }; s })
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var r = 0
      while (r < sample.length) {
        val v = sample(r)
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += v(i) * cents(j)(i); i += 1 }
          val d2 = vv(r) - 2.0 * dot + cc(j)
          if (d2 < bestD) { bestD = d2; best = j } // strict < == (d2, cid) tie-break
          j += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
        r += 1
      }
      cents = Array.tabulate(k) { j =>
        // an emptied cell keeps its previous centroid
        if (counts(j) == 0) cents(j)
        else { val s = sums(j); val c = new Array[Double](dim)
          var i = 0; while (i < dim) { c(i) = s(i) / counts(j); i += 1 }; c }
      }
    }
    cents.zipWithIndex.map { case (c, j) => (j.toLong, c.toSeq) }.toSeq
      .toDF("cid", "c")
      .withColumn("cc", VectorExpressions.doubleDot(col("c"), col("c")))
  }

  /** Centroid table as ONE literal array-of-structs column (nlist structs
    * of (cid, c, cc)) — the "broadcast" is an expression constant, so
    * centroid scans are pure column math: no join, no shuffle, whole-stage
    * codegen end to end. */
  private def centLit(cents: DataFrame): Column = {
    val cs = cents.select(col("cid"), col("c"), col("cc")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    array(cs.map { case (cid, c, cc) =>
      struct(lit(cid).as("cid"), array(c.map(lit): _*).as("c"), lit(cc).as("cc"))
    }: _*)
  }

  /** (d2, cid) struct per centroid for a row's (v, vv) — argmin/sort over
    * this array replaces the crossJoin+groupBy a join-based assignment
    * needs (which re-shuffles the full corpus per k-means round). */
  private def centDists(cents: Column): Column =
    transform(cents, cs => struct(
      (col("vv") - lit(2.0) * VectorExpressions.doubleDot(col("v"), cs.getField("c"))
        + cs.getField("cc")).as("d2"),
      cs.getField("cid").as("cid")))

  /** Nearest-centroid assignment; deterministic tie-break by (d2, cid). */
  private def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs
      .withColumn("cid", array_min(centDists(centLit(cents))).getField("cid"))

  /** IVF approximate top-k: k-means coarse quantizer (the "index build"),
    * candidates = the query's `nprobe` nearest cells, exact integer-dot
    * rerank + bounded-heap top-k. The candidate join is an EQUI-join on
    * cell id touching ~nprobe/nlist of the corpus — with per-cell heavy
    * skew handled by the same bounded-heap partial agg as the LSH path.
    * Approximate by design => rows-only checked (cell shapes depend on the
    * sampled k-means training set); the deterministic
    * recall contract (an identical planted vector shares the nearest cell,
    * so a mirror is ALWAYS found at rank 1) is unit-tested AND
    * oracle-checked end-to-end by q58 over the mirrored corpus.
    * @param queryPred overrides the `vec_id % qmod == 0` query-side filter
    *                  (e.g. select only planted mirrors for the recall
    *                  contract). */
  def topKIvf(embeddings: DataFrame, k: Int, qmod: Int, nlist: Int = 16,
              nprobe: Int = 2, iters: Int = 3,
              queryPred: Option[Column] = None): DataFrame = {
    // Materialize (vec_id, q, v, vv) ONCE: it is consumed three times
    // (k-means training sample, candidate assign, query probe) — without
    // this, every consumer re-reads the parquet and re-runs the quantize +
    // double-cast + self-dot chain. Same pattern as the MinHash sig table
    // (Dedup.scala): at cluster scale this is a persisted index-build
    // table, exactly what a real IVF build (FAISS train+add) materializes.
    val vecs = quantized(embeddings).select(col("vec_id"), col("q"),
        transform(col("q"), _.cast("double")).as("v"))
      .withColumn("vv", VectorExpressions.doubleDot(col("v"), col("v")))
      .localCheckpoint(false)
    val cents = kmeansCentroids(vecs, nlist, iters)
    // empty vector table -> zero centroids; centLit's array() literal would
    // be untyped, so short-circuit to the (empty) result frame instead
    if (cents.isEmpty)
      return vecs.select(col("vec_id").as("query_id"), lit(1L).as("rank"),
        col("vec_id").as("nn_id"), lit(0L).as("dot")).limit(0)
    val cands = assignCells(vecs, cents)
      .select(col("vec_id").as("nn_id"), col("q").as("cq"), col("cid"))
    // nprobe nearest cells per query in pure column math: sort the per-row
    // (d2, cid) array, slice, explode — no join, no window shuffle
    val queries = vecs.filter(queryPred.getOrElse(col("vec_id") % qmod === 0))
      .withColumn("_pc", slice(array_sort(centDists(centLit(cents))), 1, nprobe))
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        explode(transform(col("_pc"), s => s.getField("cid"))).as("cid"))
    queries.join(cands, Seq("cid"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"), dotCol(col("qq"), col("cq")).as("dot"))
      .groupBy("query_id")
      .agg(TopKByScore(col("dot"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.nn_id").as("nn_id"), col("s.score").as("dot"))
  }

  /** Per-query recall@k of an approximate top-k against the exact top-k —
    * the quantified floor contract for the rows-only ANN paths (q29/q44):
    * recall_pct = 100 * |approx ∩ exact| / |exact| per query, emitted as a
    * hash-checkable BIGINT floor indicator (the oracle asserts every query
    * meets the floor; the percentage itself is approximate-path-dependent,
    * so it cannot be oracle-replicated — the floor can). Both inputs are
    * (query_id, rank, nn_id, ...) frames over the same query set. The
    * recall join is an equi-join on (query_id, nn_id) over two k-row-per-
    * query frames — at 100 TB these are top-k RESULTS (tiny relative to
    * the corpus), so this check costs nothing next to the searches it
    * audits. */
  def recallAtK(approx: DataFrame, exact: DataFrame, floorPct: Int): DataFrame = {
    val ex = exact.select(col("query_id"), col("nn_id"))
    val ap = approx.select(col("query_id"), col("nn_id"), lit(1L).as("hit"))
    ex.join(ap, Seq("query_id", "nn_id"), "left_outer")
      .groupBy("query_id")
      .agg((sum(coalesce(col("hit"), lit(0L))) * 100L / count(lit(1L)))
        .cast("long").as("recall_pct"))
      .select(col("query_id"),
        when(col("recall_pct") >= floorPct, 1L).otherwise(0L)
          .as(s"recall_ge_$floorPct"))
  }

  /** Production float-cosine top-k (order-dependent float sums — checked
    * rows-only, unit-tested for sanity, not DuckDB-hash-compared). */
  def cosineTopK(embeddings: DataFrame, k: Int, qmod: Int,
                 blocks: Int = 32, queryPred: Option[Column] = None): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    def dot(a: Column, b: Column) = VectorExpressions.doubleDot(a, b) // same IEEE fold order
    // zero-norm vectors would make cos NaN (and NaN outranks every real
    // score in the sortable-bits order) — exclude them as candidates AND
    // as queries, matching "undefined cosine" semantics
    val n = e.withColumn("nrm", sqrt(dot(col("v"), col("v")))).filter(col("nrm") > 0)
    // same scale shape as topKBlocked: block EQUI-join (queries replicated
    // to `blocks` block ids, candidates keyed by vec_id % blocks) + the
    // bounded-heap partial aggregate over the double cosine — no
    // BroadcastNestedLoopJoin, no window moving Q×N scored rows
    val queries = n.filter(queryPred.getOrElse(col("vec_id") % qmod === 0))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(sequence(lit(0L), lit((blocks - 1).toLong))).as("blk"))
    val cands = n.select(col("vec_id").as("nn_id"), col("v").as("cv"), col("nrm").as("cn"),
      pmod(col("vec_id"), lit(blocks.toLong)).as("blk"))
    val cos = queries.join(cands, Seq("blk"))
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
    cos.groupBy("query_id")
      .agg(TopKByScore(col("cos"), col("nn_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.nn_id").as("nn_id"))
  }
}
