package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{GraftShim => E}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable frequency sketches — the streaming/distributed summaries a
  * 100 TB pipeline uses where exact per-key aggregation is unaffordable.
  *
  * [[CmsSketch]] is a count-min sketch as a native
  * TypedImperativeAggregate: the token stream collapses map-side into one
  * depth x width counter array per partition and the shuffle moves ONE
  * array per partition (an ObjectHashAggregate partial merge), never the
  * keys — the whole point of a sketch at scale. Counter updates are
  * integer sums, so the final array is order-independent and the DuckDB
  * oracle reproduces it exactly (bucket-sum GROUP BY replica); estimates
  * (min over rows) inherit the exactness, which is what lets q88
  * hash-check an "approximate" operator: approximation error vs truth is
  * the sketch's documented overestimate, not engine noise.
  */
object Sketches {

  /** CMS hash row parameters: h_i(key) = ((key * A(i) + B(i)) mod P) mod width. */
  val P: Long = Dedup.P
  val CmsA: Array[Long] = Array.tabulate(8)(i => ((i + 3) * 2654435761L) % P)
  val CmsB: Array[Long] = Array.tabulate(8)(i => ((i + 13) * 104729L) % P)

  private def bucket(tid: Column, i: Int, width: Int): Column =
    ((tid * CmsA(i) + CmsB(i)) % P) % width
  private def bucketSql(tid: String, i: Int, width: Int): String =
    s"(($tid * ${CmsA(i)} + ${CmsB(i)}) % $P) % $width"

  def cms(key: Column, weight: Column, depth: Int, width: Int): Column =
    E.column(CmsSketch(E.expression(key), E.expression(weight), depth, width)
      .toAggregateExpression())

  /** q88 shape: CMS over the token stream of `docs` (weight 1 per
    * occurrence, vocab-rank ids so the oracle replays the same keys), then
    * for every token with true count >= `minCount` the sketch estimate
    * next to the truth. At 100 TB the exact `truth` side is the thing you
    * DON'T compute — it exists here as the contract's ground truth; the
    * sketch side is one pass + one array. */
  def cmsHeavyHitters(docs: DataFrame, minCount: Long,
                      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth <= CmsA.length, s"depth <= ${CmsA.length}")
    val toks = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    // two consumers (sketch pass + truth side) — materialize the id'd
    // stream once
    val ids = toks.join(Dedup.vocab(toks), "tok").select(col("tok"), col("tid"))
      .localCheckpoint(false)
    val counters = ids.agg(cms(col("tid"), lit(1L), depth, width).as("cms"))
    val truth = ids.groupBy("tok", "tid").agg(count(lit(1)).as("true_n"))
      .filter(col("true_n") >= minCount)
    val est = (0 until depth).map(i =>
      element_at(col("cms"), (bucket(col("tid"), i, width) + lit(1L) + i * width).cast("int")))
      .reduce(least(_, _))
    Scalars.join(truth, counters)
      .select(col("tok"), col("true_n"), est.as("cms_est"))
  }

  // ---- HyperLogLog (distinct-count) registers ----
  // m = 64 registers over a 31-bit replicable hash: register = h % 64,
  // rho = trailing zeros of h/64 (+1, capped at HllMaxRho when the
  // remaining 25 bits are exhausted). The register table (group, register,
  // max rho) is pure integer column math + an order-independent MAX
  // groupBy — hash-checked cross-engine; the float harmonic-mean ESTIMATE
  // is a spec-side derivation (SketchesSpec pins its accuracy vs truth).
  val HllM = 64
  val HllMaxRho = 26
  // two multiply-mod rounds with xor-shift folds between them: a single
  // LCG round leaves the low bits of SEQUENTIAL vocab ids structured
  // (register/rho correlate, measured +50% estimate bias); this mixing
  // measures within +-7% on contiguous/strided/random id sets.
  // Intermediates stay under 2^48 — replicable in DuckDB's checked BIGINT.
  val HllA = 2654435761L
  val HllB = 104729L

  private def hllHash(tid: Column): Column = {
    val h1 = (tid * HllA) % P
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = (h2 * HllB) % P
    h3.bitwiseXOR(shiftright(h3, 13))
  }
  /** [[hllHash]] staged over CTE columns h1/h3 — see [[hllRegistersSql]]. */
  private def hllHashStagesSql(tid: String): (String, String, String) =
    (s"($tid * $HllA) % $P",
     s"(xor(h1, h1 >> 15) * $HllB) % $P",
     "xor(h3, h3 >> 13)")

  /** rho(w) = trailing zeros + 1 (capped), as a generated when-chain so
    * Spark and the SQL replica run the identical decision sequence. */
  private def rhoCol(w: Column): Column =
    (1 until HllMaxRho).foldRight(lit(HllMaxRho.toLong): Column) { (k, rest) =>
      when(w % (1L << k) === (1L << (k - 1)), k.toLong).otherwise(rest)
    }
  private def rhoSql(w: String): String =
    (1 until HllMaxRho).map(k => s"WHEN $w % ${1L << k} = ${1L << (k - 1)} THEN $k")
      .mkString("CASE ", " ", s" ELSE $HllMaxRho END")

  /** Per-group HLL register table over the token stream of `docs`:
    * (lang, register, rho) with rho = max over the group's tokens.
    * Downstream estimate: alpha_64 * 64^2 / sum(2^-rho over all 64
    * registers, absent = 0) — see SketchesSpec. */
  def hllRegisters(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("lang"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    val ids = toks.join(Dedup.vocab(toks), "tok").select(col("lang"), col("tid"))
    ids.select(col("lang"), hllHash(col("tid")).as("h"))
      .select(col("lang"), (col("h") % HllM).as("register"),
        rhoCol(floor(col("h") / HllM).cast("long")).as("r"))
      .groupBy("lang", "register").agg(max(col("r")).as("rho"))
  }

  /** DuckDB replica of [[hllRegisters]]. */
  def hllRegistersSql(src: String = "documents"): String = {
    val (s1, s3, sh) = hllHashStagesSql("v.tid")
    s"""WITH toks AS (SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |   FROM $src rdocs),
       | vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid FROM (SELECT DISTINCT tok FROM toks)),
       | s1 AS (SELECT lang, $s1 AS h1 FROM toks t JOIN vocab v USING (tok)),
       | s3 AS (SELECT lang, $s3 AS h3 FROM s1),
       | hh AS (SELECT lang, $sh AS h FROM s3)
       | SELECT lang, h % $HllM AS register,
       |   CAST(MAX(${rhoSql(s"(h // $HllM)")}) AS BIGINT) AS rho
       | FROM hh GROUP BY 1, 2""".stripMargin.replace("\n", " ")
  }

  /** Standard HLL harmonic-mean estimate from a register map (registers
    * absent from the map count as rho 0), with the small-range linear
    * counting correction. */
  def hllEstimate(registers: Map[Long, Long]): Double = {
    val alpha = 0.709 // alpha_64
    val zSum = (0 until HllM).map(j => math.pow(2.0, -registers.getOrElse(j.toLong, 0L).toDouble)).sum
    val raw = alpha * HllM * HllM / zSum
    val zeros = HllM - registers.size
    if (raw <= 2.5 * HllM && zeros > 0) HllM * math.log(HllM.toDouble / zeros) else raw
  }

  // ---- Bloom filter (membership) ----
  // Completes the sketch triad (CMS = frequency, HLL = distinct, Bloom =
  // membership). Build is an order-independent bit_or over word indices —
  // word w = OR of bit masks of every key hashing into w — so the filter
  // STATE is deterministic and both engines construct the identical
  // array; probes then agree bit-for-bit, making the no-false-negatives
  // contract (and even the exact false-positive set) hash-checkable.
  // At 100 TB this is the anti-join prefilter: the filter words table is
  // m/64 rows broadcast to the probe side; only bloom-positive rows reach
  // the expensive exact join.
  val BloomM = 4096 // bits
  val BloomK = 3    // hash rows (reuses CmsA/CmsB)

  private def bloomPositions(key: Column): Seq[Column] =
    (0 until BloomK).map(i => ((key * CmsA(i) + CmsB(i)) % P) % BloomM)
  private def bloomPositionsSql(key: String): Seq[String] =
    (0 until BloomK).map(i => s"((($key * ${CmsA(i)} + ${CmsB(i)}) % $P) % $BloomM)")

  /** Two's-complement-safe single-bit mask for j in [0, 64): Spark's
    * shiftleft wraps at 63 (Long.MinValue) where DuckDB's checked BIGINT
    * errors — both sides use the explicit branch so the words agree. */
  private def bitMask(j: Column): Column =
    when(j === 63, lit(Long.MinValue)).otherwise(pow2(j))
  private def pow2(j: Column): Column = {
    import org.apache.spark.sql.{GraftShim => E}
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    E.column(ShiftLeft(E.expression(lit(1L)), E.expression(j.cast("int"))))
  }
  private def bitMaskSql(j: String): String =
    s"(CASE WHEN $j = 63 THEN -9223372036854775808 ELSE (CAST(1 AS BIGINT) << CAST($j AS INTEGER)) END)"

  /** Bloom words table (word_idx, word) from a key frame (column `tid`). */
  def bloomBuild(keys: DataFrame): DataFrame =
    keys.select(explode(array(bloomPositions(col("tid")): _*)).as("pos"))
      .select(floor(col("pos") / 64).cast("long").as("widx"),
        bitMask(col("pos") % 64).as("b"))
      .groupBy("widx").agg(bit_or(col("b")).as("word"))

  /** q94 shape: Bloom filter built from the EVAL-set tokens (docs with
    * doc_id % `evalMod` == 0), probed by every vocab token. Output per
    * token: exact membership next to the bloom verdict — in_eval = 1 rows
    * MUST have bloom_hit = 1 (no false negatives, structural), extra
    * bloom_hit = 1 rows are the filter's documented false positives, and
    * both columns hash-compare because the whole filter is deterministic. */
  def bloomContamination(docs: DataFrame, evalMod: Int = 100): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    val ids = toks.join(Dedup.vocab(toks), "tok")
      .select(col("doc_id"), col("tok"), col("tid")).localCheckpoint(false)
    val evalKeys = ids.filter(col("doc_id") % evalMod === 0)
      .select(col("tok"), col("tid")).distinct().localCheckpoint(false)
    val words = broadcast(bloomBuild(evalKeys.select(col("tid"))))
    val vocabToks = ids.select(col("tok"), col("tid")).distinct()
    // probe: all K positions must find a set bit; a missing word row is a
    // zero word (left join + coalesce)
    val probed = vocabToks
      .select(col("tok"), col("tid"),
        posexplode(array(bloomPositions(col("tid")): _*)).as(Seq("i", "pos")))
      .select(col("tok"), col("i"), floor(col("pos") / 64).cast("long").as("widx"),
        bitMask(col("pos") % 64).as("b"))
      .join(words, Seq("widx"), "left")
      .select(col("tok"),
        when(coalesce(col("word"), lit(0L)).bitwiseAND(col("b")) =!= 0, 1L)
          .otherwise(0L).as("hit"))
      .groupBy("tok").agg(min("hit").as("bloom_hit"))
    probed.join(evalKeys.select(col("tok"), lit(1L).as("in_eval")), Seq("tok"), "left")
      .select(col("tok"), coalesce(col("in_eval"), lit(0L)).as("in_eval"), col("bloom_hit"))
  }

  /** DuckDB replica of [[bloomContamination]]. */
  def bloomContaminationSql(evalMod: Int = 100, src: String = "documents"): String = {
    val posSelects = bloomPositionsSql("tid").map(p =>
      s"SELECT tok, tid, $p AS pos FROM vocabtoks").mkString(" UNION ALL ")
    val buildSelects = bloomPositionsSql("tid").map(p =>
      s"SELECT $p AS pos FROM evalkeys").mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |   FROM $src rdocs),
       | vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid FROM (SELECT DISTINCT tok FROM toks)),
       | ids AS (SELECT t.doc_id, t.tok, v.tid FROM toks t JOIN vocab v USING (tok)),
       | evalkeys AS (SELECT DISTINCT tok, tid FROM ids WHERE doc_id % $evalMod = 0),
       | vocabtoks AS (SELECT DISTINCT tok, tid FROM ids),
       | words AS (SELECT pos // 64 AS widx, bit_or(${bitMaskSql("(pos % 64)")}) AS word
       |   FROM ($buildSelects) GROUP BY 1),
       | probes AS ($posSelects),
       | hits AS (SELECT p.tok,
       |     CASE WHEN COALESCE(w.word, 0) & ${bitMaskSql("(p.pos % 64)")} <> 0 THEN 1 ELSE 0 END AS hit
       |   FROM probes p LEFT JOIN words w ON w.widx = p.pos // 64),
       | verdict AS (SELECT tok, CAST(min(hit) AS BIGINT) AS bloom_hit FROM hits GROUP BY tok)
       | SELECT v.tok, CAST(CASE WHEN e.tok IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_eval,
       |   v.bloom_hit
       | FROM verdict v LEFT JOIN (SELECT DISTINCT tok FROM evalkeys) e USING (tok)"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB replica of [[cmsHeavyHitters]] (same hash rows, same vocab
    * ranks, bucket sums instead of the streaming aggregate). */
  def cmsHeavyHittersSql(minCount: Long, depth: Int = 4, width: Int = 256,
                         src: String = "documents"): String = {
    val hRows = (0 until depth).map(i =>
      s"SELECT tid, $i AS i, ${bucketSql("tid", i, width)} AS b FROM (SELECT DISTINCT tid FROM tt)")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |   FROM $src rdocs),
       | vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) AS tid FROM (SELECT DISTINCT tok FROM toks)),
       | tt AS (SELECT t.tok, v.tid FROM toks t JOIN vocab v USING (tok)),
       | truth AS (SELECT tok, tid, count(*) AS true_n FROM tt GROUP BY 1, 2),
       | h AS ($hRows),
       | counters AS (SELECT h.i, h.b, SUM(tr.true_n) AS cnt FROM h JOIN truth tr USING (tid) GROUP BY 1, 2),
       | est AS (SELECT tr.tok, tr.true_n, MIN(c.cnt) AS cms_est FROM truth tr
       |   JOIN h USING (tid) JOIN counters c ON c.i = h.i AND c.b = h.b GROUP BY 1, 2)
       | SELECT tok, CAST(true_n AS BIGINT) AS true_n, CAST(cms_est AS BIGINT) AS cms_est
       | FROM est WHERE true_n >= $minCount""".stripMargin.replace("\n", " ")
  }
}

/** Count-min sketch aggregate: buffer = depth x width Long counters;
  * update adds `weight` at h_i(key) per row i; merge is elementwise add.
  * Output: array<bigint> of length depth * width, row-major. */
case class CmsSketch(
    key: Expression,
    weight: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && depth <= Sketches.CmsA.length && width > 0)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType && weight.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_sketch: key and weight must be BIGINT, got ${key.dataType}, ${weight.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    val w = weight.eval(input)
    if (k != null && w != null) {
      val kl = k.asInstanceOf[Long]
      val wl = w.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val b = ((kl * Sketches.CmsA(i) + Sketches.CmsB(i)) % Sketches.P % width).toInt
        buffer(i * width + b) += wl
        i += 1
      }
    }
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buffer.length * 8)
    val out = new DataOutputStream(bos)
    buffer.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(depth * width)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, weight)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketch =
    copy(key = c(0), weight = c(1))
  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "cms_sketch"
}
