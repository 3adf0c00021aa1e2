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

/** Exact heavy hitters (hot domains, stopword-scale tokens) via a
  * Misra-Gries mergeable summary + an exact confirm pass — the two-pass
  * pattern a 100 TB pipeline uses when the key universe (every token /
  * domain on the web) is too large to shuffle as a full groupBy count.
  *
  * Pass 1 collapses the stream map-side into ONE k-counter summary per
  * partition (an ObjectHashAggregate partial merge; the shuffle moves k
  * entries per partition, never the key universe). The Misra-Gries bound
  * — any key with true frequency > n/(k+1) survives decrements, and the
  * pairwise merge (sum counts, then subtract the (k+1)-th largest and
  * drop non-positives) preserves that bound regardless of merge order
  * (Agarwal et al., "Mergeable Summaries", PODS 2012) — makes the
  * surviving key set a guaranteed SUPERSET of the true heavy hitters.
  * Pass 2 broadcasts the <= k candidates back, semi-joins the stream
  * (almost everything is filtered before the exchange), counts exactly,
  * and keeps keys with cnt * (k+1) > n.
  *
  * The summary CONTENTS are order-dependent (which extra sub-threshold
  * keys survive varies with partitioning) but the final output is a pure
  * function of the data — exactly the keys above the threshold, with
  * exact counts — so the operator hash-checks against a plain
  * GROUP BY ... HAVING oracle that never sees the sketch.
  */
object HeavyHitters {

  /** Misra-Gries candidate summary over a BIGINT key column: the <= k
    * surviving keys, sorted. */
  def mgCandidates(key: Column, k: Int): Column =
    E.column(MisraGriesAgg(E.expression(key), k).toAggregateExpression())

  /** q104 shape: exact heavy-hitter tokens of the document corpus.
    * Keys are xxhash64(token) inside the sketch (a collision only merges
    * two candidates' counts upward — the superset guarantee is
    * unaffected); the confirm pass counts the true token strings.
    * Output: (tok, cnt) for every token with cnt * (k+1) > total. */
  def tokenHeavyHitters(docs: DataFrame, k: Int = 255): DataFrame = {
    val toks = docs
      .select(explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
    // one pass, one row: the candidate summary and the exact stream
    // length together (localCheckpoint: two consumers below, and a 1-row
    // result must not replay the corpus scan per consumer)
    val summary = toks
      .agg(mgCandidates(xxhash64(col("tok")), k).as("cand"),
        count(lit(1)).as("n"))
      .localCheckpoint(false)
    val cand = summary.select(explode(col("cand")).as("kh")).distinct()
    val confirmed = toks
      .join(broadcast(cand), xxhash64(col("tok")) === cand("kh"), "leftsemi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    Scalars.join(confirmed, summary.select(col("n")))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("tok"), col("cnt"))
  }

  /** DuckDB replica of [[tokenHeavyHitters]]: the sketch never changes
    * the answer, so the oracle is the definitionally-exact form. */
  def tokenHeavyHittersSql(k: Int = 255, src: String = "documents"): String =
    s"""WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |   FROM $src rdocs),
       | n AS (SELECT count(*) AS n FROM toks)
       | SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
       | HAVING count(*) * ${k + 1} > (SELECT n FROM n)"""
      .stripMargin.replace("\n", " ")
}

/** Misra-Gries frequency summary as a native TypedImperativeAggregate.
  * Buffer: up to k (key -> count) entries. Update: increment if present;
  * insert at 1 if room; else decrement every entry by 1 and drop zeros
  * (the arrival itself is absorbed by the decrement). Merge: sum both
  * maps, then if more than k entries remain subtract the (k+1)-th
  * largest count from all and drop non-positives. Both steps keep the
  * invariant est(key) >= true(key) - n/(k+1) for the rows folded so far.
  * Eval: the surviving keys, sorted ascending (counts are summary-
  * internal estimates, deliberately not exposed — callers confirm
  * exactly). */
case class MisraGriesAgg(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(k > 0 && k <= (1 << 20), s"misra_gries: k in (0, 2^20], got $k")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries: key must be BIGINT, got ${key.dataType}")

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val kv = key.eval(input)
    if (kv != null) {
      val kl = kv.asInstanceOf[Long]
      val cur = buf.get(kl)
      if (cur != 0L || buf.containsKey(kl)) buf.put(kl, cur + 1)
      else if (buf.size < k) buf.put(kl, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
                     b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b.forEach { (kk, v) =>
      val cur = a.get(kk)
      a.put(kk, cur + v)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from every entry, drop <= 0
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val keys = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (kk, v) => out.writeLong(kk); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Long, Long](k * 2)
    var i = 0
    while (i < n) { m.put(in.readLong(), in.readLong()); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(key = c(0))
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}
