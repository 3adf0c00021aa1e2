package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs per
  * group in a heap. The point is the PARTIAL phase: Spark runs this as an
  * ObjectHashAggregate with map-side combine, so a groupBy(query).agg(topK)
  * over Q×N scored candidates shuffles only (#partitions × Q groups × k
  * entries) — the window alternative (`row_number over partitionBy(query)`)
  * shuffles all Q×N rows. That delta is the difference between an exact
  * distributed kNN that scales and one that dies at 100 TB.
  *
  * Output: array<struct<nn_id, score>> sorted best-first; rank = posexplode
  * ordinal + 1. Deterministic total order (score desc, id asc) — safe to
  * hash-compare against a brute-force SQL oracle.
  *
  * Accepts a LongType or DoubleType score. Doubles are folded through the
  * order-preserving IEEE-754 bit bijection (sign bit kept, lower 63 bits
  * flipped for negatives), so the heap and the serialized buffer stay pure
  * (Long, Long) pairs; eval maps the kept scores back, so the output score
  * field has the input's type. Same float total order as a
  * `ORDER BY score DESC` (−0.0 sorts just below +0.0; NaN would sort above
  * +Inf — callers on the cosine path filter zero-norm vectors instead of
  * feeding NaN).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  require(k > 0, "k must be positive")

  // dataType is only known post-analysis (a Column-built child starts
  // unresolved), so the BIGINT/DOUBLE restriction lives in
  // checkInputDataTypes, not a constructor require
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == LongType || score.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score: score must be BIGINT or DOUBLE, got ${score.dataType}")

  private def scoreIsDouble: Boolean = score.dataType == DoubleType
  // order-preserving bijection double -> signed long (and back)
  private def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }
  private def fromSortable(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & Long.MaxValue))

  // head of the queue = WORST kept element (smallest score, then largest id)
  private val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    override def compare(x: (Long, Long), y: (Long, Long)): Int = {
      val c = java.lang.Long.compare(y._1, x._1) // smaller score = "greater" = evicted first
      if (c != 0) c else java.lang.Long.compare(x._2, y._2) // larger id evicted first
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    new mutable.PriorityQueue[(Long, Long)]()(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Long, Long)], input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sl = if (scoreIsDouble) toSortable(s.asInstanceOf[Double]) else s.asInstanceOf[Long]
      buf.enqueue((sl, i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)], other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // best-first: score desc, id asc
    val sorted = buf.toArray.sortWith { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }
    new GenericArrayData(sorted.map(e =>
      InternalRow(e._2, if (scoreIsDouble) fromSortable(e._1) else e._1)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { e => out.writeLong(e._1); out.writeLong(e._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nn_id", LongType, nullable = false),
    StructField("score", score.dataType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column builder: topK(score, id, k) usable in groupBy().agg(). */
  def apply(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
