package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native dot-product expressions for the ANN hot path. The composable
  * alternative — `aggregate(zip_with(a, b, _*_), 0, _+_)` — materializes an
  * intermediate array and evaluates two interpreted higher-order lambdas
  * PER CANDIDATE PAIR; these walk the two UnsafeArrayData buffers in one
  * primitive loop, no allocation. CodegenFallback is fine: the loop body
  * dominates and the expression still runs inside the surrounding
  * whole-stage-codegen'd projection. Exactness unchanged (same integer /
  * IEEE double op sequence), so oracle hashes are unaffected.
  */
case class LongDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "long_dot"
}

/** All hyperplane sign bits in ONE pass over the quantized vector. Plane
  * j's weight for 0-based element i is ((i+1)*(j+3)) % 3 - 1 ∈ {-1,0,1}
  * (same formula as [[Ann.NumPlanes]]'s per-plane `zip_with` form and the
  * generated DuckDB oracle SQL — identical integer math, identical bucket
  * values); bit j of the result is set iff the projection is > 0. The
  * composable form re-walked the 64-element array once per plane through
  * two interpreted lambdas each — this walks it once total.
  */
case class HyperplaneBucket(child: Expression, planes: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Long](planes)
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      var j = 0
      while (j < planes) { acc(j) += v * (((i + 1) * (j + 3)) % 3 - 1); j += 1 }
      i += 1
    }
    var b = 0L
    var j = 0
    while (j < planes) { if (acc(j) > 0) b |= 1L << j; j += 1 }
    b
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

case class DoubleDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "double_dot"
}

object VectorExpressions {
  def longDot(a: Column, b: Column): Column =
    ExpressionUtils.column(LongDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def doubleDot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def hyperplaneBucket(q: Column, planes: Int): Column =
    ExpressionUtils.column(HyperplaneBucket(ExpressionUtils.expression(q), planes))
}
