package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All 12 production MinHash signature values in ONE native pass over the
  * document text: tokenize on single spaces (empties dropped), build each
  * word-3-shingle's UTF-8 bytes in a reusable buffer, `xxhash64` it (seed
  * 42 — the `functions.xxhash64` default), and fold the 12 affine mins
  * `min_sh (pmod(h, P) * A_i + B_i) % P` as it goes.
  *
  * Why native: the column form needs 13 higher-order-function passes
  * (`transform` + 12 `array_min(transform(...))`) and HOFs are
  * CodegenFallback with per-element boxing — measured 2.4x the wall time of
  * even the exploded shuffle form at sf0.1. This expression allocates
  * nothing per shingle (one growable byte buffer + one 12-long accumulator
  * per row) and the shingle bytes never leave the task — at 100 TB the
  * exploded (doc, shingle) stream is the widest intermediate of the whole
  * minhash pipeline, and this keeps it out of existence entirely.
  *
  * Parity (spec-pinned bit-equal to `minhashSig(shingledHashedIds(...))`):
  *  - `split(text, ' ')` on the literal space byte — safe on UTF-8 (no
  *    multibyte sequence contains 0x20), duplicates kept, empties dropped;
  *  - shingle = tok_i ++ ' ' ++ tok_{i+1} ++ ' ' ++ tok_{i+2}, exactly
  *    `concat_ws(" ", slice(toks, i+1, 3))`;
  *  - hash = `XXH64.hashUnsafeBytes(..., 42)` — the same call Spark's
  *    `xxhash64(string)` lowers to;
  *  - arithmetic in non-negative Longs < 2^62: overflow-free under ANSI.
  *
  * Returns `array<bigint>` of length 12, or NULL when the doc has < 3
  * tokens (no shingles — the callers' `m0 IS NOT NULL` filter drops it,
  * matching the groupBy form where an empty group emits no row).
  */
case class MinhashSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val bytes = s.getBytes // one copy; token slices index into it
    val n = bytes.length
    // token boundaries (start, end) over maximal non-space runs
    var nTok = 0
    var starts = new Array[Int](math.max(8, n / 4))
    var ends = new Array[Int](starts.length)
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val st = i
        while (i < n && bytes(i) != ' ') i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    if (nTok < 3) return null
    val mins = new Array[Long](Dedup.NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var buf = new Array[Byte](64)
    var sh = 0
    while (sh + 3 <= nTok) {
      val len = (ends(sh) - starts(sh)) + (ends(sh + 1) - starts(sh + 1)) +
        (ends(sh + 2) - starts(sh + 2)) + 2
      if (buf.length < len) buf = new Array[Byte](Integer.highestOneBit(len) * 2)
      var p = 0
      var k = 0
      while (k < 3) {
        if (k > 0) { buf(p) = ' '; p += 1 }
        val l = ends(sh + k) - starts(sh + k)
        System.arraycopy(bytes, starts(sh + k), buf, p, l)
        p += l
        k += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      var tid = h % Dedup.P
      if (tid < 0) tid += Dedup.P
      var j = 0
      while (j < Dedup.NumHashes) {
        val v = (tid * Dedup.HashA(j) + Dedup.HashB(j)) % Dedup.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinhashExpressions {
  def minhashSig(text: Column): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(text)))
}
