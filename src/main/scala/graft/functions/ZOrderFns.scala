package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving as one codegen'd kernel.
  *
  * Interleaves the low `bits` bits of N long-valued bucket indices into
  * a single z-value: bit `i` of column `j` lands at z-position
  * `i * N + j`. Rows close in z are close in EVERY interleaved
  * dimension, so range-partitioning + sorting a corpus by z gives each
  * output file a bounded hyper-rectangle of the key space — parquet
  * footer min/max then prunes files for predicates on ANY of the
  * interleaved columns, not just the leading sort key. This is the
  * layout trick behind multi-dimensional clustering in lakehouse table
  * formats; here it is an Expression + [[graft.ml.DatasetOps
  * .writeZOrdered]] with the bucket normalization kept visible.
  *
  * NULL inputs interleave as bucket 0 (they sort with the smallest
  * keys); callers normalize values into [0, 2^bits) buckets first —
  * the kernel masks to `bits` so out-of-range buckets wrap rather than
  * corrupt neighboring columns' bit positions.
  */
object ZOrderFns {
  private def col(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** Z-value of `cols` (each already a [0, 2^bits) bucket index, long). */
  def interleaveBits(cols: Seq[Column], bits: Int): Column =
    col(InterleaveBitsExpr(cols.map(c => expr(c.cast("long"))), bits))

  // static kernel (called from generated code)
  def interleaveKernel(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    val mask = (1L << bits) - 1L
    var z = 0L
    var j = 0
    while (j < n) {
      val v = vals(j) & mask
      var i = 0
      while (i < bits) {
        z |= ((v >>> i) & 1L) << (i * n + j)
        i += 1
      }
      j += 1
    }
    z
  }
}

case class InterleaveBitsExpr(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.nonEmpty, "interleave_bits needs at least one column")
  require(bits >= 1 && bits * children.size <= 63,
    s"interleave_bits: bits * columns must fit a long, got $bits * ${children.size}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      vals(i) = if (v == null) 0L else v.asInstanceOf[Long]
      i += 1
    }
    ZOrderFns.interleaveKernel(vals, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val setters = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? 0L : ${e.value};"
    }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      long[] $arr = new long[${children.size}];
      $setters
      long ${ev.value} = graft.functions.ZOrderFns.interleaveKernel($arr, $bits);""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "interleave_bits"
}
