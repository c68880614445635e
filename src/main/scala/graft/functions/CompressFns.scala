package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-based repetitiveness signal: `deflate_len(text)` — the
  * DEFLATE-compressed byte length of the UTF-8 text at a fixed level.
  * `deflate_len / octet_length` is the classic machine-generated-spam /
  * boilerplate detector (highly repetitive pages compress far below
  * natural prose; the Gopher-family pipelines cut on exactly this
  * ratio). A native codegen'd Catalyst expression — the per-row zlib
  * pass is the whole cost, so it must run inside whole-stage codegen,
  * not as a Scala UDF with encoder boxing.
  *
  * Determinism: level pinned to 6 and strategy default, so output
  * length is a pure function of the bytes for a given zlib build (the
  * JDK's bundled zlib — stable within a deployment). No cross-engine
  * oracle exists (DuckDB has no deflate), so the gate is a rows-only
  * check and the VALUES are pinned by spec fixtures instead. */
object CompressFns {
  private def col(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def deflateLen(text: Column): Column = col(DeflateLenExpr(expr(text)))

  /** Compressed-size / input-size; null on null, 1.0 on empty (nothing
    * to compress — the neutral value for a threshold). Bounded by
    * 1 + ~16/octet_length: the deflate stream's fixed ~11-byte header
    * dominates tiny inputs (a 3-byte doc scores ~3.7), while long text
    * lands in (0, ~1.02]. */
  def compressionRatio(text: Column): Column = {
    import org.apache.spark.sql.functions._
    val len = octet_length(text)
    when(text.isNull, lit(null)).otherwise(
      when(len === 0, lit(1.0))
        .otherwise(deflateLen(text).cast("double") / len))
  }

  // ---- static kernel (called from generated code) -------------------------

  // ThreadLocal Deflater (the ShingleFns.Md5 pattern): constructing one
  // per row allocates ~256 KB of native zlib state on the whole-stage-
  // codegen hot path — reset() reuses the stream across rows
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val deflateBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def deflateLenKernel(u: UTF8String): Int = {
    val in = u.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = deflateBuf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    CompressFns.deflateLenKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CompressFns.deflateLenKernel($c);"
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_len"
}
