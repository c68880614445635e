package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd kernel — the first step of
  * any text-corpus cleaning pass (decomposed accents, compatibility forms
  * and width variants must collapse BEFORE hashing/shingling, or the same
  * visible text dedups into different buckets).
  *
  * Spark ships no normalizer function, so this is the canonical "custom
  * Catalyst Expression beats a UDF" case: the kernel is a static JDK
  * `java.text.Normalizer` call that whole-stage codegen inlines, with an
  * `isNormalized` fast path that makes already-NFC text (≈ all ASCII, i.e.
  * most of a web corpus) a zero-copy no-op — a UDF would pay
  * serialization + a closure dispatch per row regardless.
  */
object NormalizeFns {
  private def col(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** Canonical composition (é stays é, e + U+0301 becomes é). */
  def nfc(text: Column): Column = col(UnicodeNormalizeExpr(expr(text), "NFC"))
  /** Canonical decomposition. */
  def nfd(text: Column): Column = col(UnicodeNormalizeExpr(expr(text), "NFD"))
  /** Compatibility composition (ﬁ → fi, ① → 1, full-width → ASCII). */
  def nfkc(text: Column): Column = col(UnicodeNormalizeExpr(expr(text), "NFKC"))
  /** Compatibility decomposition. */
  def nfkd(text: Column): Column = col(UnicodeNormalizeExpr(expr(text), "NFKD"))
  /** Form by name — the YAML/stage entry point. */
  def normalize(text: Column, form: String): Column =
    col(UnicodeNormalizeExpr(expr(text), form))

  // ---- static kernel (called from generated code) -------------------------

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** `form` is validated at Expression construction, so `valueOf` here
    * cannot throw on the per-row path. The `isNormalized` probe is a
    * cheap quick-check scan (ICU-style): for ASCII it answers true
    * without allocating, and the input UTF8String is returned as-is. */
  def normalizeKernel(s: UTF8String, form: String): UTF8String = {
    // GENUINE zero-allocation ASCII fast path: all-ASCII text is
    // normalized under every form, and a mostly-ASCII web corpus must
    // not pay a per-document String copy just to ask — the old code
    // called s.toString before the isNormalized probe
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(NormalizeFns.Forms.contains(form),
    s"unicode_normalize form must be one of ${NormalizeFns.Forms.mkString("/")}, got $form")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeFns.normalizeKernel(input.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.NormalizeFns.normalizeKernel($c, "$form")""")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}
