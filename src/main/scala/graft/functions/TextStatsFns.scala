package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text-statistics kernels (r19, guide §1.2 "per-task
  * work" + §2.4 "remove shuffles outright").
  *
  * [[qualityScore]] replaces the composed
  * `distinctTokenRatio·0.5 + (1 − |meanWordLen − 5|/10)·0.3 +
  * stopwordRatio·0.2` form, whose three ratio legs each re-ran
  * `split(text, "\s+")` (CollapseProject inlines the tokenization into
  * every consumer) and whose `aggregate`/`filter` HOF legs evaluate
  * interpreted per element. One pass, identical doubles in the identical
  * operation order (TextStatsFnsSpec pins the equivalence on an edge
  * battery; the oracle hash pins it on the corpus).
  *
  * [[repetitionStats]] collapses the Gopher repetition audit — per-doc
  * top-2-gram mass and duplicated-5-gram mass — from an
  * explode → groupBy(doc, gram) → groupBy(doc) → join-back plan (4
  * exchanges, gram-cardinality shuffle rows) to a ZERO-exchange narrow
  * map: both statistics are per-document functions, so nothing ever
  * needs to leave the row. At 100 TB the explode form shuffles the
  * corpus × grams-per-doc; this shuffles nothing.
  */
object TextStatsFns {
  private def col(e: Expression): Column = org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def qualityScore(text: Column): Column = col(QualityScoreExpr(expr(text)))

  /** struct(top2_frac, dup5_frac) — null for null text (callers coalesce
    * to 0.0, matching the old left-join contract). */
  def repetitionStats(text: Column): Column = col(RepetitionStatsExpr(expr(text)))

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** The stopword set of [[graft.ml.TextAnalysis.stopwords]], frozen here
    * as a hash set; TextStatsFnsSpec asserts the two stay identical. */
  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "for",
      "on", "with", "as", "at", "by", "from", "or", "be", "are").foreach(s.add)
    s
  }

  /** Exactly `distinctTokenRatio(t)·0.5 + (1.0 − |meanWordLen(t) − 5.0| /
    * 10.0)·0.3 + stopwordRatio(t)·0.2` over `t = split(text, "\s+")`:
    * - token lengths count CODE POINTS (Spark `length`), summed as INT
    *   (the composed `aggregate(t, lit(0), acc + length(x))` seed type);
    * - distinct is exact-string first-occurrence;
    * - the stopword test lowercases like Spark `lower` (UTF8String
    *   toLowerCase) before the set probe;
    * - every divide/multiply/add replays the composed tree's order, so
    *   the doubles are bit-identical. `split` never returns an empty
    *   array, so the ratios' denominator is ≥ 1. */
  def qualityScoreKernel(text: UTF8String): Double = {
    val ts = Ws.split(text.toString, -1)
    val n = ts.length
    val seen = new java.util.HashSet[String]()
    var lenSum = 0
    var stop = 0
    var i = 0
    while (i < n) {
      val t = ts(i)
      seen.add(t)
      lenSum += t.codePointCount(0, t.length)
      if (Stopwords.contains(
          UTF8String.fromString(t).toLowerCase.toString)) stop += 1
      i += 1
    }
    val dr = seen.size.toDouble / n
    val mwl = lenSum.toDouble / n
    val sr = stop.toDouble / n
    dr * 0.5 + (1.0 - math.abs(mwl - 5.0) / 10.0) * 0.3 + sr * 0.2
  }

  /** struct of the Gopher-rule metrics and booleans (see
    * [[graft.ml.TextAnalysis.gopherRules]] for the rule definitions);
    * null for null text. */
  def gopherRules(text: Column, minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, maxBulletFrac: Double,
      maxEllipsisFrac: Double, minAlphaFrac: Double,
      minStopHits: Int): Column =
    col(GopherRulesExpr(expr(text), minWords, maxWords, minMeanWordLen,
      maxMeanWordLen, maxSymbolRatio, maxBulletFrac, maxEllipsisFrac,
      minAlphaFrac, minStopHits))

  private val NewlinePat = java.util.regex.Pattern.compile("\n")
  private val BulletPat = java.util.regex.Pattern.compile("^[-*•]")
  private val EllipsisPat = java.util.regex.Pattern.compile("""(\.\.\.|…)$""")

  /** The Gopher stop-word set of [[graft.ml.TextAnalysis.gopherStopwords]],
    * frozen here; TextStatsFnsSpec asserts the two stay identical. */
  private val GopherStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "be", "to", "of", "and", "that", "have", "with").foreach(s.add)
    s
  }

  /** One fused pass over the document for every Gopher rule — exactly the
    * composed column lattice of TextAnalysis.gopherRules:
    * - words = split(\s+, -1) minus empties, lengths in code points,
    *   lengths summed as LONG (the composed lit(0L) seed);
    * - stop_hits counts DISTINCT lowercased words (UTF8String
    *   toLowerCase) in the Gopher stop set;
    * - symCnt counts '#' chars plus non-overlapping leftmost "..."
    *   matches (the split-size-minus-1 formulation);
    * - bullet/ellipsis tests run the IDENTICAL Java regexes on
    *   space-only-trimmed lines (rlike = regex find, including the
    *   $-before-final-terminator subtlety);
    * - every threshold compares in the same multiply form
    *   (count vs threshold · denominator), same double promotions. */
  def gopherRulesKernel(text: UTF8String, minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxSymbolRatio: Double, maxBulletFrac: Double,
      maxEllipsisFrac: Double, minAlphaFrac: Double,
      minStopHits: Int): GenericInternalRow = {
    val s = text.toString
    val ts = Ws.split(s, -1)
    var nw = 0
    var lenSum = 0L
    var alphaCnt = 0
    val stopSeen = new java.util.HashSet[String]()
    var i = 0
    while (i < ts.length) {
      val w = ts(i)
      if (w.nonEmpty) {
        nw += 1
        lenSum += w.codePointCount(0, w.length)
        var hasAlpha = false
        var j = 0
        while (!hasAlpha && j < w.length) {
          val c = w.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          j += 1
        }
        if (hasAlpha) alphaCnt += 1
        val lw = UTF8String.fromString(w).toLowerCase.toString
        if (GopherStops.contains(lw)) stopSeen.add(lw)
      }
      i += 1
    }
    val stopHits = stopSeen.size
    // '#' occurrences + non-overlapping leftmost "..." matches
    var symCnt = 0
    i = 0
    while (i < s.length) { if (s.charAt(i) == '#') symCnt += 1; i += 1 }
    i = 0
    while (i + 3 <= s.length) {
      if (s.charAt(i) == '.' && s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
        symCnt += 1; i += 3
      } else i += 1
    }
    val lines = NewlinePat.split(s, -1)
    val nl = lines.length
    var bulletCnt = 0
    var ellipsisCnt = 0
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      // Spark ltrim/rtrim remove the SPACE character (0x20) only
      var a = 0
      while (a < l.length && l.charAt(a) == ' ') a += 1
      if (BulletPat.matcher(l.substring(a)).find()) bulletCnt += 1
      var b = l.length
      while (b > 0 && l.charAt(b - 1) == ' ') b -= 1
      if (EllipsisPat.matcher(l.substring(0, b)).find()) ellipsisCnt += 1
      i += 1
    }
    val nonEmpty = nw > 0
    val ruleWordCount = nw >= minWords && nw <= maxWords
    val ruleMeanWordLen = nonEmpty &&
      lenSum.toDouble >= minMeanWordLen * nw &&
      lenSum.toDouble <= maxMeanWordLen * nw
    val ruleSymbolRatio = nonEmpty && symCnt.toDouble < maxSymbolRatio * nw
    val ruleAlpha = nonEmpty && alphaCnt.toDouble >= minAlphaFrac * nw
    val ruleBullet = bulletCnt.toDouble < maxBulletFrac * nl
    val ruleEllipsis = ellipsisCnt.toDouble < maxEllipsisFrac * nl
    val ruleStopwords = stopHits >= minStopHits
    val ruleNoBrace = !text.contains(BraceU8)
    val ruleNoLorem = !text.toLowerCase.contains(LoremU8)
    val keep = ruleWordCount && ruleMeanWordLen && ruleSymbolRatio &&
      ruleAlpha && ruleBullet && ruleEllipsis && ruleStopwords &&
      ruleNoBrace && ruleNoLorem
    new GenericInternalRow(Array[Any](nw, stopHits, ruleWordCount,
      ruleMeanWordLen, ruleSymbolRatio, ruleAlpha, ruleBullet, ruleEllipsis,
      ruleStopwords, ruleNoBrace, ruleNoLorem, keep))
  }

  private val BraceU8 = UTF8String.fromString("{")
  private val LoremU8 = UTF8String.fromString("lorem ipsum")

  /** Per-doc mass of in-order n-grams WITH repeats (ngramsAll semantics:
    * docs shorter than n tokens have none): top2 = max over distinct
    * 2-grams of count·gramChars; dup5 = Σ over distinct 5-grams with
    * count ≥ 2 of count·gramChars; both divided by length(text) (code
    * points) exactly as the composed `m.cast(double) / len`. Docs with
    * no grams yield 0.0 — the old plan's left-join-miss → coalesce. */
  def repetitionStatsKernel(text: UTF8String): GenericInternalRow = {
    val ts = Ws.split(text.toString, -1)
    val len = text.numChars()
    def mass(n: Int, dupOnly: Boolean): Double = {
      if (ts.length < n) return 0.0
      val counts = new java.util.HashMap[String, Long]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= ts.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      var acc = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        val g = e.getKey
        val v = c * g.codePointCount(0, g.length)
        if (dupOnly) { if (c >= 2) acc += v }
        else if (v > acc) acc = v
      }
      acc.toDouble / len
    }
    new GenericInternalRow(Array[Any](mass(2, dupOnly = false),
      mass(5, dupOnly = true)))
  }
}

case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextStatsFns.qualityScoreKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsFns.qualityScoreKernel($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "quality_score"
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top2_frac", DoubleType, nullable = false),
    StructField("dup5_frac", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextStatsFns.repetitionStatsKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsFns.repetitionStatsKernel($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}

case class GopherRulesExpr(child: Expression, minWords: Int, maxWords: Int,
    minMeanWordLen: Double, maxMeanWordLen: Double, maxSymbolRatio: Double,
    maxBulletFrac: Double, maxEllipsisFrac: Double, minAlphaFrac: Double,
    minStopHits: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("rule_word_count", BooleanType, nullable = false),
    StructField("rule_mean_word_len", BooleanType, nullable = false),
    StructField("rule_symbol_ratio", BooleanType, nullable = false),
    StructField("rule_alpha", BooleanType, nullable = false),
    StructField("rule_bullet", BooleanType, nullable = false),
    StructField("rule_ellipsis", BooleanType, nullable = false),
    StructField("rule_stopwords", BooleanType, nullable = false),
    StructField("rule_no_brace", BooleanType, nullable = false),
    StructField("rule_no_lorem", BooleanType, nullable = false),
    StructField("keep", BooleanType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextStatsFns.gopherRulesKernel(input.asInstanceOf[UTF8String], minWords,
      maxWords, minMeanWordLen, maxMeanWordLen, maxSymbolRatio,
      maxBulletFrac, maxEllipsisFrac, minAlphaFrac, minStopHits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextStatsFns.gopherRulesKernel($c, $minWords, " +
        s"$maxWords, ${minMeanWordLen}D, ${maxMeanWordLen}D, " +
        s"${maxSymbolRatio}D, ${maxBulletFrac}D, ${maxEllipsisFrac}D, " +
        s"${minAlphaFrac}D, $minStopHits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gopher_rules"
}
