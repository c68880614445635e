package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style linear text classifier kernels: hashed bag-of-ngrams
  * dot product as a native codegen'd narrow map (the [[LangIdModel]]
  * embedded-model pattern — weights ride inside the expression via
  * `addReferenceObj`, whole-stage codegen unbroken, ZERO exchanges at
  * score time). The rule-based quality filters (Gopher/C4,
  * TextAnalysis.qualityProfile) catch garbage; this is the complement —
  * a TRAINED ranker over what survives, the standard pairing in modern
  * pretraining curation stacks.
  *
  * Exact semantic contract (the DuckDB oracle replays every detail):
  *  - lowercase via [[UTF8String.toLowerCase]] (Spark's `lower`);
  *  - tokens: Java `\s+` split, empties dropped — mirrors
  *    `list_filter(string_split_regex(lower(text),'\s+'), w->len(w)>0)`;
  *  - token hash h: left fold over CODE POINTS (DuckDB `ascii` over
  *    `string_split(tok,'')` chars), h' = (h*31 + cp) mod 2^20, h0 = 0;
  *  - bucket: Fibonacci post-mix taking HIGH bits —
  *    ((h * 2654435761) mod 2^32) >> (32 − log2(buckets)). Plain
  *    mod-of-the-fold is structurally weak (31² ≡ 1 mod 64, so low bits
  *    barely mix); the multiply-then-high-bits form spreads ~uniformly
  *    and both engines compute it exactly in 64-bit integers;
  *  - logit = uSum + bSum + bias, where uSum folds w[bucket(tok_i)] in
  *    token order from 0.0, and bSum folds w[bucket(tok_i + "_" +
  *    tok_{i+1})] in position order from 0.0 — two separate IEEE
  *    left-folds added once, replayed bit-for-bit by two
  *    `list_reduce(list_prepend(0.0, …))` sums;
  *  - no tokens → null logit (the LangId sub-trigram convention).
  */
final case class QualityClfModel(weights: Array[Double], logBuckets: Int,
    bigrams: Boolean, bias: Double) extends Serializable {
  require(logBuckets >= 1 && logBuckets <= 20,
    s"logBuckets must be in 1..20, got $logBuckets")
  require(weights.length == (1 << logBuckets),
    s"weights length ${weights.length} != 2^$logBuckets buckets")

  def buckets: Int = 1 << logBuckets

  /** boxed Double logit, null for token-less text. Called from
    * generated code. */
  def logitKernel(text: UTF8String): java.lang.Double = {
    val toks = QualityClfModel.tokensOf(text)
    if (toks.length == 0) return null
    val shift = 32 - logBuckets
    var uSum = 0.0d
    var i = 0
    while (i < toks.length) {
      uSum += weights(QualityClfModel.bucketOf(toks(i), shift))
      i += 1
    }
    var bSum = 0.0d
    if (bigrams) {
      i = 0
      while (i < toks.length - 1) {
        bSum += weights(
          QualityClfModel.bucketOf(toks(i) + "_" + toks(i + 1), shift))
        i += 1
      }
    }
    java.lang.Double.valueOf(uSum + bSum + bias)
  }
}

object QualityClfModel {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private[functions] def tokensOf(text: UTF8String): Array[String] = {
    val raw = Ws.split(text.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) n += 1; i += 1 }
    if (n == raw.length) return raw
    val out = new Array[String](n)
    i = 0; n = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { out(n) = raw(i); n += 1 }
      i += 1
    }
    out
  }

  /** The portable token→bucket hash (see the contract above). */
  private[functions] def bucketOf(tok: String, shift: Int): Int = {
    var h = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = (h * 31L + cp) % 1048576L
      i += Character.charCount(cp)
    }
    (((h * 2654435761L) & 0xffffffffL) >>> shift).toInt
  }

  /** ORDERED bucket list of the text's hashed ngrams: unigram buckets in
    * token order, then bigram buckets in position order — the form an
    * in-order IEEE fold (DSIR's replayable ratio lattice) consumes.
    * Empty array for token-less text. Called from generated code. */
  def bucketListKernel(text: UTF8String, logBuckets: Int,
      bigrams: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokensOf(text)
    val shift = 32 - logBuckets
    val nB = if (bigrams && toks.length > 1) toks.length - 1 else 0
    val out = new Array[Int](toks.length + nB)
    var i = 0
    while (i < toks.length) { out(i) = bucketOf(toks(i), shift); i += 1 }
    i = 0
    while (i < nB) {
      out(toks.length + i) = bucketOf(toks(i) + "_" + toks(i + 1), shift)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** (bucket, cnt) pairs of the text's hashed uni+bigram multiset — the
    * TRAINING-side kernel (pre-counted, like [[LangIdModel
    * .trigramCountsKernel]], so the gradient explode shrinks by the
    * text's repetition factor). Empty array for token-less text. Called
    * from generated code. */
  def featureCountsKernel(text: UTF8String, logBuckets: Int,
      bigrams: Boolean): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokensOf(text)
    val shift = 32 - logBuckets
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    def add(b: Int): Unit = {
      val k = Integer.valueOf(b)
      val cur = counts.get(k)
      if (cur == null) counts.put(k, Array(1)) else cur(0) += 1
    }
    var i = 0
    while (i < toks.length) { add(bucketOf(toks(i), shift)); i += 1 }
    if (bigrams) {
      i = 0
      while (i < toks.length - 1) {
        add(bucketOf(toks(i) + "_" + toks(i + 1), shift))
        i += 1
      }
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](e.getKey.intValue, e.getValue()(0)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object QualityClfFns {
  private def col(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** double logit of the text under `model`, null for token-less text. */
  def clfLogit(text: Column, model: QualityClfModel): Column =
    col(ClfLogitExpr(expr(text), model))

  /** array&lt;struct&lt;bucket:int, cnt:int&gt;&gt; hashed-feature counts
    * (training side). */
  def clfFeatureCounts(text: Column, logBuckets: Int, bigrams: Boolean): Column =
    col(ClfFeatureCountsExpr(expr(text), logBuckets, bigrams))

  /** array&lt;int&gt; ORDERED bucket list (unigrams in token order, then
    * bigrams in position order — the DSIR fold input). */
  def clfBucketList(text: Column, logBuckets: Int, bigrams: Boolean): Column =
    col(ClfBucketListExpr(expr(text), logBuckets, bigrams))

  /** struct(n_feats, sum_ratio, log_weight) over a bucket list — see
    * [[DsirEvidenceExpr]]. */
  def dsirEvidence(fb: Column, ratio: Seq[Double],
      logRatio: Seq[Double]): Column =
    col(DsirEvidenceExpr(expr(fb), ratio, logRatio))
}

case class ClfLogitExpr(child: Expression, model: QualityClfModel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val r = model.logitKernel(input.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityClfModel", model,
      "graft.functions.QualityClfModel")
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("logit")
      s"""
         |java.lang.Double $boxed = $ref.logitKernel($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "quality_clf_logit"
}

case class ClfBucketListExpr(child: Expression, logBuckets: Int,
    bigrams: Boolean) extends UnaryExpression {
  // same bound as QualityClfModel: logBuckets 0 makes EVERY token bucket
  // 0 (shift 32 of a 32-bit hash) and > 20 shifts negative — silently
  // degenerate features with no error
  require(logBuckets >= 1 && logBuckets <= 20,
    s"logBuckets must be 1..20, got $logBuckets")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    QualityClfModel.bucketListKernel(input.asInstanceOf[UTF8String],
      logBuckets, bigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QualityClfModel$$.MODULE$$.bucketListKernel(" +
        s"$c, $logBuckets, $bigrams)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "quality_clf_buckets"
}

case class ClfFeatureCountsExpr(child: Expression, logBuckets: Int,
    bigrams: Boolean) extends UnaryExpression {
  require(logBuckets >= 1 && logBuckets <= 20,
    s"logBuckets must be 1..20, got $logBuckets")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    QualityClfModel.featureCountsKernel(input.asInstanceOf[UTF8String],
      logBuckets, bigrams)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QualityClfModel$$.MODULE$$.featureCountsKernel(" +
        s"$c, $logBuckets, $bigrams)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "quality_clf_features"
}

/** r19: the DSIR evidence folds in one pass — exactly
  * `aggregate(fb, 0.0, (acc, x) => acc + element_at(ratios, x+1))` and
  * the same over logRatios (in-order IEEE left folds, 0.0 seeds), plus
  * n_feats = size(fb); null evidence for an EMPTY bucket list (the
  * composed `when(n_feats > 0, ...)` contract) and a null struct for a
  * null list. The interpreted two-fold form re-walked the list per fold
  * with per-element Literal array probes; one kernel call replaces both.
  * Arrays ride as a plan reference object (the PqEncodeExpr pattern),
  * not literals — no multi-KB task-binary re-broadcast per stage. */
case class DsirEvidenceExpr(child: Expression, ratio: Seq[Double],
    logRatio: Seq[Double])
    extends UnaryExpression {
  require(ratio.length == logRatio.length, "model arrays must align")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_feats",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_ratio",
      org.apache.spark.sql.types.DoubleType, nullable = true),
    org.apache.spark.sql.types.StructField("log_weight",
      org.apache.spark.sql.types.DoubleType, nullable = true)))

  @transient private lazy val r: Array[Double] = ratio.toArray
  @transient private lazy val lr: Array[Double] = logRatio.toArray

  def fold(fb: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = fb.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, null, null))
    var sr = 0.0
    var lw = 0.0
    var i = 0
    while (i < n) {
      val b = fb.getInt(i)
      sr += r(b)
      lw += lr(b)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, sr, lw))
  }

  override def nullSafeEval(input: Any): Any =
    fold(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirEvidence", this,
      classOf[DsirEvidenceExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fold($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dsir_evidence"
}
