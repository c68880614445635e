package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft kernels as SQL
  * functions so `spark.sql` queries (and other JVM languages on the same
  * session) can call them:
  *
  *   spark.sql("SELECT jaccard_long(a.hs, b.hs) FROM ...")
  *
  * Enable with
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or at runtime via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()
  private def doubleArg(e: Expression): Double = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL literal 0.4
    case n: java.lang.Number => n.doubleValue()
    case other => sys.error(s"expected a numeric literal, got $other")
  }
  private def stringArg(e: Expression): String =
    e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString

  /** (identifier, info, builder) for every graft kernel. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_bands(hashes, numHashes, bands)")
        MinHashBandsExpr(args(0), intArg(args(1)), intArg(args(2)))
      }),
    (new FunctionIdentifier("jaccard_long"),
      new ExpressionInfo(classOf[JaccardLongExpr].getName, "jaccard_long"),
      (args: Seq[Expression]) => JaccardLongExpr(args(0), args(1))),
    (new FunctionIdentifier("jaccard_threshold"),
      new ExpressionInfo(classOf[JaccardThresholdExpr].getName, "jaccard_threshold"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "jaccard_threshold(a, b, threshold)")
        JaccardThresholdExpr(args(0), args(1), doubleArg(args(2)))
      }),
    (new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32Expr].getName, "simhash32"),
      (args: Seq[Expression]) => SimHash32Expr(args(0))),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))),
    (new FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotDExpr].getName, "dot_d"),
      (args: Seq[Expression]) => DotDExpr(args(0), args(1))),
    (new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')")
        UnicodeNormalizeExpr(args(0), stringArg(args(1)))
      }),
    (new FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLenExpr].getName, "deflate_len"),
      (args: Seq[Expression]) => DeflateLenExpr(args(0))),
    // the remaining MODEL-FREE kernels (only model-bearing exprs — BPE,
    // LangId profiles, QualityClf weights — are genuinely unregistrable
    // as SQL functions): a spark.sql user otherwise silently falls back
    // to the slow composed forms the kernels exist to replace
    (new FunctionIdentifier("url_normalize"),
      new ExpressionInfo(classOf[UrlNormalizeExpr].getName, "url_normalize"),
      (args: Seq[Expression]) => UrlNormalizeExpr(args(0))),
    (new FunctionIdentifier("token_counts"),
      new ExpressionInfo(classOf[TokenCountsExpr].getName, "token_counts"),
      (args: Seq[Expression]) => TokenCountsExpr(args(0))),
    (new FunctionIdentifier("md5_token_hashes"),
      new ExpressionInfo(classOf[Md5TokenHashesExpr].getName, "md5_token_hashes"),
      (args: Seq[Expression]) => Md5TokenHashesExpr(args(0))),
    (new FunctionIdentifier("ngrams_all"),
      new ExpressionInfo(classOf[NgramsAllExpr].getName, "ngrams_all"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngrams_all(text, n)")
        NgramsAllExpr(args(0), intArg(args(1)))
      }),
    (new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingles(text, n)")
        ShinglesExpr(args(0), intArg(args(1)))
      }),
    (new FunctionIdentifier("hashed_shingles"),
      new ExpressionInfo(classOf[HashedShinglesExpr].getName, "hashed_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hashed_shingles(text, n)")
        HashedShinglesExpr(args(0), intArg(args(1)))
      }),
    (new FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBitsExpr].getName, "interleave_bits"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "interleave_bits(col..., bits)")
        InterleaveBitsExpr(args.init, intArg(args.last))
      }))

  /** Runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
