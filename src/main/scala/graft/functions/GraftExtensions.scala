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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_bands(hashes, numHashes, bands)")
        MinHashBandsExpr(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_long"),
      new ExpressionInfo(classOf[JaccardLongExpr].getName, "jaccard_long"),
      (args: Seq[Expression]) => JaccardLongExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotDExpr].getName, "dot_d"),
      (args: Seq[Expression]) => DotDExpr(args(0), args(1))))
  }
}

object GraftExtensions {
  /** Runtime registration on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinHashBandsExpr(args(0),
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      new FunctionIdentifier("jaccard_long"),
      new ExpressionInfo(classOf[JaccardLongExpr].getName, "jaccard_long"),
      (args: Seq[Expression]) => JaccardLongExpr(args(0), args(1)))
    reg.registerFunction(
      new FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotDExpr].getName, "dot_d"),
      (args: Seq[Expression]) => DotDExpr(args(0), args(1)))
  }
}
