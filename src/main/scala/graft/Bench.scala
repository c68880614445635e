package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/parquet-footer paths on the smallest SF so the
    // first timed query doesn't absorb one-time session costs.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Shared memoized frames (minhash pair frame feeds q_dedup_minhash
    // AND q_dedup_clusters) are built ONCE here and attributed to their
    // own JSON key — otherwise the build cost lands on whichever consumer
    // the map yields first and round-over-round comparisons drift with
    // map order.
    val tShared = System.nanoTime()
    try SparkEntry.prebuildShared(spark, sfDir) catch { case _: Throwable => () }
    val sharedSec = (System.nanoTime() - tShared) / 1e9
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = (if (results.nonEmpty) results.values.sum else 0.0) + sharedSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shared":{"minhash_pairs_build":$sharedSec},"sf":"$sfDir"}""")
    spark.stop()
  }
}
