package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Median-of-N per query (default 3): a single-shot run cannot
    // distinguish real regressions from scheduler/JIT noise — r3→r5 spent
    // two rounds chasing a q_ann_pq "drift" that was structurally
    // unanswerable with one sample. Rounds alternate A/B/C over the whole
    // query list (not back-to-back repeats) so one slow neighbor can't
    // poison all of a query's samples.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
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
    val names = SparkEntry.queries.keys.toSeq
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 0 until rounds) {
      // identical plans across rounds would hit the previous round's
      // persisted frames (joinBackOnce pins drop sets in the cache) and
      // turn the median into a warm-cache number — clear between rounds
      // so every sample pays the full derivation. prebuildShared's memo
      // is localCheckpoint-based (an RDD, not the cache) and survives.
      spark.catalog.clearCache()
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n => n -> median(samples(n)))
    val qs = med.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = names.map { n =>
      val s = samples(n)
      s"\"" + n + "\":" + (s.max - s.min)
    }.mkString("{", ",", "}")
    val runs = names.map { n =>
      s"\"" + n + "\":" + samples(n).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = med.map(_._2).sum + sharedSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"runs":$runs,"rounds":$rounds,"shared":{"minhash_pairs_build":$sharedSec},"sf":"$sfDir"}""")
    spark.stop()
  }
}
