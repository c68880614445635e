// r19: post-batch-2 measurements of the changed queries
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f
  val xs = (1 to n).map { _ =>
    spark.catalog.clearCache(); graft.core.CacheRegistry.drain()
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f")
}
def q(name: String) = graft.SparkEntry.queries(name)(spark, dir).count()
val t0 = System.nanoTime
graft.SparkEntry.prebuildShared(spark, dir)
println(f"[PROF shared_build] ${(System.nanoTime - t0) / 1e9}%.2f s")
for (n <- Seq("q_curate_rank", "q_quality_rules", "q_dsir", "q_knn",
  "q_image_phash", "q_image_resize", "q_multimodal_curate", "q_audio_pcm",
  "q_multimodal_mixed", "q_quality_band", "q_repetition", "q_pagerank",
  "q_minhash_calibration", "q_corpus_clean", "q_c4_lines"))
  tN(n)(q(n))
System.exit(0)
