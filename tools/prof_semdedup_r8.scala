// r8 scratch: bisect the q_semantic_dedup r6->r7 regression (1.01 -> 1.38 s).
// Times the gate's exact call plus its two build stages separately so the
// extra cost names itself.
import org.apache.spark.sql.functions._

val dir = "/root/testdata/sf0.1"
def t3(name: String)(f: => Unit): Unit = {
  f // warmup
  val xs = (1 to 3).map { _ =>
    spark.catalog.clearCache(); graft.core.CacheRegistry.drain()
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] median ${xs.sorted.apply(1)}%.3f s  all ${xs.map(x => f"$x%.3f").mkString(",")}")
}

val emb = graft.Tables.load(spark, dir, "embeddings")
println("rows=" + emb.count())

t3("gate_full") {
  graft.ml.Similarity.semanticDedup(emb, "embedding", "vec_id",
    numCells = 16, threshold = 0.4).select(col("vec_id")).count(): Unit
}
t3("buildIvf_assigned_only") {
  graft.ml.Similarity.buildIvfIndex(emb, "embedding", "vec_id", 16).assigned.count(): Unit
}
// the seeded-path validation stats job alone (r7 added agg over count)
t3("seed_stats_job") {
  emb.filter(col("vec_id") < 16)
    .select(col("vec_id").cast("long").as("cell_id"))
    .agg(count(lit(1)), count_distinct(col("cell_id")), min(col("cell_id")), max(col("cell_id")))
    .head(): Unit
}
t3("seed_count_job_r6style") {
  emb.filter(col("vec_id") < 16).count(): Unit
}
System.exit(0)
