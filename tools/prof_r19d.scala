// r19: decompose q_knn and q_image_phash residual cost
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val dir = "/root/testdata/sf0.1"
def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f
  val xs = (1 to n).map { _ =>
    spark.catalog.clearCache(); graft.core.CacheRegistry.drain()
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f")
}
val emb = graft.core.Tables.load(spark, dir, "embeddings").filter(col("vec_id") < 1000)
def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  graft.functions.ArrayFns.dotD(a, b)
val c = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("cv"))
  .repartition(col("vec_id"))
  .withColumn("csd", dot(col("cv"), col("cv")))
val q = c.select(col("vec_id").as("query_id"), col("cv").as("qv"), col("csd").as("qsd"))
tN("knn corpus scan")(c.count())
tN("knn crossjoin+dot")(c.crossJoin(broadcast(q))
  .filter(col("vec_id") =!= col("query_id"))
  .select(sum(dot(col("qv"), col("cv")))).collect())
tN("knn full")(graft.SparkEntry.queries("q_knn")(spark, dir).count())
println("[PROF] knn plan:")
println(graft.SparkEntry.queries("q_knn")(spark, dir).queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))

// image_phash pieces
def docs = graft.core.Tables.load(spark, dir, "documents").select(col("doc_id"))
tN("synthVariants")(graft.ml.Multimodal.synthesizeImageVariants(docs, "doc_id").count())
val fix = graft.ml.Multimodal.synthesizeImageVariants(docs, "doc_id").localCheckpoint()
println("[PROF] fixture partitions: " + fix.rdd.getNumPartitions)
tN("decodePixels over fixture")(graft.ml.Multimodal.decodeImagePixels(fix)
  .select(sum(col("px.px_sum"))).collect())
tN("q_image_phash full")(graft.SparkEntry.queries("q_image_phash")(spark, dir).count())
System.exit(0)
