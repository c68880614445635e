// r19: stage-level decomposition of q_curate_rank + timings of other top queries
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"

def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f
  val xs = (1 to n).map { _ =>
    spark.catalog.clearCache(); graft.core.CacheRegistry.drain()
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f")
}

val docs = graft.core.Tables.load(spark, dir, "documents")
def ruled = graft.ml.TextAnalysis.gopherRules(docs, "text", minStopHits = 1, drop = true)
val model = graft.functions.QualityClfModel(
  graft.ml.QualityClassifier.syntheticWeights(12), 12, bigrams = true, bias = 0.0)
def scored = graft.ml.QualityClassifier.score(ruled, "text", model)
  .filter(col("quality_logit") > 0.0)
def tcrc = graft.ml.Dsir.ngramCountsWithTarget(docs, "text", col("doc_id") < 50, 12)
def kept = {
  val (tc, rc) = tcrc
  val m = graft.ml.Dsir.model(tc, rc, 12)
  val weighed = graft.ml.Dsir.weigh(scored, "text", "doc_id", m)
  weighed.filter(graft.ml.Dsir.thresholdKeep(weighed, "doc_id"))
}
tN("1 gopherRules only")(ruled.count())
tN("2 +clf score")(scored.count())
tN("3 dsir counts+model only")({ val (tc, rc) = tcrc; graft.ml.Dsir.model(tc, rc, 12) })
tN("4 kept (full scoring prefix)")(kept.count())
tN("5 pairs over kept")({
  val k = kept
  graft.ml.Dedup.minhashPairs(k, "text", "doc_id", 3, 64, 32, 0.9).count()
})
tN("6 full q_curate_rank")(graft.SparkEntry.queries("q_curate_rank")(spark, dir).count())
tN("q_knn")(graft.SparkEntry.queries("q_knn")(spark, dir).count())
tN("q_langid")(graft.SparkEntry.queries("q_langid")(spark, dir).count())
tN("q_vocab_store")(graft.SparkEntry.queries("q_vocab_store")(spark, dir).count())
tN("q_simhash_hamming")(graft.SparkEntry.queries("q_simhash_hamming")(spark, dir).count())
tN("q_asof_store")(graft.SparkEntry.queries("q_asof_store")(spark, dir).count())
tN("q_host_graph_store")(graft.SparkEntry.queries("q_host_graph_store")(spark, dir).count())
tN("q_image_phash")(graft.SparkEntry.queries("q_image_phash")(spark, dir).count())
System.exit(0)
