// r20 optimization-round scratch profiler. Run:
//   GRAFT_PROF=contested /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -i tools/prof_r20.scala
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

val scenario = sys.env.getOrElse("GRAFT_PROF", "contested")
def want(s: String) = scenario == "all" || scenario.split(",").contains(s)
val dir = sys.env.getOrElse("GRAFT_PROF_DIR", "/root/testdata/sf0.1")

// machine-heat probe (the StressOps.probeOnce body): bracket every
// measured block so numbers carry their own calm/hot classification
def probe(): Double = {
  System.gc()
  val t0 = System.nanoTime()
  spark.range(0, 200000000L, 1, 32)
    .select(xxhash64(xxhash64(col("id"), lit(42))).as("h"))
    .groupBy(pmod(col("h"), lit(1024)).as("b"))
    .agg(sum(col("h"))).count()
  (System.nanoTime() - t0) / 1e9
}
probe() // warm the probe's own codegen before any recorded sample

def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f // warm
  val xs = (1 to n).map { _ =>
    spark.catalog.clearCache()
    graft.core.CacheRegistry.drain()
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f (${xs.map(x => f"$x%.2f").mkString(",")})")
}

def q(name: String): Long = graft.SparkEntry.queries(name)(spark, dir).count()

if (want("contested")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_quality_clf", 7)(q("q_quality_clf"))
  tN("q_dsir", 7)(q("q_dsir"))
  tN("q_multimodal_curate", 5)(q("q_multimodal_curate"))
  tN("q_curate_rank", 5)(q("q_curate_rank"))
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("stores")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_vocab_store", 5)(q("q_vocab_store"))
  tN("q_asof_store", 5)(q("q_asof_store"))
  tN("q_host_graph_store", 5)(q("q_host_graph_store"))
  tN("q_dedup_store_sem", 5)(q("q_dedup_store_sem"))
  tN("q_dedup_store_exact", 5)(q("q_dedup_store_exact"))
  tN("q_dedup_store_near", 5)(q("q_dedup_store_near"))
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("token")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_tfidf", 5)(q("q_tfidf"))
  tN("q_tfidf_log", 5)(q("q_tfidf_log"))
  tN("q_vocab", 5)(q("q_vocab"))
  tN("q_heavy_hitters", 5)(q("q_heavy_hitters"))
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("langid")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_langid", 5)(q("q_langid"))
  // decompose: train-only (the profiles take) vs classify-only
  val docs = graft.core.Tables.load(spark, dir, "documents")
  tN("langid train only", 5)(
    graft.ml.LangId.trainProfiles(docs, "text", "lang", topK = 100).count())
  val profiles = graft.ml.LangId.trainProfiles(docs, "text", "lang", topK = 100)
    .localCheckpoint()
  tN("langid classify only", 5)(
    graft.ml.LangId.classify(docs, "text", "doc_id", profiles, topK = 100).count())
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("curate")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_curate_rank", 5)(q("q_curate_rank"))
  val docs = graft.core.Tables.load(spark, dir, "documents")
  def prefix = {
    val ruled = graft.ml.TextAnalysis.gopherRules(docs, "text",
      minStopHits = 1, drop = true)
    val model = graft.functions.QualityClfModel(
      graft.ml.QualityClassifier.syntheticWeights(12), 12,
      bigrams = true, bias = 0.0)
    val scored = graft.ml.QualityClassifier.score(ruled, "text", model)
      .filter(col("quality_logit") > 0.0)
    val (tc, rc) = graft.ml.Dsir.ngramCountsWithTarget(
      docs, "text", col("doc_id") < 50, 12)
    val m = graft.ml.Dsir.model(tc, rc, 12)
    val weighed = graft.ml.Dsir.weigh(scored, "text", "doc_id", m)
    weighed.filter(graft.ml.Dsir.thresholdKeep(weighed, "doc_id"))
  }
  tN("curate prefix (kept) count", 5)(prefix.count())
  val kept = prefix.localCheckpoint()
  println(s"[PROF kept rows] ${kept.count()}")
  tN("curate pairs over kept-ckpt", 5)(
    graft.ml.Dedup.minhashPairs(kept, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9).count())
  tN("curate drop over kept-ckpt", 5)({
    val pairs = graft.ml.Dedup.minhashPairs(kept, "text", "doc_id",
      shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9)
    graft.ml.Dedup.dropDuplicates(kept, pairs, "doc_id").count()
  })
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("nearstore")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  // q_dedup_store_near decomposition: fixture build is shared; the gate
  // times the probe. Pieces: store footer count, increment fingerprint
  // memo+count, banded join + anti join.
  val docs = graft.core.Tables.load(spark, dir, "documents")
  val store = {
    val p = java.nio.file.Files.createTempDirectory("prof-near").toString + "/store"
    graft.ml.Dedup.appendToNearStore(docs.filter(col("doc_id") < 250),
      "text", p, graft.ml.Dedup.simhash32, totalBits = 32, bands = 4)
    p
  }
  val inc = docs.filter(col("doc_id") >= 250)
  tN("nearstore full probe", 5)(
    graft.ml.Dedup.dropSeenNearStoreBy(inc, store, "text", "doc_id",
      graft.ml.Dedup.simhash32, totalBits = 32, k = 3, bands = 4).count())
  tN("nearstore inc fingerprint+distinct", 5)(
    inc.select(graft.ml.Dedup.simhash32(col("text")).as("s")).distinct().count())
  tN("nearstore store footer count", 5)(
    spark.read.parquet(store).count())
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("media")) {
  // Spread pins to spark.sql.shuffle.partitions -- sweep it to test the
  // r19-verdict over-sharding hypothesis (c8 beat c32 on this family)
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  for (parts <- Seq(32, 16, 8, 4, 32)) {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    tN(s"q_multimodal_curate parts=$parts", 5)(q("q_multimodal_curate"))
    tN(s"q_image_phash parts=$parts", 5)(q("q_image_phash"))
  }
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

if (want("phash_decomp")) {
  val mm = graft.ml.Multimodal
  def fixture = {
    val docs = graft.core.Tables.load(spark, dir, "documents").select(col("doc_id"))
    mm.synthesizeImageVariants(docs, "doc_id").localCheckpoint()
  }
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  val fx32 = fixture
  println(s"[PROF fixture parts] ${fx32.rdd.getNumPartitions}")
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  for (parts <- Seq(32, 8, 32)) {
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    tN(s"decode only parts=$parts", 5)(noop(mm.decodeImagePixels(fx32)))
    tN(s"full q_image_phash parts=$parts", 5)(q("q_image_phash"))
  }
  spark.conf.set("spark.sql.shuffle.partitions", 8)
  val fx8 = fixture
  println(s"[PROF fixture8 parts] ${fx8.rdd.getNumPartitions}")
  tN("decode only fx8 parts=8", 5)(noop(mm.decodeImagePixels(fx8)))
  tN("synth+checkpoint parts=8", 3)(fixture.count())
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  tN("synth+checkpoint parts=32", 3)(fixture.count())
}

if (want("stats")) {
  // what would a row-aware Spread estimate from plan stats?
  val docs = graft.core.Tables.load(spark, dir, "documents")
  for ((n, f) <- Seq(
      ("docs ids", docs.select(col("doc_id"))),
      ("docs cls0 ids", docs.filter(pmod(col("doc_id"), lit(3)) === 0).select(col("doc_id"))),
      ("docs full", docs))) {
    val st = f.queryExecution.optimizedPlan.stats
    val width = f.schema.map(_.dataType.defaultSize).sum + 8
    println(s"[PROF stats $n] sizeInBytes=${st.sizeInBytes} rowCount=${st.rowCount} width=$width estRows=${st.sizeInBytes / width} trueRows=${f.count()}")
  }
}

if (want("ann")) {
  val p0 = probe(); println(f"[PROF probe pre] $p0%.3f")
  tN("q_ann_recall", 5)(q("q_ann_recall"))
  val emb = graft.core.Tables.load(spark, dir, "embeddings")
  val qs = emb.filter(col("vec_id") < 5)
  tN("bruteForceTopK once", 5)(graft.ml.Similarity.bruteForceTopK(
    emb, qs, "embedding", "vec_id", k = 5).count())
  val p1 = probe(); println(f"[PROF probe post] $p1%.3f")
}

System.exit(0)
