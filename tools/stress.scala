import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
// 10x corpus with distinct ids and slightly perturbed text per copy so
// clusters don't explode quadratically by construction
val big = (0 until 10).map(i => d1.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
  concat(col("text"), lit(" v" + i)).as("text"), col("lang"), col("source"))).reduce(_ union _)
println("docs: " + big.count())
// warm
graft.ml.Dedup.minhashPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id").count()
t("minhash 50k")(println("pairs: " + graft.ml.Dedup.minhashPairs(big, "text", "doc_id").count()))
t("simhash 50k")(println("groups: " + graft.ml.Dedup.simhashGroups(big, "text", "doc_id").count()))
t("exact 50k")(println("exact: " + graft.ml.Dedup.exact(big, "text", "doc_id").count()))
t("profile 50k")(println("prof: " + graft.ml.TextAnalysis.profile(big, "text").count()))
val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val bigE = (0 until 10).map(i => e1.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding"), col("label"))).reduce(_ union _)
t("ann_lsh 20k corpus")(println("ann: " + graft.ml.Similarity.annTopK(bigE, bigE.filter(col("vec_id") < 5), "embedding", "vec_id", 5, 6, 64).count()))
t("ivf 20k corpus")(println("ivf: " + graft.ml.Similarity.ivfTopK(bigE, bigE.filter(col("vec_id") < 5), "embedding", "vec_id", 5, 16, 3).count()))
System.exit(0)
