import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val big = (0 until 10).map(i => d1.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
  concat(col("text"), lit(" v" + i)).as("text"), col("lang"), col("source"))).reduce(_ union _)
val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val bigE = (0 until 10).map(i => e1.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding"), col("label"))).reduce(_ union _)
graft.ml.Dedup.simhashHammingPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id").count()
t("hamming 50k")(println("pairs: " + graft.ml.Dedup.simhashHammingPairs(big, "text", "doc_id").count()))
t("int8 20k")(println("topk: " + graft.ml.Similarity.int8TopK(bigE, bigE.filter(col("vec_id") < 5), "embedding", "vec_id", 5, 50).count()))
t("ngram 50k")(println("ngram: " + graft.ml.Dedup.ngramJaccardPairs(big, "text", "doc_id", "source", 3, 0.8).count()))
System.exit(0)
