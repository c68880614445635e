import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val dir = "/root/testdata/sf0.1"
val df = spark.read.parquet(s"$dir/documents.parquet")
// warm
graft.ml.Dedup.minhashPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id").count()
graft.ml.Dedup.ngramJaccardPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id", "source", 3, 0.8).count()

val docs = df.select(col("doc_id").as("id"), col("text").as("__t"))
  .repartition(col("id"))
  .select(col("id"), graft.ml.Dedup.shingles(col("__t"), 3).as("sh"))
  .filter(size(col("sh")) > 0)
  .withColumn("hs", transform(col("sh"), h => xxhash64(h)))
  .repartition(col("id"))
t("docs-materialize")(docs.select(count(lit(1))).collect())
val rows=2; val bands=32
val banded = docs.select(col("id"), explode(transform(sequence(lit(0), lit(bands-1)), b => struct(b.as("band"), hash((0 until rows).map(j => array_min(transform(col("hs"), h => xxhash64(h, b*rows+j)))):_*).as("bh")))).as("bb")).select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
t("banded")(banded.count())
val cand = banded.as("l").join(banded.as("r"), col("l.band")===col("r.band") && col("l.bh")===col("r.bh") && col("l.id")<col("r.id")).select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
t("cand")(cand.count())
t("minhash-full")(graft.ml.Dedup.minhashPairs(df, "text", "doc_id").count())
t("ngram-full")(graft.ml.Dedup.ngramJaccardPairs(df, "text", "doc_id", "source", 3, 0.8).count())
t("cosdup-full")(graft.ml.Similarity.cosineDupPairs(spark.read.parquet(s"$dir/embeddings.parquet"), "embedding", "vec_id", 0.4, 4, 64).count())
System.exit(0)
