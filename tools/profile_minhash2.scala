import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val dir = "/root/testdata/sf0.1"
val df = spark.read.parquet(s"$dir/documents.parquet")
// warm
graft.ml.Dedup.minhashPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id").count()

val docs = df.select(col("doc_id").as("id"), graft.ml.Dedup.shingles(col("text"), 3).as("sh"))
  .filter(size(col("sh")) > 0)
  .withColumn("hs", transform(col("sh"), h => xxhash64(h)))
  .repartition(col("id"))
t("docs")(docs.select(sum(size(col("hs")))).collect())
val rows=2; val bands=32
val banded = docs.select(col("id"), explode(transform(sequence(lit(0), lit(bands-1)), b => struct(b.as("band"), hash((0 until rows).map(j => array_min(transform(col("hs"), h => xxhash64(h, b*rows+j)))):_*).as("bh")))).as("bb")).select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
t("banded")(banded.count())
val cand = banded.as("l").join(banded.as("r"), col("l.band")===col("r.band") && col("l.bh")===col("r.bh") && col("l.id")<col("r.id")).select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
t("cand")(println("cands: " + cand.count()))
t("full")(println("pairs: " + graft.ml.Dedup.minhashPairs(df, "text", "doc_id").count()))
t("full2")(println("pairs: " + graft.ml.Dedup.minhashPairs(df, "text", "doc_id").count()))
t("ngram")(println("ngram: " + graft.ml.Dedup.ngramJaccardPairs(df, "text", "doc_id", "source", 3, 0.8).count()))
t("ngram2")(println("ngram: " + graft.ml.Dedup.ngramJaccardPairs(df, "text", "doc_id", "source", 3, 0.8).count()))
System.exit(0)
