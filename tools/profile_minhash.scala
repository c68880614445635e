import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(s"$dir/documents.parquet")
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }

val docs = docs0.select(col("doc_id").as("id"), graft.ml.Dedup.shingles(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
t("shingles count")(docs.count())
val sig = docs.withColumn("sig", graft.ml.Dedup.minhashSignature(col("sh"), 64))
t("sig count")(sig.count())
t("sig agg")(sig.select(sum(size(col("sig")))).collect())
val rows = 2; val bands = 32
val banded = sig.select(col("id"), explode(transform(sequence(lit(0), lit(bands-1)), b => struct(b.as("band"), hash(slice(col("sig"), b*rows+1, lit(rows))).as("bh")))).as("bb")).select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
t("banded count")(banded.count())
val cand = banded.as("l").join(banded.as("r"), col("l.band")===col("r.band") && col("l.bh")===col("r.bh") && col("l.id")<col("r.id")).select(col("l.id").as("id_a"), col("r.id").as("id_b")).distinct()
t("cand count")(println("cands: " + cand.count()))
t("full")(println("pairs: " + graft.ml.Dedup.minhashPairs(docs0, "text", "doc_id").count()))
System.exit(0)
