import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
// correctness at sf0.01
val d01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
val mh01 = graft.ml.Dedup.minhashPairs(d01, "text", "doc_id")
mh01.orderBy("id_a","id_b").coalesce(1).write.mode("overwrite").parquet("/tmp/mh01")
println("mh01 rows: " + spark.read.parquet("/tmp/mh01").count())
val sh01 = graft.ml.Dedup.simhashGroups(d01, "text", "doc_id")
sh01.orderBy("simhash").coalesce(1).write.mode("overwrite").parquet("/tmp/sh01")
println("sh01 rows: " + spark.read.parquet("/tmp/sh01").count())
// perf at sf0.1
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t("minhash sf0.1")(println("pairs: " + graft.ml.Dedup.minhashPairs(d1, "text", "doc_id").count()))
t("simhash sf0.1")(println("groups: " + graft.ml.Dedup.simhashGroups(d1, "text", "doc_id").count()))
System.exit(0)
