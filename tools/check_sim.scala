import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val s = spark
for (q <- Seq("q_ann_lsh", "q_cosine_dup", "q_ngram_jaccard")) {
  val df = graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.01")
  df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/chk/$q")
  println(s"$q rows@0.01: " + s.read.parquet(s"/tmp/chk/$q").count())
}
for (q <- Seq("q_ann_lsh", "q_cosine_dup", "q_ngram_jaccard", "q_embed_topk")) {
  t(q + " sf0.1")(println(s"  rows: " + graft.SparkEntry.queries(q)(s, "/root/testdata/sf0.1").count()))
}
System.exit(0)
