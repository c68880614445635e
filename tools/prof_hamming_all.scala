import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[PROF $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val big = (0 until 100).map(i => d1.select(
  (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
  regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"))).reduce(_ union _)
big.count()
t("hamming32 pairs 500k") {
  println("[PROF] pairs32: " + graft.ml.Dedup.simhashHammingPairs(big, "text", "doc_id").count())
}
t("hamming64 pairs 500k") {
  println("[PROF] pairs64: " + graft.ml.Dedup.simhashHammingPairs64(big, "text", "doc_id").count())
}
t("fused hamming64 drop 500k") {
  println("[PROF] survivors: " + graft.ml.Dedup.dropDuplicatesHamming64(big, "text", "doc_id").count())
}
System.exit(0)
