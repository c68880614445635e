import org.apache.spark.sql.functions._
def t3[A](name: String)(f: => A): Unit = {
  f
  val xs = (1 to 3).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] ${xs.sorted.apply(1)}%.2f s  (${xs.map(x => f"$x%.2f").mkString(",")})")
}
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  .localCheckpoint()
// force full evaluation of every metric column (count() would prune)
t3("profile all metrics") {
  graft.ml.TextAnalysis.profile(docs, "text")
    .select(sum(col("n_tokens") + col("n_regex_tokens")),
      sum(col("mean_word_len") + col("stopword_ratio") +
        col("distinct_ratio") + col("quality")),
      sum(length(col("lang_guess")) + length(col("fingerprint"))))
    .collect()
}
System.exit(0)
