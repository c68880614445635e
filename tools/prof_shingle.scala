import org.apache.spark.sql.functions._
def t3[A](name: String)(f: => A): Unit = {
  f
  val xs = (1 to 3).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] ${xs.sorted.apply(1)}%.2f s  (${xs.map(x => f"$x%.2f").mkString(",")})")
}
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").localCheckpoint()
t3("tokens only")(docs.select(sum(size(split(col("text"), "\\s+")))).collect())
t3("shingles n=5")(docs.select(sum(size(graft.ml.Dedup.shingles(col("text"), 5)))).collect())
t3("shingles+xxhash")(docs.select(sum(size(
  transform(graft.ml.Dedup.shingles(col("text"), 5), s => xxhash64(s))))).collect())
t3("explode shingle hashes")(docs.select(col("doc_id"),
  explode(transform(graft.ml.Dedup.shingles(col("text"), 5), s => xxhash64(s))).as("h"))
  .select(sum(col("h"))).collect())
System.exit(0)
