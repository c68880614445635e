// semanticDedup 100x scale stress (200k vectors) - run via:
//   sbt compile && LANG=C.UTF-8 spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=64 \
//     --driver-class-path target/scala-2.13/classes -i tools/stress_semdedup.scala
//
// Corpus: 100 positively-scaled copies of the 2k sf0.1 embeddings. A
// positive scale keeps cosine(copy, original) exactly 1 and the centroid
// argmax scale-invariant, so every copy is a TRUE semantic dup of its
// original, lands in the original's cell, and must drop under keep-first
// - survivors == the copy-0 survivor set at any scale. Cells grow 100x
// (the hot-cell shape maxCellSize exists for), so this measures both the
// within-cell quadratic and how the SRP re-split cap bounds it.
import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[STRESS $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
def copies(n: Int) = (0 until n).map(i => e1.select(
  (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
  transform(col("embedding"), x => x * (1.0f + i / 128.0f)).as("embedding")))
  .reduce(_ union _)
val big10 = copies(10)   // 20k vectors
val big100 = copies(100) // 200k vectors
println("[STRESS] vectors: " + big100.count())

// warm codegen/JIT
graft.ml.Similarity.semanticDedup(
  spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
  "embedding", "vec_id", numCells = 16, threshold = 0.95).count()

// 10x scale first: uncapped vs capped
spark.catalog.clearCache()
t("semanticDedup 20k vectors, numCells=16, uncapped") {
  println("[STRESS] survivors: " + graft.ml.Similarity.semanticDedup(
    big10, "embedding", "vec_id", numCells = 16, threshold = 0.95).count())
}
spark.catalog.clearCache()
t("semanticDedup 20k vectors, numCells=16, maxCellSize=2000") {
  println("[STRESS] survivors: " + graft.ml.Similarity.semanticDedup(
    big10, "embedding", "vec_id", numCells = 16, threshold = 0.95,
    maxCellSize = 2000L).count())
}
// 100x scale: the cap (skew backstop) and the paper dial (numCells ~ n/10^4)
spark.catalog.clearCache()
t("semanticDedup 200k vectors, numCells=16, maxCellSize=2000") {
  println("[STRESS] survivors: " + graft.ml.Similarity.semanticDedup(
    big100, "embedding", "vec_id", numCells = 16, threshold = 0.95,
    maxCellSize = 2000L).count())
}
spark.catalog.clearCache()
t("semanticDedup 200k vectors, numCells=64, uncapped") {
  println("[STRESS] survivors: " + graft.ml.Similarity.semanticDedup(
    big100, "embedding", "vec_id", numCells = 64, threshold = 0.95).count())
}
// the pathology the cap exists for, run LAST: 12.5k-row hot cells make
// the within-cell join quadratic (~1.25e9 pair evals)
spark.catalog.clearCache()
t("semanticDedup 200k vectors, numCells=16, uncapped (hot-cell pathology)") {
  println("[STRESS] survivors: " + graft.ml.Similarity.semanticDedup(
    big100, "embedding", "vec_id", numCells = 16, threshold = 0.95).count())
}
System.exit(0)
