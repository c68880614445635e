// 100x sf0.1 stress of the ITERATIVE dedup paths (clusters label
// propagation, simhash hamming banding) - run via:
//   sbt compile && spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=64 \
//     --driver-class-path target/scala-2.13/classes -i tools/stress100.scala
//
// Corpus construction: 100 salted copies of the 5k-doc sf0.1 table. Every
// WORD gets a per-copy prefix, so a salted 3-gram equals another salted
// 3-gram iff the original 3-grams were equal AND the copies match:
// cross-copy jaccard is 0, no new shared shingles appear (a spliced-salt
// scheme would make every doc pair sharing a common word share a shingle,
// quadratically inflating LSH candidates), and the near-dup CLUSTER SIZES
// stay what they were at sf0.1 while the corpus grows 100x - the honest
// linear-scale shape of a bigger crawl.
import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[STRESS $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val copies = 100
val big = (0 until copies).map(i => d1.select(
  (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
  regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"))).reduce(_ union _)
println("[STRESS] docs: " + big.count())

// warm codegen/JIT on the small SF first
graft.ml.Dedup.minhashPairs(
  spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
  "text", "doc_id").count()

val pairs = t("minhash pairs 500k docs") {
  val p = graft.ml.Dedup.minhashPairs(big, "text", "doc_id").localCheckpoint()
  println("[STRESS] pairs: " + p.count()); p
}
// driverEdgeLimit = 0 forces the DISTRIBUTED label-propagation loop (the
// at-scale path this stress exists to measure); the adaptive default
// would take the driver union-find fast path on this pair count
t("clusters (distributed label propagation) over 100x pairs") {
  println("[STRESS] cluster labels: " +
    graft.ml.Dedup.clusters(pairs, driverEdgeLimit = 0L).count())
}
t("clusters (driver union-find fast path) over 100x pairs") {
  println("[STRESS] cluster labels (local): " +
    graft.ml.Dedup.clusters(pairs).count())
}
t("simhash hamming pairs 500k docs (32-bit)") {
  println("[STRESS] hamming32 pairs: " +
    graft.ml.Dedup.simhashHammingPairs(big, "text", "doc_id").count())
}
// 64-bit variant: the birthday-collision count drops from ~10^8 random
// pairs to ~0 - output is the TRUE near-dup pairs only
t("simhash hamming pairs 500k docs (64-bit)") {
  println("[STRESS] hamming64 pairs: " +
    graft.ml.Dedup.simhashHammingPairs64(big, "text", "doc_id").count())
}
// fused drop: same banded join, but pairs collapse map-side into the
// distinct drop-id aggregate - the incremental-consumption path
t("fused hamming-64 drop (dropDuplicatesHamming64) 500k docs") {
  println("[STRESS] survivors: " +
    graft.ml.Dedup.dropDuplicatesHamming64(big, "text", "doc_id").count())
}
// passage-dedup linearity: rows into the fp-partitioned sort = total
// token-window count, so 10x vs 100x copies should time ~linearly (the
// salting keeps cross-copy fingerprints disjoint - duplicated-span
// structure per copy is constant)
val big10 = (0 until 10).map(i => d1.select(
  (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
  regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"))).reduce(_ union _)
t("passage dedup 50k docs (10x)") {
  println("[STRESS] spans(10x): " +
    graft.ml.Dedup.duplicatedPassages(big10, "text", "doc_id").count())
}
t("passage dedup 500k docs (100x)") {
  println("[STRESS] spans(100x): " +
    graft.ml.Dedup.duplicatedPassages(big, "text", "doc_id").count())
}
System.exit(0)
