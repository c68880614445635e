// r19: value-equivalence + timing probes for the fused kernels vs the old
// composed forms, at sf0.01 and sf0.1.
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f
  val xs = (1 to n).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f")
}

def calibOld(pairs: DataFrame, textA: String, textB: String,
    shingleSize: Int = 3, numHashes: Int = 16): DataFrame = {
  def hs(c: Column) = array_distinct(transform(graft.ml.Dedup.shingles(c, shingleSize),
    s => conv(substring(md5(s), 25, 8), 16, 10).cast("long")))
  val hashed = pairs
    .select(hs(col(textA)).as("hsA"), hs(col(textB)).as("hsB"))
    .filter(size(col("hsA")) > 0 && size(col("hsB")) > 0)
    .repartition()
  def sig(h: String) = array((0 until numHashes).map { k =>
    array_min(transform(col(h),
      v => (v * lit(1000003L + 2L * k) + lit(12289L * k + 1L)) %
        lit(4294967296L)))
  }: _*)
  hashed
    .select(col("hsA"), col("hsB"), sig("hsA").as("sigA"), sig("hsB").as("sigB"))
    .select(
      aggregate(zip_with(col("sigA"), col("sigB"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), _ + _)
        .cast("long").as("matches"),
      size(array_intersect(col("hsA"), col("hsB"))).cast("long").as("inter"),
      col("hsA"), col("hsB"))
    .select(col("matches"),
      floor(lit(10) * col("inter") /
          (size(col("hsA")) + size(col("hsB")) - col("inter")))
        .cast("long").as("jacc_band"))
    .groupBy("matches", "jacc_band").agg(count(lit(1)).as("n_pairs"))
}

for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  val docs = graft.core.Tables.load(spark, dir, "documents")
  val toks = split(col("text"), """\s+""")
  val start = (floor(size(toks) * (col("doc_id") % 5) / 10) + 1).cast("int")
  val pairs = docs.select(col("text").as("text_a"),
    array_join(slice(toks, start, size(toks)), " ").as("text_b"))
  val oldR = calibOld(pairs, "text_a", "text_b").orderBy("matches", "jacc_band").collect()
  val newR = graft.ml.Dedup.minhashCalibration(pairs, "text_a", "text_b")
    .orderBy("matches", "jacc_band").collect()
  println(s"[PROF calib equiv $dir] old=${oldR.length} new=${newR.length} equal=${oldR.sameElements(newR)}")
  // null-row probe: planted null texts must drop identically
  val withNulls = pairs.unionByName(spark.range(3).select(
    when(col("id") === 0, lit(null).cast("string")).otherwise(lit("x y z w")).as("text_a"),
    when(col("id") === 1, lit(null).cast("string")).otherwise(lit("x y z")).as("text_b")))
  val o2 = calibOld(withNulls, "text_a", "text_b").orderBy("matches", "jacc_band").collect()
  val n2 = graft.ml.Dedup.minhashCalibration(withNulls, "text_a", "text_b")
    .orderBy("matches", "jacc_band").collect()
  println(s"[PROF calib nulls $dir] equal=${o2.sameElements(n2)}")
  val bandsNew = graft.ml.Dedup.minhashBandStats(docs, "text", "doc_id")
    .orderBy("bands").collect()
  println(s"[PROF bands $dir] rows=${bandsNew.mkString("; ")}")
  if (dir.endsWith("0.1")) {
    tN("calib new")(graft.ml.Dedup.minhashCalibration(pairs, "text_a", "text_b").count())
    tN("calib old")(calibOld(pairs, "text_a", "text_b").count())
    tN("bands new")(graft.ml.Dedup.minhashBandStats(docs, "text", "doc_id").count())
  }
}
System.exit(0)
