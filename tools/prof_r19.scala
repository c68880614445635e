// r19 optimization-round scratch profiler. Run:
//   GRAFT_PROF=calib /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-memory 8g --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -i tools/prof_r19.scala
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

val scenario = sys.env.getOrElse("GRAFT_PROF", "calib")
def want(s: String) = scenario == "all" || scenario == s
val dir = "/root/testdata/sf0.1"

def tN[A](name: String, n: Int = 5)(f: => A): Unit = {
  f // warm
  val xs = (1 to n).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] min=${xs.min}%.3f med=${xs.sorted.apply(n/2)}%.3f (${xs.map(x => f"$x%.2f").mkString(",")})")
}

if (want("calib")) {
  val docs = graft.core.Tables.load(spark, dir, "documents")
  println("[PROF] docs rows: " + docs.count())
  val toks = split(col("text"), """\s+""")
  val start = (floor(size(toks) * (col("doc_id") % 5) / 10) + 1).cast("int")
  val pairs = docs.select(col("text").as("text_a"),
    array_join(slice(toks, start, size(toks)), " ").as("text_b"))

  // full query
  tN("calib full")(graft.ml.Dedup.minhashCalibration(pairs, "text_a", "text_b").count())

  // pieces
  def hs(c: Column) = array_distinct(transform(graft.ml.Dedup.shingles(c, 3),
    s => conv(substring(md5(s), 25, 8), 16, 10).cast("long")))
  tN("pairs scan only")(pairs.select(sum(length(col("text_a")))).collect())
  tN("hash sides only")(pairs.select(hs(col("text_a")).as("hsA"), hs(col("text_b")).as("hsB"))
    .select(sum(size(col("hsA"))+size(col("hsB")))).collect())
  val hashed = pairs.select(hs(col("text_a")).as("hsA"), hs(col("text_b")).as("hsB"))
    .filter(size(col("hsA")) > 0 && size(col("hsB")) > 0)
    .repartition()
  def sig(h: String) = array((0 until 16).map { k =>
    array_min(transform(col(h),
      v => (v * lit(1000003L + 2L * k) + lit(12289L * k + 1L)) %
        lit(4294967296L)))
  }: _*)
  tN("hash+repart+sig")(hashed
    .select(col("hsA"), col("hsB"), sig("hsA").as("sigA"), sig("hsB").as("sigB"))
    .select(sum(element_at(col("sigA"),1)+element_at(col("sigB"),1))).collect())
}

if (want("phash")) {
  tN("q_image_phash full", 3)(graft.SparkEntry.queries("q_image_phash")(spark, dir).count())
  tN("q_image_resize full", 3)(graft.SparkEntry.queries("q_image_resize")(spark, dir).count())
}

System.exit(0)
