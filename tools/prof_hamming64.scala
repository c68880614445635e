// persist-lazy vs persist-eager for the hamming64 memo at 500k docs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[PROF $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val d1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val big = (0 until 100).map(i => d1.select(
  (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
  regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"))).reduce(_ union _)
big.count()

def pairs(eager: Boolean): Long = {
  val bands = 8; val k = 3; val bits = 64 / bands
  val sh0 = big.select(col("doc_id").as("id"), col("text").as("__t"))
    .repartition(col("id"))
    .select(col("id"), graft.ml.Dedup.simhash64Fingerprint(col("__t")).as("sim"))
    .persist(StorageLevel.MEMORY_AND_DISK)
  val sh = { if (eager) sh0.count(); sh0 }
  def chunk(sim: Column, b: Int): Column =
    shiftrightunsigned(sim, b * bits).bitwiseAND(lit((1L << bits) - 1))
  val banded = sh.select(col("id"), col("sim"),
      posexplode(array((0 until bands).map(b => chunk(col("sim"), b)): _*)))
    .toDF("id", "sim", "band", "chunk")
  val firstBand = coalesce((0 until bands).map(b =>
    when(chunk(col("l.sim"), b) === chunk(col("r.sim"), b), lit(b))): _*)
  val n = banded.as("l").join(banded.as("r"),
      col("l.band") === col("r.band") && col("l.chunk") === col("r.chunk") &&
        col("l.id") < col("r.id"))
    .filter(col("l.band") === firstBand)
    .select(col("l.id"), col("r.id"),
      bit_count(col("l.sim").bitwiseXOR(col("r.sim"))).as("h"))
    .filter(col("h") <= k).count()
  sh0.unpersist()
  n
}
spark.catalog.clearCache()
t("hamming64 LAZY persist")(println("[PROF] pairs: " + pairs(eager = false)))
spark.catalog.clearCache()
t("hamming64 EAGER persist")(println("[PROF] pairs: " + pairs(eager = true)))
System.exit(0)
