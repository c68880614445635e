// isolate: memo type (localCheckpoint vs persist) x fingerprint (kernel vs composed)
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

def fpComposed(text: Column): Column =
  graft.functions.ArrayFns.simhash64(
    transform(array_distinct(split(text, "\\s+")), x => xxhash64(x)))
def fpKernel(text: Column): Column = graft.ml.Dedup.simhash64Fingerprint(text)

def pairs(fp: Column => Column, ckpt: Boolean): Long = {
  val bands = 8; val k = 3; val bits = 64 / bands
  val sh0 = big.select(col("doc_id").as("id"), col("text").as("__t"))
    .repartition(col("id"))
    .select(col("id"), fp(col("__t")).as("sim"))
  val sh = if (ckpt) sh0.localCheckpoint()
    else { val p = sh0.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p }
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
  if (!ckpt) sh.unpersist()
  n
}
// fingerprint-only timing first (memo build alone)
t("fingerprint kernel only") {
  big.select(fpKernel(col("text")).as("s")).select(sum(bit_count(col("s")))).collect()
}
t("fingerprint composed only") {
  big.select(fpComposed(col("text")).as("s")).select(sum(bit_count(col("s")))).collect()
}
spark.catalog.clearCache()
t("ckpt + kernel")(println("[PROF] pairs: " + pairs(fpKernel, ckpt = true)))
spark.catalog.clearCache()
t("persist + composed")(println("[PROF] pairs: " + pairs(fpComposed, ckpt = false)))
System.exit(0)
