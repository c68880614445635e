import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
def toksC = split(col("text"), "\\s+")
def shinglesOld(n: Int): Column = {
  val toks = toksC
  array_distinct(transform(sequence(lit(0), greatest(size(toks) - n, lit(0))), i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
}
def shinglesZip(n: Int): Column = {
  val toks = toksC
  val shifted = (1 until n).map(k => slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))))
  val zipped = shifted.foldLeft(toks)((acc, s) => zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
  array_distinct(when(size(toks) < n, array(array_join(toks, " "))).otherwise(array_compact(zipped)))
}
// warmups
df.limit(10).select(sum(size(shinglesOld(3)))).collect()
df.limit(10).select(sum(size(shinglesZip(3)))).collect()
t("old 1core")(println(df.select(sum(size(shinglesOld(3)))).collect().toList))
t("zip 1core")(println(df.select(sum(size(shinglesZip(3)))).collect().toList))
t("split only")(println(df.select(sum(size(toksC))).collect().toList))
t("old+hash 1core")(println(df.select(sum(size(transform(shinglesOld(3), x => xxhash64(x))))).collect().toList))
val rep = df.repartition(32, col("doc_id"))
t("old 32core")(println(rep.select(sum(size(shinglesOld(3)))).collect().toList))
t("zip 32core")(println(rep.select(sum(size(shinglesZip(3)))).collect().toList))
// distinct check
val eq = df.select((shinglesOld(3) === shinglesZip(3)).as("same")).agg(sum(when(col("same"), 0).otherwise(1))).collect()
println("mismatches: " + eq.toList)
System.exit(0)
