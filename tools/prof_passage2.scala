// Variant E: single fp-shuffle, skew-safe distinct-doc count via ordered
// lag boundaries (no per-group set state), then id-shuffle for span merge.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, Column}
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val dir = "/root/testdata/sf0.1"
val df = spark.read.parquet(s"$dir/documents.parquet")
val small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
val k = 8; val minDocs = 2

graft.ml.Dedup.duplicatedPassages(small, "text", "doc_id", 8, 2).count()

def winsOf(d: DataFrame): DataFrame =
  d.select(col("doc_id").as("id"),
      posexplode(transform(graft.ml.TextAnalysis.ngramsAll(col("text"), k), g => xxhash64(g))))
    .toDF("id", "pos", "fp")

def mergeSpans(hits: DataFrame): DataFrame = {
  val order = Window.partitionBy("id").orderBy("pos")
  val prior = Window.partitionBy("id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
  hits
    .withColumn("boundary",
      when(col("pos") > coalesce(max(col("pos") + k).over(prior), lit(-1L)), 1L).otherwise(0L))
    .withColumn("span", sum("boundary").over(order))
    .groupBy("id", "span")
    .agg(min("pos").cast("long").as("span_start"), (max("pos") + k).cast("long").as("span_end"))
    .select(col("id"), col("span_start"), col("span_end"))
}

def variantE(d: DataFrame): DataFrame = {
  val wins = winsOf(d)
  val byFpOrd = Window.partitionBy("fp").orderBy("id")
  val byFp = Window.partitionBy("fp")
  val hits = wins
    .withColumn("newdoc",
      when(lag(col("id"), 1).over(byFpOrd).isNull ||
        lag(col("id"), 1).over(byFpOrd) =!= col("id"), 1L).otherwise(0L))
    .withColumn("nd", sum(col("newdoc")).over(byFp))
    .filter(col("nd") >= minDocs)
    .select("id", "pos")
  mergeSpans(hits)
}
t("E-lagwin")(variantE(df).count())
t("E-lagwin2")(variantE(df).count())
t("A-current")(graft.ml.Dedup.duplicatedPassages(df, "text", "doc_id", 8, 2).count())

// correctness: E equals A exactly
val a = graft.ml.Dedup.duplicatedPassages(df, "text", "doc_id", 8, 2)
  .selectExpr("doc_id as id", "span_start", "span_end")
val e = variantE(df)
println("E minus A: " + e.except(a).count() + ", A minus E: " + a.except(e).count())
// plan: count exchanges
println(variantE(df).queryExecution.executedPlan.toString.split("\n").count(_.contains("Exchange")))
System.exit(0)
