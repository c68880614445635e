import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, Column}
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val dir = "/root/testdata/sf0.1"
val df = spark.read.parquet(s"$dir/documents.parquet")
val small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
val k = 8; val minDocs = 2

// warm
graft.ml.Dedup.duplicatedPassages(small, "text", "doc_id", 8, 2).count()

// variant A: current (repartition + localCheckpoint + groupBy + join)
t("A-current")(graft.ml.Dedup.duplicatedPassages(df, "text", "doc_id", 8, 2).count())

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

// variant B: single shuffle via window-partition count over fp, then shuffle by id
def variantB(d: DataFrame): DataFrame = {
  val wins = winsOf(d)
  val byFp = Window.partitionBy("fp")
  val hits = wins
    .withColumn("nd", size(collect_set(col("id")).over(byFp)))
    .filter(col("nd") >= minDocs)
    .select("id", "pos")
  mergeSpans(hits)
}
t("B-window")(variantB(df).count())
t("B-window2")(variantB(df).count())

// variant C: groupBy fp with collect_list of (id,pos) -- one shuffle, explode after filter
def variantC(d: DataFrame): DataFrame = {
  val wins = winsOf(d)
  val hits = wins.groupBy("fp")
    .agg(collect_list(struct(col("id"), col("pos"))).as("occ"))
    .filter(size(array_distinct(transform(col("occ"), o => o.getField("id")))) >= minDocs)
    .select(explode(col("occ")).as("o"))
    .select(col("o.id").as("id"), col("o.pos").as("pos"))
  mergeSpans(hits)
}
t("C-collect")(variantC(df).count())
t("C-collect2")(variantC(df).count())

// variant D: current shape but NO localCheckpoint, NO repartition (recompute wins)
def variantD(d: DataFrame): DataFrame = {
  val wins = winsOf(d)
  val dup = wins.groupBy("fp")
    .agg(count_distinct(col("id")).as("nd"))
    .filter(col("nd") >= minDocs)
    .select("fp")
  mergeSpans(wins.join(dup, "fp").select("id", "pos"))
}
t("D-nockpt")(variantD(df).count())
t("D-nockpt2")(variantD(df).count())

t("A-current2")(graft.ml.Dedup.duplicatedPassages(df, "text", "doc_id", 8, 2).count())
System.exit(0)
