import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = { val s=System.nanoTime; val r=f; println(f"[$name] ${(System.nanoTime-s)/1e9}%.2f s"); r }
val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
graft.ml.Dedup.simhashHammingPairs(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id").count()
val sh = df.select(col("doc_id").as("id"), col("text").as("__t")).repartition(col("id"))
  .select(col("id"), graft.ml.Dedup.simhashFromHashes(graft.ml.Dedup.simhashTokenHashes(col("__t"))).as("sim"))
  .localCheckpoint()
t("simhash materialize")(sh.count())
val bits = 8
val banded = sh.select(col("id"), col("sim"), posexplode(array((0 until 4).map(b => shiftright(col("sim"), b*bits) % (1L << bits)): _*))).toDF("id","sim","band","chunk")
t("banded")(banded.count())
val cand = banded.as("l").join(banded.as("r"), col("l.band")===col("r.band") && col("l.chunk")===col("r.chunk") && col("l.id")<col("r.id")).select(col("l.id").as("id_a"), col("l.sim").as("sim_a"), col("r.id").as("id_b"), col("r.sim").as("sim_b"))
t("cand raw")(println("raw: " + cand.count()))
t("cand distinct")(println("dist: " + cand.distinct().count()))
t("full")(println("pairs: " + graft.ml.Dedup.simhashHammingPairs(df, "text", "doc_id").count()))
System.exit(0)
