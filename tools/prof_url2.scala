// is the normalize tree re-evaluated inside the agg? run:
//   LANG=C.UTF-8 spark-shell --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -i tools/prof_url2.scala
import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[PROF $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val dir = "/root/testdata/sf0.1"
val ev = graft.core.Tables.load(spark, dir, "events")
val raw = ev.select(col("event_id"), concat(lit("HTTPS://Cdn.Example.COM:443/"),
  col("event_type"), lit("/p?utm_source=t&id="), (col("user_id") % 7).cast("string"),
  lit("&x=1#s"), col("event_id").cast("string")).as("u"))
raw.count()
val normed = raw.select(graft.ml.DatasetOps.normalizeUrl(col("u")).as("url_norm"),
  col("event_id").as("id"))
t("agg over normalize-in-plan") {
  normed.groupBy("url_norm").agg(min("id"), count(lit(1))).count()
}
t("agg behind repartition barrier") {
  normed.repartition(32).groupBy("url_norm").agg(min("id"), count(lit(1))).count()
}
t("agg keyed on md5 digest") {
  normed.groupBy(md5(col("url_norm")).as("k"))
    .agg(min(col("url_norm")).as("url_norm"), min("id"), count(lit(1))).count()
}
val plan = normed.groupBy("url_norm").agg(min("id")).queryExecution.executedPlan.toString
println("[PROF url_norm evals in plan] " + "parse_url".r.findAllIn(plan).length)
System.exit(0)
