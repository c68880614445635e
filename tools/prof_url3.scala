import org.apache.spark.sql.functions._
def t3[A](name: String)(f: => A): Unit = {
  f // warm
  val xs = (1 to 3).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] ${xs.sorted.apply(1)}%.2f s  (${xs.map(x => f"$x%.2f").mkString(",")})")
}
val dir = "/root/testdata/sf0.1"
val ev = graft.core.Tables.load(spark, dir, "events")
val raw = ev.select(col("event_id"), concat(lit("HTTPS://Cdn.Example.COM:443/"),
  col("event_type"), lit("/p?utm_source=t&id="), (col("user_id") % 7).cast("string"),
  lit("&x=1#s"), col("event_id").cast("string")).as("u"))
val normed = raw.select(graft.ml.DatasetOps.normalizeUrl(col("u")).as("url_norm"),
  col("event_id").as("id"))
t3("project only")(normed.count())
t3("agg in-plan")(normed.groupBy("url_norm").agg(min("id"), count(lit(1))).count())
t3("agg behind barrier")(normed.repartition(32).groupBy("url_norm")
  .agg(min("id"), count(lit(1))).count())
println(normed.groupBy("url_norm").agg(min("id")).queryExecution.executedPlan
  .toString.linesIterator.take(12).mkString("\n"))
System.exit(0)
