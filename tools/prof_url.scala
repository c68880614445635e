// where does q_url_dedup spend its 1.4 s? run:
//   LANG=C.UTF-8 spark-shell --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -i tools/prof_url.scala
import org.apache.spark.sql.functions._
def t[A](name: String)(f: => A): A = {
  val s = System.nanoTime; val r = f
  println(f"[PROF $name] ${(System.nanoTime - s) / 1e9}%.2f s"); r
}
val dir = "/root/testdata/sf0.1"
val df = graft.SparkEntry.queries("q_url_dedup")(spark, dir)
df.count() // warm
t("q_url_dedup full")(df.count())
val ev = graft.core.Tables.load(spark, dir, "events")
val raw = ev.select(col("event_id"), concat(lit("HTTPS://Cdn.Example.COM:443/"),
  col("event_type"), lit("/p?utm_source=t&id="), (col("user_id") % 7).cast("string"),
  lit("&x=1#s"), col("event_id").cast("string")).as("u"))
raw.count()
t("build urls only")(raw.count())
t("1 parse")(raw.select(try_parse_url(col("u"), lit("HOST"))).count())
t("5 parses")(raw.select(try_parse_url(col("u"), lit("PROTOCOL")),
  try_parse_url(col("u"), lit("HOST")), try_parse_url(col("u"), lit("AUTHORITY")),
  try_parse_url(col("u"), lit("PATH")), try_parse_url(col("u"), lit("QUERY"))).count())
t("normalize only")(raw.select(graft.ml.DatasetOps.normalizeUrl(col("u"))).count())
t("full dedup agg")(graft.ml.DatasetOps.dedupByUrl(raw, "u", "event_id").count())
System.exit(0)
