import org.apache.spark.sql.functions._
def t3[A](name: String)(f: => A): Unit = {
  f
  val xs = (1 to 3).map { _ =>
    val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }
  println(f"[PROF $name] ${xs.sorted.apply(1)}%.2f s  (${xs.map(x => f"$x%.2f").mkString(",")})")
}
val dir = "/root/testdata/sf0.1"
val ev = graft.core.Tables.load(spark, dir, "events")
println("[PROF rows] " + ev.count())
val raw = ev.select(col("event_id"), concat(lit("HTTPS://Cdn.Example.COM:443/"),
  col("event_type"), lit("/p?utm_source=t&id="), (col("user_id") % 7).cast("string"),
  lit("&x=1#s"), col("event_id").cast("string")).as("u")).localCheckpoint()
// sum(length) forces full evaluation — count() would prune the projection
t3("force raw")(raw.select(sum(length(col("u")))).collect())
t3("force 1 parse")(raw.select(sum(length(try_parse_url(col("u"), lit("HOST"))))).collect())
t3("force 5 parses")(raw.select(sum(length(try_parse_url(col("u"), lit("PROTOCOL")))
  + length(try_parse_url(col("u"), lit("HOST"))) + length(try_parse_url(col("u"), lit("AUTHORITY")))
  + length(try_parse_url(col("u"), lit("PATH"))) + length(try_parse_url(col("u"), lit("QUERY"))))).collect())
t3("force strip-fragment regex")(raw.select(sum(length(
  regexp_replace(col("u"), "#.*$", "")))).collect())
t3("force query filter+sort")(raw.select(sum(size(
  array_sort(filter(split(coalesce(try_parse_url(col("u"), lit("QUERY")), lit("")), "&"),
    p => p =!= "" && !p.startsWith("utm_")))))).collect())
t3("force normalizeUrl")(raw.select(sum(length(
  graft.ml.DatasetOps.normalizeUrl(col("u"))))).collect())
System.exit(0)
