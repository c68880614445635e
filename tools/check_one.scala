import org.apache.spark.sql.functions._
val q = sys.env("CHECK_Q")
val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/chk/$q")
println(s"$q rows: " + spark.read.parquet(s"/tmp/chk/$q").count())
df.explain("formatted")
System.exit(0)
