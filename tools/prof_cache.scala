// Codegen-cache thrash experiment: run a slice of the declared queries for
// 3 rounds (bench methodology) and report per-round sums.
import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.1"
val names = graft.SparkEntry.queries.keys.toSeq.sorted
println("[PROF] n queries: " + names.length)
try graft.SparkEntry.prebuildShared(spark, dir) catch { case _: Throwable => () }
for (r <- 0 until 3) {
  spark.catalog.clearCache()
  graft.core.CacheRegistry.drain()
  val t0 = System.nanoTime
  var per = List.empty[(String, Double)]
  for (n <- names) {
    val q0 = System.nanoTime
    try graft.SparkEntry.queries(n)(spark, dir).count() catch { case _: Throwable => () }
    per = (n -> (System.nanoTime - q0) / 1e9) :: per
  }
  println(f"[PROF round $r] total=${(System.nanoTime - t0) / 1e9}%.1f s")
  if (r == 2) println("[PROF slowest] " + per.sortBy(-_._2).take(15)
    .map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
}
System.exit(0)
