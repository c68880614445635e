import org.apache.spark.sql.functions._
val dir = "/root/testdata/sf0.01"
def plan(q: String): Unit = {
  println(s"===== $q =====")
  graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
}
plan("q_condition_dsl")
plan("q1_pricing")
plan("q5_region_revenue")
System.exit(0)
