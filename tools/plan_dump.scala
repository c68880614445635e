// dump executed plans for the fused dedup kernels — run via:
//   spark-shell --master 'local[4]' --conf spark.sql.shuffle.partitions=8 \
//     --driver-class-path target/scala-2.13/classes -i tools/plan_dump.scala
val dir = "/root/testdata/sf0.001"
for (q <- Seq("q_hamming_drop", "q_semantic_dedup")) {
  val df = graft.SparkEntry.queries(q)(spark, dir)
  df.count()
  println(s"===== $q =====")
  println(df.queryExecution.executedPlan.toString)
}
System.exit(0)
