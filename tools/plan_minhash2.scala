val df = graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.01")
df.count() // execute so AQE finalizes
println("=== FINAL ===")
println(df.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("Scan parquet") || l.contains("ReusedExchange") || l.contains("Exchange") || l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin")).mkString("\n"))
System.exit(0)
