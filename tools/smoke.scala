val df = graft.SparkEntry.entry(spark)
println("entry rows: " + df.count())
System.exit(0)
