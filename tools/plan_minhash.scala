graft.SparkEntry.queries("q_dedup_minhash")(spark, "/root/testdata/sf0.01").explain("formatted")
System.exit(0)
