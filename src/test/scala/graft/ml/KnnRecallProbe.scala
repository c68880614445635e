package graft.ml

import graft.SparkSpec

/** Measurement harness (not a regression spec): prints knnJoin recall at
  * several (numCells, nprobe, centroids) operating points so KnnJoinSpec
  * thresholds are pinned to measured values. Kept `ignore`d in CI. */
class KnnRecallProbe extends SparkSpec {
  import spark.implicits._

  ignore("measure recall operating points") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.knnJoinBrute(emb, "embedding", "vec_id", 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (brute & s).size.toDouble / brute.size
    }
    val trained = Similarity.trainKmeansCentroids(emb, "embedding", "vec_id", 16)
    for ((c, np) <- Seq((16, 2), (16, 4), (16, 8), (8, 2), (8, 4), (16, 16))) {
      val seeded = recall(Similarity.knnJoin(emb, "embedding", "vec_id", 3, c, np))
      val km = if (c == 16)
        recall(Similarity.knnJoin(emb, "embedding", "vec_id", 3, c, np,
          centroids = Some(trained)))
      else -1.0
      println(f"RECALL cells=$c np=$np seeded=$seeded%.3f kmeans=$km%.3f")
    }
  }
}
