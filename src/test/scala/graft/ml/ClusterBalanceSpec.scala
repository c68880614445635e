package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-space topic balance: in-row nearest-centroid assignment +
  * per-cluster quota (the cluster complement of quota sampling). */
class ClusterBalanceSpec extends SparkSpec {
  import spark.implicits._

  // two clean blobs around +1 and -1, ids 0..9 in A, 10..19 in B
  private def blobs = {
    val a = (0L until 10L).map(i => (i, Array.tabulate(4)(d =>
      (1.0 + 0.01 * i + 0.001 * d).toFloat), i.toDouble))
    val b = (10L until 20L).map(i => (i, Array.tabulate(4)(d =>
      (-1.0 - 0.01 * i + 0.001 * d).toFloat), i.toDouble))
    (a ++ b).toDF("id", "embedding", "score")
  }

  private def cents = Seq(
    (0L, Array.tabulate(4)(_ => 1.0)),
    (1L, Array.tabulate(4)(_ => -1.0))).toDF("cell_id", "centroid")

  test("assignment lands each blob on its centroid; quota caps per cluster") {
    val out = DatasetOps.balanceByCluster(blobs, "embedding", "id", cents,
      perCluster = 3)
    val byCluster = out.select("cluster_id", "id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    // default order: lowest ids win the quota
    assert(byCluster(0L) == Set(0L, 1L, 2L))
    assert(byCluster(1L) == Set(10L, 11L, 12L))
    // schema: input columns + cluster_id
    assert(out.columns.toSeq == Seq("id", "embedding", "score", "cluster_id"))
  }

  test("score_field keeps the BEST rows per cluster, ties by id") {
    val out = DatasetOps.balanceByCluster(blobs, "embedding", "id", cents,
      perCluster = 2, scoreCol = Some("score"))
    val byCluster = out.select("cluster_id", "id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    assert(byCluster(0L) == Set(8L, 9L))   // highest scores in blob A
    assert(byCluster(1L) == Set(18L, 19L))
  }

  test("null embeddings drop instead of eating the lowest cluster's quota") {
    val withNull = blobs.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]], 0.0)).toDF("id", "embedding", "score"))
    val out = DatasetOps.balanceByCluster(withNull, "embedding", "id", cents, 100)
    assert(out.count() == 20)
    assert(out.filter(col("id") === 99L).count() == 0)
  }

  test("guards: cluster_id collision, empty/oversized panel, bad quota") {
    val withCol = blobs.withColumn("cluster_id", lit(0L))
    assert(intercept[IllegalArgumentException] {
      DatasetOps.balanceByCluster(withCol, "embedding", "id", cents, 1)
    }.getMessage.contains("cluster_id"))
    assert(intercept[IllegalArgumentException] {
      DatasetOps.balanceByCluster(blobs, "embedding", "id",
        cents.filter(lit(false)), 1)
    }.getMessage.contains("empty centroid panel"))
    assert(intercept[IllegalArgumentException] {
      DatasetOps.balanceByCluster(blobs, "embedding", "id", cents, 0)
    }.getMessage.contains("perCluster"))
    // panel hygiene (r12 ADVICE): a NULL panel row would NPE in the
    // driver-side norm fold; a duplicate cell_id would double a quota
    val nullRow = cents.unionByName(Seq((2L, null.asInstanceOf[Array[Double]]))
      .toDF("cell_id", "centroid"))
    assert(intercept[IllegalArgumentException] {
      DatasetOps.balanceByCluster(blobs, "embedding", "id", nullRow, 1)
    }.getMessage.contains("NULL cell_id or"))
    val dup = cents.unionByName(cents.limit(1))
    assert(intercept[IllegalArgumentException] {
      DatasetOps.balanceByCluster(blobs, "embedding", "id", dup, 1)
    }.getMessage.contains("duplicate cell_id"))
  }

  test("partition invariance and plan shape: one exchange, WindowGroupLimit") {
    val r1 = DatasetOps.balanceByCluster(blobs.repartition(1), "embedding",
      "id", cents, 3).select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val r32 = DatasetOps.balanceByCluster(blobs.repartition(32), "embedding",
      "id", cents, 3).select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(r1 == r32)

    val out = DatasetOps.balanceByCluster(blobs, "embedding", "id", cents, 3)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    // assignment is in-row: the ONLY exchange is the quota window's, and
    // its rank filter prunes map-side (mega-cluster safe)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"assignment gained a shuffle:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"quota not pruned map-side:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("YAML dispatch: seeded centroids and explicit panel") {
    // seeded: ids < num_cells are the centroids (IVF convention)
    val staged = graft.pipeline.Planner.corpusStage("ClusterBalance", Map(
      "src" -> "embedding", "id_field" -> "id",
      "num_cells" -> 2, "per_cluster" -> 3))(blobs)
    assert(staged.count() == 6)
    // kmeans: true trains Lloyd centroids first (the SemanticDedup/
    // KnnJoin shared option contract) — both blobs must still cap at 3
    val trained = graft.pipeline.Planner.corpusStage("ClusterBalance", Map(
      "src" -> "embedding", "id_field" -> "id",
      "kmeans" -> true, "num_cells" -> 2, "per_cluster" -> 3))(blobs)
    assert(trained.count() == 6)
    assert(trained.groupBy("cluster_id").count()
      .select("count").as[Long].collect().toSeq == Seq(3L, 3L))
    // box options rejected (corpus stage)
    val e = intercept[RuntimeException] {
      graft.pipeline.Planner.filterStage("ClusterBalance", Map(
        "per_cluster" -> 3, "failTag" -> "x"))(blobs)
    }
    assert(e.getMessage.contains("corpus-level"), e.getMessage)
  }
}
