package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF index refresh story: append increments to a saved index against
  * IMMUTABLE centroids, measure per-cell drift against the build-time
  * baseline, rebuild when the drift policy trips. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong,
      Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))).toDF("vec_id", "embedding")

  test("save / load / append round-trip; re-appending an increment adds 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    Similarity.buildIvfIndex(vecs(0 until 40), "embedding", "vec_id",
      numCells = 8).save(dir)

    val increment = vecs(40 until 60)
    val added = Similarity.appendToIvfIndex(spark, dir, increment,
      "embedding", "vec_id")
    assert(added == 20)
    // crash-retry contract: the same increment appends nothing
    assert(Similarity.appendToIvfIndex(spark, dir, increment,
      "embedding", "vec_id") == 0)

    // appended vectors are found through the loaded index — a query AT an
    // appended vector must return it as its own top hit
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.assigned.count() == 60)
    val hit = Similarity.ivfSearch(loaded, vecs(55 until 56),
      "embedding", "vec_id", k = 1, nprobe = 8)
      .select("vec_id").as[Long].head()
    assert(hit == 55L)
  }

  test("drift report measures per-cell growth; rebuild policy trips at the threshold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString
    Similarity.buildIvfIndex(vecs(0 until 40), "embedding", "vec_id",
      numCells = 8).save(dir)

    // fresh index: zero drift everywhere, no rebuild needed
    val d0 = Similarity.ivfDrift(spark, dir)
    assert(d0.agg(max(col("drift"))).head().getDouble(0) == 0.0)
    assert(!Similarity.ivfNeedsRebuild(spark, dir))

    // a small increment: drift grows but stays under the 0.5 default
    Similarity.appendToIvfIndex(spark, dir, vecs(40 until 48),
      "embedding", "vec_id")
    val d1 = Similarity.ivfDrift(spark, dir).collect()
    assert(d1.map(_.getLong(2)).sum == 48) // cur_n sums to the corpus
    assert(d1.forall(r => r.getLong(2) >= r.getLong(1))) // cells only grow

    // double the corpus: some cell must now exceed 0.5 drift
    Similarity.appendToIvfIndex(spark, dir, vecs(48 until 96),
      "embedding", "vec_id")
    assert(Similarity.ivfNeedsRebuild(spark, dir),
      Similarity.ivfDrift(spark, dir).collect().mkString(", "))
    // a generous threshold can still accept it
    assert(!Similarity.ivfNeedsRebuild(spark, dir, maxDrift = 100.0))
  }

  test("pre-baseline index self-heals: first append writes the baseline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_heal").toString
    val idx = Similarity.buildIvfIndex(vecs(0 until 30), "embedding", "vec_id",
      numCells = 8)
    // simulate an r11-era index: save WITHOUT the baseline sidecar
    idx.assigned.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$dir/assigned")
    idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")

    Similarity.appendToIvfIndex(spark, dir, vecs(30 until 36),
      "embedding", "vec_id")
    // baseline was captured from the pre-append state, so drift counts
    // only this append's rows
    val rows = Similarity.ivfDrift(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == 30)
    assert(rows.map(_.getLong(2)).sum == 36)
  }

  test("IvfAppend YAML stage: PostCommit-deferred append, pass-through frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_yaml").toString
    Similarity.buildIvfIndex(vecs(0 until 40), "embedding", "vec_id",
      numCells = 8).save(dir)
    val increment = vecs(40 until 50)
    val stage = graft.pipeline.Planner.corpusStage("IvfAppend", Map(
      "index_path" -> dir, "src" -> "embedding", "id_field" -> "vec_id"))
    val out = stage(increment)
    // pass-through, and NOTHING appended until the sinks commit
    assert(out.count() == 10)
    assert(IvfIndex.load(spark, dir).assigned.count() == 40)
    graft.core.PostCommit.drain()
    assert(IvfIndex.load(spark, dir).assigned.count() == 50)
    // saved-index search path: SemanticSearch with index_path probes the
    // appended index (queries via query_where over the corpus frame)
    val search2 = graft.pipeline.Planner.corpusStage("SemanticSearch", Map(
      "index_path" -> dir, "src" -> "embedding", "id_field" -> "vec_id",
      "k" -> 1, "nprobe" -> 8, "query_where" -> "EQ(vec_id,45)"))
    val hit = search2(vecs(0 until 50)).select("vec_id")
      .as[Long].head()
    assert(hit == 45L)
  }

  test("auto-rebuild recovers a deliberately drifted index (r12 verdict task 7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_reb").toString
    // small base, then append 4x the base — drift far past the 0.5 trigger
    Similarity.buildIvfIndex(vecs(0 until 40), "embedding", "vec_id",
      numCells = 16).save(dir)
    Similarity.appendToIvfIndex(spark, dir, vecs(40 until 200),
      "embedding", "vec_id")
    assert(Similarity.ivfNeedsRebuild(spark, dir))

    val n = Similarity.rebuildIvfIndex(spark, dir)
    assert(n == 200) // nothing lost
    // retrained baseline: drift is zero again, policy unarmed
    assert(!Similarity.ivfNeedsRebuild(spark, dir))
    assert(Similarity.ivfDrift(spark, dir)
      .agg(max(col("drift"))).head().getDouble(0) == 0.0)

    // recall floor on the REBUILT index (the task's Done bar): ≥ 0.65 at
    // nprobe=8, queries spanning base and appended vectors
    val all = vecs(0 until 200)
    val queries = vecs(0 until 5).unionByName(vecs(190 until 195))
    val k = 5
    import spark.implicits._
    val exact = Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfSearch(IvfIndex.load(spark, dir), queries,
      "embedding", "vec_id", k, nprobe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.65, s"post-rebuild recall $recall < 0.65")
  }

  test("rebuild crash contract: complete sibling tmp is FINISHED, never discarded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_crash").toString + "/idx"
    Similarity.buildIvfIndex(vecs(0 until 60), "embedding", "vec_id",
      numCells = 8).save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the r13 ADVICE window: a rebuilt index is COMPLETE under the
    // sibling tmp while the live root still holds the OLD generation
    // (16 cells vs the root's 8 — generations must never mix). The old
    // commit path deleted this finished tmp and left root as-was; the
    // whole-dir swap must instead commit it wholesale.
    Similarity.buildIvfIndex(vecs(0 until 100), "embedding", "vec_id",
      numCells = 16).save(s"$dir.rebuild_tmp")
    assert(Similarity.rebuildIvfIndex(spark, dir) == 100) // finished the swap
    val idx = IvfIndex.load(spark, dir)
    assert(idx.assigned.count() == 100)
    // BOTH components are the tmp generation — no new-assigned/old-
    // centroids mix (the silent-wrong-results state the ADVICE flagged)
    assert(idx.centroids.count() == 16)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".rebuild_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".rebuild_old")))

    // crash between retiring old and committing tmp, tmp incomplete:
    // the retired generation is RESTORED and the rebuild proceeds
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".rebuild_old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".rebuild_tmp/assigned"))
    assert(Similarity.rebuildIvfIndex(spark, dir) == 100)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".rebuild_old")))

    // a stale INCOMPLETE tmp is discarded and a full rebuild proceeds
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".rebuild_tmp/assigned"))
    assert(Similarity.rebuildIvfIndex(spark, dir) == 100)
  }

  test("rebuild handles a trailing-slash index path (siblings stay siblings)") {
    // a config path like "data/idx/" must not turn "<path>.rebuild_tmp"
    // into a CHILD of the index root — renaming root under itself would
    // fail every rebuild forever (r14 review finding)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_slash")
      .toString + "/idx"
    Similarity.buildIvfIndex(vecs(0 until 60), "embedding", "vec_id",
      numCells = 8).save(dir)
    assert(Similarity.rebuildIvfIndex(spark, dir + "/") == 60)
    assert(IvfIndex.load(spark, dir).assigned.count() == 60)
  }

  test("rebuild crash contract: legacy in-root complete tmp is finished once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_legacy").toString
    Similarity.buildIvfIndex(vecs(0 until 60), "embedding", "vec_id",
      numCells = 8).save(dir)
    // the pre-r14 layout's crash state: complete under root/_rebuild_tmp,
    // live assigned gone — the migration arm finishes it component-wise
    Similarity.buildIvfIndex(vecs(0 until 60), "embedding", "vec_id",
      numCells = 8).save(s"$dir/_rebuild_tmp")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "assigned"), true)
    assert(Similarity.rebuildIvfIndex(spark, dir) == 60) // finished the swap
    assert(IvfIndex.load(spark, dir).assigned.count() == 60)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_rebuild_tmp")))
  }

  test("IvfAppend rebuild: auto retrains past max_drift, PostCommit-deferred") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_auto").toString
    Similarity.buildIvfIndex(vecs(0 until 30), "embedding", "vec_id",
      numCells = 8).save(dir)
    val stage = graft.pipeline.Planner.corpusStage("IvfAppend", Map(
      "index_path" -> dir, "src" -> "embedding", "id_field" -> "vec_id",
      "rebuild" -> "auto"))
    stage(vecs(30 until 150)).count() // 4x the base: past max_drift
    // nothing happens until the sinks commit
    assert(Similarity.ivfDrift(spark, dir).collect().map(_.getLong(2)).sum == 30)
    graft.core.PostCommit.drain()
    // appended AND auto-rebuilt: fresh baseline, no pending rebuild
    assert(IvfIndex.load(spark, dir).assigned.count() == 150)
    assert(!Similarity.ivfNeedsRebuild(spark, dir))
    // unknown rebuild mode is a plan-time error
    assert(intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("IvfAppend", Map(
        "index_path" -> dir, "rebuild" -> "nope"))
    }.getMessage.contains("rebuild mode"))
  }

  test("ivfProbeStats: candidate scan cost grows with nprobe (the dial " +
      "recall can't see at small SF)") {
    val corpus = vecs(0 until 200)
    val qs = corpus.filter(col("vec_id") < 5)
    def stats(np: Int) = Similarity
      .ivfProbeStats(corpus, qs, "embedding", "vec_id", numCells = 16,
        nprobe = np)
      .select("query_id", "n_cells", "n_candidates")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val one = stats(1); val three = stats(3)
    assert(one.keySet == three.keySet && one.size == 5)
    one.foreach { case (q, (cells1, cand1)) =>
      val (cells3, cand3) = three(q)
      assert(cells1 == 1L && cells3 == 3L, s"query $q probed $cells1/$cells3")
      // every cell is non-empty here (200 vecs / 16 seeded cells), so
      // more probes MUST mean strictly more candidates
      assert(cand3 > cand1, s"query $q: nprobe 3 scanned $cand3 <= $cand1")
      assert(cand1 > 0L)
    }
    // total candidates across all cells == the corpus (assignment is a
    // partition): probing ALL cells scans everything exactly once
    val all = Similarity.ivfProbeStats(corpus, qs, "embedding", "vec_id",
      numCells = 16, nprobe = 16)
      .select("n_candidates").as[Long].collect()
    assert(all.forall(_ == 200L))
  }

  test("post-append recall holds the measured r11 floor (>= 0.65 at nprobe=8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rec").toString
    Similarity.buildIvfIndex(vecs(0 until 120), "embedding", "vec_id",
      numCells = 16).save(dir)
    Similarity.appendToIvfIndex(spark, dir, vecs(120 until 180),
      "embedding", "vec_id")

    val all = vecs(0 until 180)
    val queries = vecs(0 until 5).unionByName(vecs(170 until 175))
    val k = 5
    val exact = Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfSearch(IvfIndex.load(spark, dir), queries,
      "embedding", "vec_id", k, nprobe = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.65, s"post-append recall $recall < 0.65")
  }
}
