package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling (Xie et al. 2023): hashed-ngram importance
  * weights from a target sample vs the raw pool, then Gumbel top-k or
  * hash-threshold selection. The exact ratio lattice is gated by q_dsir;
  * these specs cover what the SQL oracle cannot — the log-space weights
  * and the selection actually enriching the target domain. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two-domain pool: even ids draw from a "science" vocabulary (the
  // target domain), odd ids from a "spam" vocabulary. Deterministic
  // index arithmetic, no RNG.
  private val sci = Vector("research", "method", "analysis", "theorem",
    "proof", "experiment", "measurement", "hypothesis", "variable", "model")
  private val spam = Vector("click", "buy", "now", "cheap", "free", "offer",
    "winner", "prize", "urgent", "deal")
  private def doc(words: Vector[String], i: Int): String =
    (0 until 10).map(j => words((i * 3 + j * 7) % words.size)).mkString(" ")
  private def pool(ids: Range) = ids.map { i =>
    (i.toLong, if (i % 2 == 0) doc(sci, i) else doc(spam, i))
  }.toDF("id", "text")
  // target sample: 30 UNSEEN science docs (disjoint index range)
  private def target = (1000 until 1030).map(i => (i.toLong, doc(sci, i)))
    .toDF("id", "text")

  private def modelOf(p: org.apache.spark.sql.DataFrame) = Dsir.model(
    Dsir.ngramCounts(target, "text", 10),
    Dsir.ngramCounts(p, "text", 10), 10)

  test("ngramCounts is bounded with a total sentinel; model demands it") {
    val counts = Dsir.ngramCounts(pool(0 until 40), "text", 8).collect()
    assert(counts.length <= 257)
    val total = counts.filter(_.getInt(0) == -1)
    assert(total.length == 1)
    assert(total.head.getLong(1) ==
      counts.filter(_.getInt(0) >= 0).map(_.getLong(1)).sum)
    // a frame without the sentinel is rejected loudly
    val noSentinel = Dsir.ngramCounts(pool(0 until 40), "text", 8)
      .filter(col("bucket") >= 0)
    assert(intercept[IllegalArgumentException] {
      Dsir.model(noSentinel, Dsir.ngramCounts(pool(0 until 40), "text", 8), 8)
    }.getMessage.contains("sentinel"))
  }

  test("ngramCountsWithTarget ≡ two ngramCounts passes, bit-for-bit") {
    // the fused single-pass form (one explode+agg instead of two) must
    // produce frames whose drained values equal the separate passes —
    // zero-count target buckets are equivalent to absent ones, so
    // compare as maps with zeros dropped
    val p = pool(0 until 80)
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        .filter(_._2 != 0L)
    val (tc, rc) = Dsir.ngramCountsWithTarget(p, "text",
      col("id") % 2 === 0, logBuckets = 8)
    val tSep = Dsir.ngramCounts(p.filter(col("id") % 2 === 0), "text",
      logBuckets = 8)
    val rSep = Dsir.ngramCounts(p, "text", logBuckets = 8)
    assert(asMap(tc) == asMap(tSep))
    assert(asMap(rc) == asMap(rSep))
    // and the models built from both forms are bit-identical
    val mFused = Dsir.model(tc, rc, logBuckets = 8)
    val mSep = Dsir.model(tSep, rSep, logBuckets = 8)
    assert(mFused.ratio.toSeq == mSep.ratio.toSeq)
    assert(mFused.logRatio.toSeq == mSep.logRatio.toSeq)
  }

  test("model rejects a count frame from a LARGER logBuckets loudly, not AIOOBE") {
    // a sparse frame passes the row-count require; the bucket-range
    // check must name the cause instead of ArrayIndexOutOfBounds
    val wide = Dsir.ngramCounts(pool(0 until 5), "text", logBuckets = 10)
    val e = intercept[IllegalArgumentException] {
      Dsir.model(wide, wide, logBuckets = 8)
    }
    assert(e.getMessage.contains("logBuckets"), e.getMessage)
  }

  test("log weights separate the domains; weigh is a zero-exchange map") {
    val p = pool(0 until 200)
    val m = modelOf(p)
    val weighed = Dsir.weigh(p, "text", "id", m)
    val byDomain = weighed
      .select((col("id") % 2 === 0).as("isSci"), col("log_weight"))
      .groupBy("isSci").agg(avg("log_weight")).as[(Boolean, Double)]
      .collect().toMap
    // the SIGN of a domain's mean weight depends on smoothing mass (the
    // target sample is deliberately disjoint from the pool's docs, so
    // even science bigrams pay some unseen penalty); what selection needs
    // is SEPARATION, and it is wide
    assert(byDomain(true) > byDomain(false) + 10.0,
      s"domains should separate clearly: $byDomain")
    assert(byDomain(false) < 0, s"spam docs should weigh negative: $byDomain")

    // plan shape: scoring a scan must add no exchange
    val scan = spark.range(100).select(col("id"),
      concat_ws(" ", lit("research method"), col("id").cast("string"))
        .as("text"))
    val out = Dsir.weigh(scan, "text", "id", m)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weigh gained a shuffle:\n$plan")
  }

  test("Gumbel top-k enriches the target domain and is deterministic") {
    val p = pool(0 until 400) // 50/50 science/spam
    val weighed = Dsir.weigh(p, "text", "id", modelOf(p))
    val kept = Dsir.resampleTopK(weighed, "id", k = 100, seed = 3)
      .select("id").as[Long].collect().toSet
    assert(kept.size == 100)
    val sciFrac = kept.count(_ % 2 == 0).toDouble / kept.size
    assert(sciFrac >= 0.9, s"target-domain fraction after resample: $sciFrac")
    // deterministic in (id, seed): repartitioning must not change the set
    val kept2 = Dsir.resampleTopK(
      Dsir.weigh(p.repartition(32), "text", "id", modelOf(p)),
      "id", k = 100, seed = 3).select("id").as[Long].collect().toSet
    assert(kept2 == kept)
    // a different seed moves the marginal picks, not the bulk
    val keptOther = Dsir.resampleTopK(weighed, "id", k = 100, seed = 4)
      .select("id").as[Long].collect().toSet
    assert(keptOther.count(_ % 2 == 0).toDouble / 100 >= 0.9)
  }

  test("hash-threshold keep enriches too and replays bit-deterministically") {
    val p = pool(0 until 400)
    val weighed = Dsir.weigh(p, "text", "id", modelOf(p))
    val kept = weighed.filter(Dsir.thresholdKeep(weighed, "id"))
      .select("id").as[Long].collect().toSet
    val base = weighed.filter(col("n_feats") > 0).count()
    assert(kept.nonEmpty && kept.size < base)
    val sciFrac = kept.count(_ % 2 == 0).toDouble / kept.size
    assert(sciFrac >= 0.8, s"threshold keep target fraction: $sciFrac")
  }

  test("YAML dispatch: target spec + methods; streaming guards are loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    target.write.parquet(s"$dir/target")
    val p = pool(0 until 200)
    val stage = graft.pipeline.Planner.corpusStage("Dsir", Map(
      "src" -> "text", "id_field" -> "id",
      "target" -> Map("input" -> "Parquet", "path" -> s"$dir/target"),
      "log_buckets" -> 10, "method" -> "topk", "k" -> 50, "seed" -> 3))
    val kept = stage(p).select("id").as[Long].collect().toSet
    assert(kept.size == 50)
    assert(kept.count(_ % 2 == 0) >= 45, s"yaml topk kept $kept")
    // evidence columns drop by default, stay with keep_evidence
    assert(!stage(p).columns.contains("log_weight"))
    val stage2 = graft.pipeline.Planner.corpusStage("Dsir", Map(
      "src" -> "text", "id_field" -> "id",
      "target" -> Map("input" -> "Parquet", "path" -> s"$dir/target"),
      "log_buckets" -> 10, "method" -> "threshold", "keep_evidence" -> true))
    assert(stage2(p).columns.contains("sum_ratio"))
    // missing target: loud
    assert(intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("Dsir", Map("method" -> "topk"))(p)
    }.getMessage.contains("target"))
  }

  test("YAML target_where: fused single-pass counts match a separate target input") {
    // the target as a PREDICATE over the pool (here: the science half by
    // id parity via the condition DSL's Match on text) — one corpus pass
    // builds both count frames; selection must agree with the equivalent
    // two-pass form using the same rows as the target sample
    val p = pool(0 until 200)
    val fusedStage = graft.pipeline.Planner.corpusStage("Dsir", Map(
      "src" -> "text", "id_field" -> "id",
      "target_where" -> """Contains(text,"research") || Contains(text,"method")""",
      "log_buckets" -> 10, "method" -> "topk", "k" -> 50, "seed" -> 3))
    val kept = fusedStage(p).select("id").as[Long].collect().toSet
    assert(kept.size == 50)
    assert(kept.count(_ % 2 == 0) >= 45, s"fused target_where kept $kept")
    // contradictory config fails loudly
    assert(intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("Dsir", Map(
        "target_where" -> "Exist(text)",
        "target" -> Map("input" -> "Parquet", "path" -> "/nope"),
        "method" -> "topk", "k" -> 1))(p)
    }.getMessage.contains("mutually exclusive"))
    assert(intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("Dsir", Map(
        "target_where" -> "Exist(text)",
        "raw_counts_path" -> "/nope",
        "method" -> "topk", "k" -> 1))(p)
    }.getMessage.contains("one pass"))
  }

  test("streaming: threshold method with BOTH counts saved runs on a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_stream").toString
    val p = pool(0 until 200)
    Dsir.ngramCounts(target, "text", 10).write.parquet(s"$dir/tgt")
    Dsir.ngramCounts(p, "text", 10).write.parquet(s"$dir/raw")
    val stage = graft.pipeline.Planner.corpusStage("Dsir", Map(
      "src" -> "text", "id_field" -> "id",
      "target_counts_path" -> s"$dir/tgt", "raw_counts_path" -> s"$dir/raw",
      "log_buckets" -> 10, "method" -> "threshold", "cap" -> 1.0))
    val mem = MemoryStream[(Long, String)]
    val out = stage(mem.toDF.toDF("id", "text"))
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream").start()
    try {
      mem.addData((500L, doc(sci, 500)), (501L, doc(spam, 501)),
        (502L, doc(sci, 502)), (503L, doc(spam, 503)))
      q.processAllAvailable()
      val kept = spark.table("dsir_stream").select("id").as[Long].collect().toSet
      // target-domain docs survive the threshold; spam drops
      assert(kept.subsetOf(Set(500L, 502L)) && kept.nonEmpty, s"stream kept $kept")
    } finally q.stop()
    // counting inside a stream is rejected loudly
    val e = intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("Dsir", Map(
        "src" -> "text", "id_field" -> "id",
        "target" -> Map("input" -> "Parquet", "path" -> s"$dir/tgt"),
        "method" -> "threshold"))(mem.toDF.toDF("id", "text"))
    }
    assert(e.getMessage.contains("stream"), e.getMessage)
  }

  test("counts store: partials sum (incl. the total sentinel); YAML store is PostCommit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir_store").toString
    val day1 = pool(0 until 50)
    val day2 = pool(50 until 100)
    Dsir.appendToCountsStore(day1, "text", s"$dir/raw", 8)
    Dsir.appendToCountsStore(day2, "text", s"$dir/raw", 8)
    val merged = Dsir.countsFromStore(spark, s"$dir/raw").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = Dsir.ngramCounts(pool(0 until 100), "text", 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == direct, "two appends must equal one pass over the union")
    // compaction folds partials without changing the view
    Dsir.compactCountsStore(spark, s"$dir/raw")
    assert(Dsir.countsFromStore(spark, s"$dir/raw").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap == direct)

    // YAML: raw_counts_store scores against store + today's increment and
    // appends AFTER the sinks commit (counts merge — not idempotent)
    target.write.parquet(s"$dir/target")
    val stage = graft.pipeline.Planner.corpusStage("Dsir", Map(
      "src" -> "text", "id_field" -> "id",
      "target" -> Map("input" -> "Parquet", "path" -> s"$dir/target"),
      "raw_counts_store" -> s"$dir/raw2", "log_buckets" -> 10,
      "method" -> "threshold", "keep_evidence" -> true))
    val out = stage(day1)
    assert(out.columns.contains("sum_ratio"))
    out.count()
    // nothing stored until the commit hook runs
    assert(Dsir.countsFromStore(spark, s"$dir/raw2").count() == 0)
    graft.core.PostCommit.drain()
    val stored = Dsir.countsFromStore(spark, s"$dir/raw2")
    assert(stored.filter(col("bucket") === -1).count() == 1)
    // path + store together is a config error
    assert(intercept[RuntimeException] {
      graft.pipeline.Planner.corpusStage("Dsir", Map(
        "src" -> "text", "id_field" -> "id",
        "target" -> Map("input" -> "Parquet", "path" -> s"$dir/target"),
        "raw_counts_path" -> s"$dir/raw", "raw_counts_store" -> s"$dir/raw2",
        "method" -> "threshold"))(day1)
    }.getMessage.contains("mutually exclusive"))
  }

  test("guards: oversized/foreign count frames and bad params fail loudly") {
    val p = pool(0 until 40)
    // counts built at a different logBuckets are rejected
    val c10 = Dsir.ngramCounts(p, "text", 10)
    assert(intercept[IllegalArgumentException] {
      Dsir.model(c10, c10, 4)
    }.getMessage.contains("logBuckets"))
    val weighed = Dsir.weigh(p, "text", "id", modelOf(p))
    assert(intercept[IllegalArgumentException] {
      Dsir.resampleTopK(weighed, "id", 0)
    }.getMessage.contains("positive"))
    assert(intercept[IllegalArgumentException] {
      Dsir.weigh(weighed, "text", "id", modelOf(p))
    }.getMessage.contains("already exists"))
  }
}
