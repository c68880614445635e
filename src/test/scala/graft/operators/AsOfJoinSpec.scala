package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val left = Seq(
    (1L, 1L, ts(100)), // before any right row for key 1
    (2L, 1L, ts(200)), // exactly at a right ts — inclusive match
    (3L, 1L, ts(250)),
    (4L, 1L, ts(900)), // far after the last right row
    (5L, 2L, ts(500)), // key with no right rows at all
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (1L, ts(200), "a"),
    (1L, ts(240), "b"),
    (3L, ts(100), "zz"), // key never probed
  ).toDF("k", "rt", "v")

  private def run(tol: Option[Long] = None) =
    AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("v"),
        suffix = "_m", toleranceSec = tol)
      .select($"id", $"rt_m", $"v_m")
      .as[(Long, Option[Timestamp], Option[String])]
      .collect().map(r => r._1 -> ((r._2.map(_.getTime / 1000), r._3))).toMap

  test("most recent at-or-before match, inclusive ties, null when none") {
    val m = run()
    assert(m(1L) == ((None, None)))                    // no row at-or-before
    assert(m(2L) == ((Some(200L), Some("a"))))         // tie: r.ts == l.ts matches
    assert(m(3L) == ((Some(240L), Some("b"))))         // latest of two priors
    assert(m(4L) == ((Some(240L), Some("b"))))         // carries arbitrarily far
    assert(m(5L) == ((None, None)))                    // key absent on right
  }

  test("tolerance nulls ts and value atomically") {
    val m = run(tol = Some(100L))
    assert(m(2L) == ((Some(200L), Some("a"))))         // age 0 <= 100
    assert(m(3L) == ((Some(240L), Some("b"))))         // age 10 <= 100
    assert(m(4L) == ((None, None)))                    // age 660 > 100: both null
  }

  test("carried columns stay atomic when right values are null") {
    // Right rows where v is null must still count as the MATCH (the row
    // exists); a per-column last(ignoreNulls) would skip back to an older
    // row's v — the struct carry must not.
    val r2 = Seq((1L, ts(200), Some("old")), (1L, ts(240), None))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.leftAsOf(
        left.filter($"id" === 3L), r2, Seq("k"), "t", "rt", Seq("v"), suffix = "_m")
      .select($"rt_m", $"v_m").as[(Option[Timestamp], Option[String])].head()
    assert(out._1.map(_.getTime / 1000).contains(240L))
    assert(out._2.isEmpty) // the matched row's own null v, not "old"
  }

  test("forward: earliest at-or-after match, inclusive ties, bounded by tolerance") {
    def runF(tol: Option[Long] = None) =
      AsOfJoin.leftAsOfForward(left, right, Seq("k"), "t", "rt", Seq("v"),
          suffix = "_m", toleranceSec = tol)
        .select($"id", $"rt_m", $"v_m")
        .as[(Long, Option[Timestamp], Option[String])]
        .collect().map(r => r._1 -> ((r._2.map(_.getTime / 1000), r._3))).toMap
    val m = runF()
    assert(m(1L) == ((Some(200L), Some("a"))))   // next right after 100
    assert(m(2L) == ((Some(200L), Some("a"))))   // tie: r.ts == l.ts matches
    assert(m(3L) == ((None, None)))              // nothing at-or-after 250? 240<250 → none
    assert(m(4L) == ((None, None)))              // past the last right row
    assert(m(5L) == ((None, None)))              // key absent on right
    val mt = runF(tol = Some(50L))
    assert(mt(1L) == ((None, None)))             // 100 ahead > 50: nulled
    assert(mt(2L) == ((Some(200L), Some("a"))))  // 0 ahead
  }

  test("temporal store: idempotent appends, null keys dropped, enrich matches direct as-of") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tstore").toString + "/v"
    val inc1 = Seq((1L, ts(200), "a"), (1L, ts(240), "b")).toDF("k", "rt", "v")
    assert(AsOfJoin.appendToTemporalStore(inc1, Seq("k"), "rt", Seq("v"), dir) == 2L)
    // replaying the same increment adds nothing
    assert(AsOfJoin.appendToTemporalStore(inc1, Seq("k"), "rt", Seq("v"), dir) == 0L)
    // null key / null ts rows can never match a probe — dropped at append
    val dirty = Seq(
      (Some(3L), Some(ts(100)), "zz"),
      (None, Some(ts(1)), "nokey"),
      (Some(4L), None, "nots"),
    ).toDF("k", "rt", "v")
    assert(AsOfJoin.appendToTemporalStore(dirty, Seq("k"), "rt", Seq("v"), dir) == 1L)

    val direct  = run()
    val stored = AsOfJoin.enrichFromTemporalStore(left, dir,
        Seq("k"), "t", "rt", Seq("v"), suffix = "_m")
      .select($"id", $"rt_m", $"v_m")
      .as[(Long, Option[Timestamp], Option[String])]
      .collect().map(r => r._1 -> ((r._2.map(_.getTime / 1000), r._3))).toMap
    assert(stored == direct)
  }

  test("streaming enrichment recipe: foreachBatch as-of against the temporal store") {
    // the pattern the Planner's streaming error message points at: each
    // micro-batch of left events enriches against the accumulated store
    // (a plain batch as-of inside foreachBatch), while right-side
    // increments append between batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_tstore_s").toString + "/v"
    AsOfJoin.appendToTemporalStore(
      Seq((1L, ts(200), "a")).toDF("k", "rt", "v"), Seq("k"), "rt", Seq("v"), dir)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    val mem = MemoryStream[(Long, Long, Long)] // (id, k, epochSec)
    val q = mem.toDF.toDF("id", "k", "tsec")
      .select($"id", $"k", timestamp_seconds($"tsec").as("t"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = AsOfJoin.enrichFromTemporalStore(batch, dir,
            Seq("k"), "t", "rt", Seq("v"), suffix = "_m")
          .select($"id", $"v_m").as[(Long, Option[String])].collect()
        collected.synchronized { collected ++= out }
        ()
      }.start()
    try {
      mem.addData((1L, 1L, 250L))
      q.processAllAvailable()
      // store grows between micro-batches; the next batch sees the new version
      AsOfJoin.appendToTemporalStore(
        Seq((1L, ts(300), "b")).toDF("k", "rt", "v"), Seq("k"), "rt", Seq("v"), dir)
      mem.addData((2L, 1L, 350L), (3L, 1L, 100L))
      q.processAllAvailable()
      val m = collected.synchronized(collected.toMap)
      assert(m == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
    } finally q.stop()
  }

  test("plan: one exchange, no join operator, no cartesian product") {
    val plan = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one keyed exchange:\n$plan")
  }

  test("null right timestamps never match (asc nulls-first would carry them)") {
    // a null-ts right row sorts FIRST ascending and was carried as a
    // "match" the r.ts <= l.ts contract never makes (r14 fix)
    val r2 = Seq((2L, Option.empty[Timestamp], "ghost")).toDF("k", "rt", "v")
    val m = AsOfJoin.leftAsOf(left, r2, Seq("k"), "t", "rt", Seq("v"),
        suffix = "_m")
      .select($"id", $"v_m").as[(Long, Option[String])].collect().toMap
    assert(m(5L).isEmpty, s"null-ts right row matched: $m") // key 2 probe
    val mN = AsOfJoin.leftAsOfNearest(left, r2, Seq("k"), "t", "rt",
        Seq("v"), suffix = "_m")
      .select($"id", $"v_m").as[(Long, Option[String])].collect().toMap
    assert(mN(5L).isEmpty, s"nearest carried a null-ts right row: $mN")
  }

  test("numeric event-time columns work with tolerance and nearest (epoch seconds)") {
    // the scaladoc promises numeric ts; unix_micros made any tolerance/
    // nearest call an AnalysisException on LongType columns (r14 fix)
    val l = Seq((1L, 1L, 250L), (2L, 1L, 900L)).toDF("id", "k", "t")
    val r = Seq((1L, 200L, "a"), (1L, 240L, "b")).toDF("k", "rt", "v")
    val m = AsOfJoin.leftAsOf(l, r, Seq("k"), "t", "rt", Seq("v"),
        suffix = "_m", toleranceSec = Some(100L))
      .select($"id", $"v_m").as[(Long, Option[String])].collect().toMap
    assert(m(1L).contains("b")) // 250-240=10s within tolerance
    assert(m(2L).isEmpty)       // 900-240=660s outside tolerance
    val mN = AsOfJoin.leftAsOfNearest(l, r, Seq("k"), "t", "rt", Seq("v"),
        suffix = "_m")
      .select($"id", $"v_m").as[(Long, Option[String])].collect().toMap
    assert(mN(1L).contains("b") && mN(2L).contains("b"))
  }

  test("null join keys never match: right null-key rows are dropped") {
    val l = Seq(
      (1L, Option(1L), ts(300)),
      (2L, Option.empty[Long], ts(300)), // null key — must carry null match
    ).toDF("id", "k", "t")
    val r = Seq(
      (Option(1L), ts(200), "real"),
      (Option.empty[Long], ts(100), "phantom"), // must match NOTHING
    ).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOf(l, r, Seq("k"), "t", "t", Seq("v"))
      .select(col("id"), col("v_right")).as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).contains("real"))
    assert(out(2L).isEmpty, "null key matched a null-key right row")
  }

  test("temporal store compaction: identical enrichment, fewer files, idempotent appends") {
    val store = java.nio.file.Files.createTempDirectory("graft_tstore_compact")
      .toString + "/prices"
    val keys = Seq("k")
    // two daily appends, deliberately many small files
    val day1 = Seq((1L, ts(100), "a"), (1L, ts(200), "b"), (2L, ts(150), "x"))
      .toDF("k", "t", "v").repartition(4)
    val day2 = Seq((1L, ts(300), "c"), (2L, ts(250), "y"))
      .toDF("k", "t", "v").repartition(4)
    assert(AsOfJoin.appendToTemporalStore(day1, keys, "t", Seq("v"), store) == 3L)
    assert(AsOfJoin.appendToTemporalStore(day2, keys, "t", Seq("v"), store) == 2L)
    def dataFiles() = new java.io.File(store).listFiles
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = dataFiles()
    assert(before >= 4, s"fixture should start fragmented, had $before files")
    val probe = Seq((10L, 1L, ts(250)), (11L, 2L, ts(260)), (12L, 3L, ts(100)))
      .toDF("id", "k", "t")
    def enrich() = AsOfJoin.enrichFromTemporalStore(probe, store, keys, "t", "t", Seq("v"))
      .select(col("id"), col("v_right")).as[(Long, Option[String])]
      .collect().toMap
    val pre = enrich()
    val n = AsOfJoin.compactTemporalStore(spark, store, keys, "t", targetFiles = 1)
    assert(n == 5L)
    assert(dataFiles() < before, s"compaction must shrink the file count")
    assert(enrich() == pre)
    assert(pre == Map(10L -> Some("b"), 11L -> Some("y"), 12L -> None))
    // a replayed day still appends nothing against the compacted store
    assert(AsOfJoin.appendToTemporalStore(day2, keys, "t", Seq("v"), store) == 0L)
    // and compaction is idempotent
    assert(AsOfJoin.compactTemporalStore(spark, store, keys, "t", 1) == 5L)
    assert(enrich() == pre)
  }

  test("nearest: min |distance|, backward ties, tolerance, one exchange") {
    val l = Seq(
      (1L, 1L, ts(250)), // b@240 d10 vs c@260 d10 — tie -> backward b
      (2L, 1L, ts(255)), // b d15 vs c d5 -> c
      (3L, 1L, ts(100)), // nothing before -> a@200 forward
      (4L, 1L, ts(900)), // nothing after -> c@260 backward
      (5L, 2L, ts(500)), // no right rows -> null
    ).toDF("id", "k", "t")
    val r = Seq(
      (1L, ts(200), "a"), (1L, ts(240), "b"), (1L, ts(260), "c"),
    ).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOfNearest(l, r, Seq("k"), "t", "t", Seq("v"))
      .select(col("id"), col("v_right")).as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(1L -> Some("b"), 2L -> Some("c"), 3L -> Some("a"),
      4L -> Some("c"), 5L -> None))
    // tolerance bounds the distance symmetrically
    val tol = AsOfJoin.leftAsOfNearest(l, r, Seq("k"), "t", "t", Seq("v"),
        toleranceSec = Some(50L))
      .select(col("id"), col("v_right")).as[(Long, Option[String])]
      .collect().toMap
    assert(tol == Map(1L -> Some("b"), 2L -> Some("c"), 3L -> None,
      4L -> None, 5L -> None))
    // plan: ONE keyed exchange feeding both window sorts
    val plan = AsOfJoin.leftAsOfNearest(l, r, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }
}
