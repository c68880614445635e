package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("cohort matrix: anchor at first signup, distinct periods, offset bounds") {
    // period = 100 s. u1 signs up in period 0, active 0/1/3 (twice in 1 —
    // counted once); u2 signs up in period 1, active 1 only; u3 never
    // signs up → absent; u4 activity BEFORE its signup → negative offset
    // dropped, signup period kept
    val df = Seq(
      (1L, 10L, "signup"), (1L, 150L, "view"), (1L, 160L, "view"),
      (1L, 310L, "view"),
      (2L, 110L, "signup"),
      (3L, 50L, "view"),
      (4L, 20L, "view"), (4L, 250L, "signup"),
    ).map { case (u, t, e) => (u, ts(t), e) }.toDF("u", "t", "e")
    val m = Retention.cohorts(df, "u", "t", col("e") === "signup",
        periodSec = 100L, maxOffset = 10)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(m == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, // u1
      (1L, 0L) -> 1L,                                 // u2
      (2L, 0L) -> 1L))                                // u4 (pre-signup view dropped)
  }

  test("streaming cohort events equal the batch matrix, pre-anchor activity included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDF.toDF("u", "sec", "e")
      .select($"u", org.apache.spark.sql.functions.timestamp_seconds($"sec").as("t"), $"e")
    val out = Retention.streamingCohortEvents(src, "u", "t",
      col("e") === "signup", periodSec = 100L, maxOffset = 10, latenessSec = 50L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ret_stream").start()
    val fixture = Seq(
      (1L, 10010L, "view"),   // same period as the signup, EARLIER ts
      (1L, 10020L, "signup"),
      (1L, 10150L, "view"),   // offset 1
      (1L, 10160L, "view"),   // offset 1 again — no second emission
      (2L, 10350L, "signup"),
    )
    try {
      fixture.foreach { r => mem.addData(r); q.processAllAvailable() }
      mem.addData((2L, 11000L, "view")); q.processAllAvailable() // offset 6 + wm push
      mem.addData((2L, 12000L, "view")); q.processAllAvailable() // confirm 11000
      val got = spark.table("ret_stream")
        .as[(String, Long, Long)].collect()
        .map { case (u, c, o) => (u.toLong, c, o) }.toSet
      // batch equivalent over the confirmed events (all but the last
      // watermark-pusher, which is still inside the lateness bound)
      val confirmed = (fixture :+ ((2L, 11000L, "view")))
        .map { case (u, s, e) => (u, new java.sql.Timestamp(s * 1000L), e) }
        .toDF("u", "t", "e")
      val matrix = Retention.cohorts(confirmed, "u", "t",
          col("e") === "signup", 100L, 10)
        .as[(Long, Long, Long)].collect().toSet
      // per-user events roll up to the same matrix
      val rolled = got.groupBy { case (_, c, o) => (c, o) }
        .map { case ((c, o), users) => (c, o, users.size.toLong) }.toSet
      assert(rolled == matrix, s"rolled $rolled matrix $matrix")
    } finally q.stop()
  }

  test("plan: three keyed exchanges, no set aggregation, no join") {
    val df = Seq((1L, ts(10), "signup")).toDF("u", "t", "e")
    val out = Retention.cohorts(df, "u", "t", col("e") === "signup", 100L, 5)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // (user, period) reduce → cohort window over user → matrix agg; only
    // the first carries raw-event volume, and nothing buffers an
    // unbounded in-memory set — a user's period history rides in rows
    // through the window's spillable sort
    assert(exchanges == 3, s"expected exactly three keyed exchanges:\n$plan")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("collect_set"),
      s"per-user period state must not be an in-memory set:\n$plan")
  }

  test("history far beyond maxOffset stays correct and set-free") {
    // one user active in 500 distinct periods (span 100× maxOffset):
    // the matrix must stop at maxOffset and the plan must carry the
    // period history as rows, never as a collected set
    val rows = (0L until 500L).map(p => (1L, ts(p * 100L + 5L),
      if (p == 3L) "signup" else "view"))
    val df = rows.toDF("u", "t", "e")
    val out = Retention.cohorts(df, "u", "t", col("e") === "signup", 100L, 5)
    assert(!out.queryExecution.executedPlan.toString.contains("collect_set"))
    val m = out.as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(m == (0L to 5L).map(o => (3L, o) -> 1L).toMap)
  }

  test("retentionFlags: ClickHouse retention() semantics, unordered") {
    val df = Seq(
      (1L, 10L, "signup"), (1L, 20L, "view"),                 // r = 1,1,0
      (2L, 10L, "view"), (2L, 20L, "signup"),                 // unordered: 1,1,0
      (3L, 10L, "view"), (3L, 20L, "purchase"),               // no anchor: 0,0,0
      (4L, 10L, "signup"), (4L, 20L, "purchase"),             // 1,0,1
    ).map { case (u, t, e) => (u, ts(t), e) }.toDF("u", "t", "e")
    val m = Retention.retentionFlags(df, "u",
        Seq(col("e") === "signup", col("e") === "view", col("e") === "purchase"))
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m == Map(1L -> ((1, 1, 0)), 2L -> ((1, 1, 0)),
      3L -> ((0, 0, 0)), 4L -> ((1, 0, 1))))
  }
}
