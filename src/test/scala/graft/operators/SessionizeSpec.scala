package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // gap = 60 s. Key 1: boundary cases (59 s gap merges, exactly 60 s
  // splits); key 2: a lone event.
  private lazy val events = Seq(
    (1L, ts(0)), (1L, ts(59)),        // session 1 (gap 59 < 60)
    (1L, ts(118)),                    // still session 1 (59 after prev)
    (1L, ts(178)),                    // exactly 60 after prev → session 2
    (1L, ts(1000)),                   // session 3
    (2L, ts(42)),                     // session 1 of key 2
  ).toDF("k", "t")

  test("assign: gap >= timeout starts a new session; exact boundary splits") {
    val m = Sessionize.assign(events, "k", "t", gapSec = 60L)
      .select($"k", (unix_micros($"t") / 1000000L).cast("long"), $"session_seq")
      .as[(Long, Long, Long)].collect()
      .map { case (k, s, sid) => (k, s) -> sid }.toMap
    assert(m((1L, 0L)) == 1L && m((1L, 59L)) == 1L && m((1L, 118L)) == 1L)
    assert(m((1L, 178L)) == 2L)
    assert(m((1L, 1000L)) == 3L)
    assert(m((2L, 42L)) == 1L)
  }

  test("summarize via session_window partitions events identically to assign") {
    // Independent derivations of the same partition: per-session
    // (first, last, count) sets must match exactly — including on the
    // events table's real data.
    val ev = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").as("k"), col("ts").as("t"))
      .unionByName(events)
    val fromAssign = Sessionize.assign(ev, "k", "t", 1800L)
      .groupBy($"k", $"session_seq")
      .agg(min($"t").as("session_start"), max($"t").as("session_last"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
    val fromWindow = Sessionize.summarize(ev, "k", "t", 1800L)
    assert(fromAssign.exceptAll(fromWindow).isEmpty && fromWindow.exceptAll(fromAssign).isEmpty)
  }

  test("summarize streams: a session emits once the watermark passes its close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF.toDF("k", "t").withWatermark("t", "0 seconds")
    val agg = Sessionize.summarize(df, "k", "t", gapSec = 60L)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_append").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(30)))
      q.processAllAvailable()
      // session [0, 30+60) still open — nothing emitted
      assert(spark.table("sess_append").count() == 0)
      // events far past the close advance the watermark over two batches
      mem.addData((1L, ts(500)))
      q.processAllAvailable()
      mem.addData((1L, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("sess_append").collect()
      val closed = rows.find(r => r.getLong(r.fieldIndex("k")) == 1L &&
        r.getLong(r.fieldIndex("n_events")) == 2L)
      assert(closed.isDefined, rows.mkString("; "))
      assert(closed.get.getTimestamp(closed.get.fieldIndex("session_last")).getTime == 30000L)
    } finally q.stop()
  }

  test("streamingAssign heals out-of-order arrival to the batch ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val T = 20000L
    val mem = MemoryStream[(Long, Timestamp)]
    val out = Sessionize.streamingAssign(
      mem.toDF.toDF("k", "t"), "k", "t", gapSec = 60L, latenessSec = 300L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sa_stream").start()
    try {
      // arrival order scrambles two sessions; lateness 300 covers it
      mem.addData((1L, ts(T + 200)), (1L, ts(T)))
      q.processAllAvailable()
      mem.addData((1L, ts(T + 30)), (1L, ts(T + 230)))
      q.processAllAvailable()
      mem.addData((1L, ts(T + 9000))) // advance watermark far past both
      q.processAllAvailable()
      mem.addData((1L, ts(T + 9001)))
      q.processAllAvailable()
      // output comes back under the CONFIGURED names with the key's
      // input type — the operator-level schema-parity contract
      assert(spark.table("sa_stream").columns.toSeq == Seq("k", "t", "session_seq"))
      assert(spark.table("sa_stream").schema("k").dataType ==
        org.apache.spark.sql.types.LongType)
      val got = spark.table("sa_stream")
        .select((unix_micros($"t") / 1000000L).cast("long"), $"session_seq")
        .as[(Long, Long)].collect().toMap
      val want = Sessionize.assign(
          Seq((1L, ts(T)), (1L, ts(T + 30)), (1L, ts(T + 200)), (1L, ts(T + 230)))
            .toDF("k", "t"), "k", "t", 60L)
        .select((unix_micros($"t") / 1000000L).cast("long"), $"session_seq")
        .as[(Long, Long)].collect().toMap
      assert(want.forall { case (t, s) => got.get(t).contains(s) },
        s"got $got want $want")
    } finally q.stop()
  }

  test("plan: summarize pays one exchange, partial aggregation below it") {
    val plan = Sessionize.summarize(events, "k", "t", 60L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one keyed exchange:\n$plan")
  }
}
