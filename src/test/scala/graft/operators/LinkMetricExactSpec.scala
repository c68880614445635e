package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class LinkMetricExactSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(cumulative: Boolean, windowOffset: Int = 0)(
      feed: (MemoryStream[(Timestamp, String)], () => Unit) => Unit): Seq[(Timestamp, String, Long)] = {
    val mem = MemoryStream[(Timestamp, String)](spark)
    val src = mem.toDF().toDF("@timestamp", "event_type")
    val out = LinkMetricExact.streaming(LinkMetricExact.ExactConfig(
      "event_type", 60, reserveWindowSec = 600,
      windowOffset = windowOffset, cumulative = cumulative))(src)
    val name = s"lme_${cumulative}_$windowOffset"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed(mem, () => q.processAllAvailable())
      spark.sql(s"select * from $name")
        .select("@timestamp", "event_type", "count")
        .as[(Timestamp, String, Long)].collect().toSeq
    } finally q.stop()
  }

  test("separate mode: window emits exactly once, after it closes") {
    val rows = run(cumulative = false) { (mem, process) =>
      mem.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:50"), "a"))
      process() // window still open — nothing emitted yet
      mem.addData((ts("2024-01-01 00:30:00"), "b")) // watermark jumps past 00:00+reserve
      process()
      process()
    }
    val aRows = rows.filter(_._2 == "a")
    assert(aRows == Seq((ts("2024-01-01 00:00:00"), "a", 2L)), s"got $rows")
  }

  test("null link-field values keep distinct groups and decode back as null") {
    // the old concat_ws key SKIPPED nulls: (x, null) and (null, x)
    // collapsed into one group and the split-back shifted values into
    // the wrong columns — merged counts under wrong labels (r14 fix)
    val mem = MemoryStream[(Timestamp, Option[String], Option[String])](spark)
    val src = mem.toDF().toDF("@timestamp", "a", "b")
    val out = LinkMetricExact.streaming(LinkMetricExact.ExactConfig(
      "a->b", 60, reserveWindowSec = 600))(src)
    val q = out.writeStream.format("memory").queryName("lme_null")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:00:10"), Some("x"), None),
        (ts("2024-01-01 00:00:20"), None, Some("x")),
        (ts("2024-01-01 00:00:30"), Some("x"), None))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:30:00"), Some("z"), Some("z")))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.sql("select a, b, count from lme_null")
        .as[(Option[String], Option[String], Long)].collect().toSet
      assert(rows.contains((Some("x"), None, 2L)), s"got $rows")
      assert(rows.contains((None, Some("x"), 1L)), s"got $rows")
    } finally q.stop()
  }

  test("windowOffset delays the flush by N whole windows") {
    // offset=3: window 00:00 closes only once watermark >= 00:01 + 3min
    val rows = run(cumulative = false, windowOffset = 3) { (mem, process) =>
      mem.addData((ts("2024-01-01 00:00:10"), "a"))
      process()
      mem.addData((ts("2024-01-01 00:12:00"), "b")) // wm = 00:02 after reserve; not enough
      process()
      mem.addData((ts("2024-01-01 00:15:00"), "b")) // wm = 00:05 ≥ 00:01+3min
      process()
      process()
    }
    assert(rows.filter(_._2 == "a") == Seq((ts("2024-01-01 00:00:00"), "a", 1L)), s"got $rows")
  }

  test("cumulative mode re-emits updated running totals") {
    val rows = run(cumulative = true) { (mem, process) =>
      mem.addData((ts("2024-01-01 00:00:10"), "a"))
      process()
      mem.addData((ts("2024-01-01 00:00:20"), "a"))
      process()
    }
    val counts = rows.filter(_._2 == "a").map(_._3)
    assert(counts == Seq(1L, 2L), s"got $rows") // total re-emitted per change
  }
}
