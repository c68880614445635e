package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Long, String)], windowSec: Long = 100L) = {
    val df = rows.map { case (u, t, e) => (u, ts(t), e) }.toDF("u", "t", "e")
    import org.apache.spark.sql.functions.col
    Funnel.windowFunnel(df, "u", "t",
        Seq(col("e") === "A", col("e") === "B", col("e") === "C"), windowSec)
      .as[(Long, Int)].collect().toMap
  }

  test("levels: full chain, window cut, restart, no-step-1, tie, boundary") {
    val m = run(Seq(
      (1L, 0L, "A"), (1L, 50L, "B"), (1L, 99L, "C"),     // 3 within 100
      (2L, 0L, "A"), (2L, 50L, "B"), (2L, 150L, "C"),    // C outside → 2
      (3L, 0L, "A"), (3L, 100L, "A"),                    // restart: latest A
      (3L, 150L, "B"), (3L, 199L, "C"),                  //   chains off A@100 → 3
      (4L, 10L, "B"), (4L, 20L, "C"),                    // no step 1 → absent
      (5L, 0L, "C"), (5L, 10L, "B"), (5L, 20L, "A"),     // only A counts → 1
      (6L, 5L, "A"), (6L, 5L, "B"),                      // tie extends → 2
      (7L, 0L, "A"), (7L, 100L, "B"),                    // window inclusive → 2
    ))
    assert(m == Map(1L -> 3, 2L -> 2, 3L -> 3, 5L -> 1, 6L -> 2, 7L -> 2))
  }

  test("latest-start DP is complete: early dead-end must not mask a later chain") {
    // A@0,B@10 dead-ends (C too late for window of A@0 via B@10? no —
    // the trap is subtler: B@10 sets level 2 with start 0; B@120 would
    // re-set level 2 only if A@x with x >= 20 exists). Chain must come
    // from A@100,B@120,C@190, not be blocked by the stale start 0.
    val m = run(Seq(
      (1L, 0L, "A"), (1L, 10L, "B"),
      (1L, 100L, "A"), (1L, 120L, "B"), (1L, 190L, "C"),
    ))
    assert(m == Map(1L -> 3))
  }

  test("plan: step predicates filter before the single keyed exchange") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, ts(0), "A"), (1L, ts(1), "X")).toDF("u", "t", "e")
    val out = Funnel.windowFunnel(df, "u", "t",
      Seq(col("e") === "A", col("e") === "B"), 60L)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one keyed exchange:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"), plan)
  }
}
