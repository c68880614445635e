package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB path for the per-user analytics family: when the events
  * table is STORED bucketed by the analysis key (`bucketBy(user_id)` at
  * ingest — one shuffle paid once, at write time), every downstream
  * per-user operator reads pre-clustered data and plans with ZERO
  * exchanges — sessionization, funnels, retention, session sequences all
  * become embarrassingly parallel scans. This spec pins that the bucketed
  * scan's partitioning actually satisfies each operator's distribution
  * requirement; a Spark upgrade or operator change that silently
  * reintroduces the shuffle turns a scan-speed job into a full-corpus
  * exchange at scale.
  */
class BucketedAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed")
    val name = "events_bucketed"
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.bucketBy(8, "user_id").sortBy("user_id", "ts")
      .option("path", s"$wh/$name").mode("overwrite").saveAsTable(name)
    name
  }

  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).size

  test("sessionize assign and summarize are exchange-free on bucketed events") {
    val ev = spark.table(table)
    val assign = Sessionize.assign(ev, "user_id", "ts", 1800L)
    assert(exchanges(assign.queryExecution.executedPlan.toString) == 0,
      assign.queryExecution.executedPlan.toString)
    val summ = Sessionize.summarize(ev, "user_id", "ts", 1800L)
    assert(exchanges(summ.queryExecution.executedPlan.toString) == 0,
      summ.queryExecution.executedPlan.toString)
  }

  test("funnel and retention per-user aggs are exchange-free on bucketed events") {
    val ev = spark.table(table)
    val fun = Funnel.windowFunnel(ev, "user_id", "ts",
      Seq(col("event_type") === "view", col("event_type") === "click"), 3600L)
    assert(exchanges(fun.queryExecution.executedPlan.toString) == 0,
      fun.queryExecution.executedPlan.toString)
    // retention's FIRST agg (per-user) rides the buckets; the tiny matrix
    // agg that follows may exchange its per-cohort rows — that side is
    // O(cohorts × offsets), not the corpus
    val ret = Retention.cohorts(ev, "user_id", "ts",
      col("event_type") === "signup", 604800L, 8)
    val plan = ret.queryExecution.executedPlan.toString
    assert(exchanges(plan) <= 1, plan)
  }

  test("bucketed results equal unbucketed results (sessionize summarize)") {
    val ev = spark.table(table)
    val plain = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val a = Sessionize.summarize(ev, "user_id", "ts", 1800L)
    val b = Sessionize.summarize(plain, "user_id", "ts", 1800L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("as-of join on bucketed sides: the union defeats bucketing — pinned at one exchange") {
    // Finding (deliberate, documented): leftAsOf plans left ∪ right →
    // window(user). Even with BOTH sides read from the same bucketed
    // table, Union's output partitioning is unknown to Catalyst (it
    // concatenates children's partitions; it cannot claim hash(user)
    // even when every child has it), so the window re-shuffles. The
    // operator therefore pays exactly ONE keyed exchange on bucketed
    // input — same as unbucketed, already its contract — and bucketing
    // buys as-of joins nothing until Spark learns union-preserved
    // distributions. Pinned so an upgrade that fixes OR worsens this
    // surfaces here.
    val ev = spark.table(table)
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val j = AsOfJoin.leftAsOf(
      ev.select(col("event_id"), col("user_id"), col("ts")), right,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      valueCols = Seq("value"))
    val plan = j.queryExecution.executedPlan.toString
    assert(exchanges(plan) == 1, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }
}
