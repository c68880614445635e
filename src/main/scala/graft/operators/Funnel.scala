package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: for each user, the deepest step k of an ordered step
  * list [s1..sn] such that matching events e1 ≤ e2 ≤ … ≤ ek exist (by
  * event time, ties non-strict) with `ts(ek) - ts(e1) <= windowSec` — the
  * `windowFunnel` the reference's users run downstream in ClickHouse,
  * computed here as one aggregation.
  *
  * Algorithm: per user, fold the time-sorted matched events through a DP
  * keeping, for every level j, the LATEST possible window start of any
  * chain of length j seen so far. An event at time t matching step j+1
  * extends a chain iff `t - start[j] <= window`; keeping the latest start
  * per level is complete (any feasible chain's start is ≤ the kept one,
  * and a later start only widens the window for deeper steps). The
  * funnel level is the longest set prefix of the start array.
  *
  * Scale shape: non-matching events are FILTERED BEFORE the shuffle (the
  * step predicates push toward the scan), so the one hash exchange
  * carries only funnel-relevant rows — at 100 TB of events with three
  * step predicates that is usually a small fraction. Per-user state is
  * the matched-event list (collect_list partial-aggregates map-side);
  * memory is bounded by matched events per user, the same contract as
  * ClickHouse's windowFunnel.
  */
object Funnel {

  /** @param steps ordered step predicates (e.g.
    *   `Seq($"event_type" === "view", $"event_type" === "click")`); an
    *   event matching several steps contributes to each
    * @return one row per `userCol` value with `funnel_level` in
    *   [1, steps.size] (users matching no step don't appear) */
  def windowFunnel(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column], windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "Funnel: at least one step")
    val winUs = windowSec * 1000000L

    // one row per (event, matched step); the filter keeps the shuffle to
    // matched rows only
    val stepArr = array(steps.zipWithIndex.map { case (c, i) =>
      when(c, lit(i)).otherwise(lit(-1))
    }: _*)
    val matched = df
      .withColumn("__steps", filter(stepArr, s => s >= 0))
      .filter(size(col("__steps")) > 0)
      .select(col(userCol), unix_micros(col(tsCol)).as("__ts"),
        explode(col("__steps")).as("__step"))

    // tie order (__ts, __step): at one timestamp the earlier step folds
    // first, so a later step at the same instant may extend it
    val sorted = sort_array(collect_list(struct(col("__ts"), col("__step"))))
    matched.groupBy(col(userCol))
      .agg(sorted.as("__events"))
      .select(col(userCol),
        size(filter(fold(col("__events"), steps.size, winUs), v => v >= 0L))
          .as("funnel_level"))
      .filter(col("funnel_level") > 0)
  }

  /** Sequential DP over the sorted (ts, step) list. `acc` inside the
    * lambda is the PRE-update array, read with 1-based element_at: at
    * slot i (0-based, == step s), `element_at(acc, i)` is the level-s
    * start, i.e. the previous level's. Step 0 restarts the window at t. */
  private def fold(events: Column, n: Int, winUs: Long): Column =
    aggregate(events, array_repeat(lit(-1L), n), (acc, x) => {
      val t = x.getField("__ts")
      val s = x.getField("__step")
      transform(acc, (v, i) =>
        when(i =!= s, v).otherwise(
          when(s === 0, greatest(v, t)).otherwise(
            when(element_at(acc, i) >= 0L && t - element_at(acc, i) <= winUs,
              greatest(v, element_at(acc, i))).otherwise(v))))
    })
}
