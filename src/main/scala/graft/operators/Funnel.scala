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
    * @param strictOrder ClickHouse `strict_order`: once a step-1 event
    *   has been seen, the first event matching NO step stops processing;
    *   an event matching step j whose level j-1 is not yet reached also
    *   stops. Requires ALL events on the per-user shuffle (the
    *   non-matching ones are semantic), so the pre-shuffle step filter is
    *   disabled — the one mode that pays full event volume.
    * @param strictDedup ClickHouse `strict_deduplication`: an event
    *   repeating a step the chain already satisfied stops processing.
    * @param strictIncrease ClickHouse `strict_increase`: a chain may only
    *   extend with a STRICTLY greater timestamp than the previous level's
    *   last event (simultaneous events cannot stack).
    * @return one row per `userCol` value with `funnel_level` in
    *   [1, steps.size] (users matching no step don't appear)
    *
    * Strict-mode contract (documented, oracle-pinned): events fold in
    * (ts, step) order, a violation FREEZES the scan, and the result is
    * the deepest contiguous level reached at the freeze — ClickHouse's
    * windowFunnel scan semantics. Unlike the default mode (equivalent to
    * the declarative "exists a chain" reading, which the q_funnel oracle
    * checks via EXISTS joins), the strict modes are inherently
    * scan-order-defined; their oracles replay the same scan as a
    * recursive CTE. */
  def windowFunnel(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column], windowSec: Long,
      strictOrder: Boolean = false, strictDedup: Boolean = false,
      strictIncrease: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "Funnel: at least one step")
    val winUs = windowSec * 1000000L
    val n = steps.size

    // one row per (event, matched step); except under strict_order the
    // filter keeps the shuffle to matched rows only. strict_order keeps
    // unmatched events as step -1 (they break chains, so they must ride).
    val stepArr = array(steps.zipWithIndex.map { case (c, i) =>
      when(c, lit(i)).otherwise(lit(-1))
    }: _*)
    val withSteps = df.withColumn("__graft_steps", filter(stepArr, s => s >= 0))
    val exploded =
      if (strictOrder) withSteps
        .select(col(userCol), unix_micros(col(tsCol)).as("__graft_ts"),
          explode(when(size(col("__graft_steps")) === 0, array(lit(-1)))
            .otherwise(col("__graft_steps"))).as("__graft_step"))
      else withSteps
        .filter(size(col("__graft_steps")) > 0)
        .select(col(userCol), unix_micros(col(tsCol)).as("__graft_ts"),
          explode(col("__graft_steps")).as("__graft_step"))

    // tie order (__ts, __step): at one timestamp the earlier step folds
    // first, so a later step at the same instant may extend it (and a
    // strict_order break at -1 lands before any same-instant step)
    val sorted = sort_array(collect_list(struct(col("__graft_ts"), col("__graft_step"))))
    val folded =
      if (strictOrder || strictDedup || strictIncrease)
        strictLevel(col("__graft_events"), n, winUs,
          strictOrder, strictDedup, strictIncrease)
      else
        size(filter(fold(col("__graft_events"), n, winUs), v => v >= 0L))
    exploded.groupBy(col(userCol))
      .agg(sorted.as("__graft_events"))
      .select(col(userCol), folded.as("funnel_level"))
      .filter(col("funnel_level") > 0)
  }

  /** Conversion summary over [[windowFunnel]]'s output: one row per step
    * with how many users reached AT LEAST that level — the funnel chart
    * itself. The explode is bounded by steps × users-at-level-1; the
    * final aggregation is O(steps) rows. */
  def conversion(levels: DataFrame): DataFrame =
    levels
      .select(explode(sequence(lit(1L), col("funnel_level").cast("long")))
        .as("level"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_users"))

  /** Strict-mode scan over the sorted (ts, step) list, all in one
    * Catalyst `aggregate` so it stays codegen'd per group. State is an
    * array<long> of 2n+2 slots (1-based positions):
    *
    *   1..n     chain start (window anchor) per level, -1 unset
    *   n+1..2n  last event time per level (strict_increase needs it)
    *   2n+1     frozen flag — a strict violation sets it; nothing
    *            updates afterwards
    *   2n+2     first_event flag (a step-1 event has been folded —
    *            strict_order's break only arms after it)
    *
    * The final level is the contiguous prefix of set starts (set levels
    * always form a prefix: extensions need the previous level set, and a
    * freeze stops all updates). */
  private def strictLevel(events: Column, n: Int, winUs: Long,
      strictOrder: Boolean, strictDedup: Boolean,
      strictIncrease: Boolean): Column = {
    val init = concat(array_repeat(lit(-1L), 2 * n), array(lit(0L), lit(0L)))
    val folded = aggregate(events, init, (acc, x) => {
      val t = x.getField("__graft_ts")
      val s = x.getField("__graft_step")
      val frozen = element_at(acc, 2 * n + 1) === 1L
      val firstEv = element_at(acc, 2 * n + 2) === 1L
      // violations (checked against PRE-update state; && short-circuits,
      // so element_at(acc, s [+1]) only evaluates where s keeps it >= 1)
      val dupHit =
        if (strictDedup) s >= 0 && element_at(acc, s + 1) >= 0L else lit(false)
      val orderBreak = if (strictOrder) s === -1 && firstEv else lit(false)
      val orderGap =
        if (strictOrder) s >= 1 && element_at(acc, s) < 0L else lit(false)
      val freezeNow = dupHit || orderBreak || orderGap
      val canExtend = s >= 1 && element_at(acc, s) >= 0L &&
        t - element_at(acc, s) <= winUs &&
        (if (strictIncrease) element_at(acc, s + n) < t else lit(true))
      transform(acc, (v, i) => {
        val pos = i + 1 // 1-based slot
        when(frozen, v).otherwise(
          when(freezeNow, when(pos === 2 * n + 1, lit(1L)).otherwise(v))
            .otherwise(
              when(s === 0,
                when(pos === 1, t)
                  .when(pos === n + 1, t)
                  .when(pos === 2 * n + 2, lit(1L))
                  .otherwise(v))
                .otherwise(
                  when(canExtend,
                    when(pos === s + 1, element_at(acc, s))
                      .when(pos === s + (n + 1), t)
                      .otherwise(v))
                    .otherwise(v))))
      })
    })
    size(filter(slice(folded, 1, n), v => v >= 0L))
  }

  /** Sequential DP over the sorted (ts, step) list. `acc` inside the
    * lambda is the PRE-update array, read with 1-based element_at: at
    * slot i (0-based, == step s), `element_at(acc, i)` is the level-s
    * start, i.e. the previous level's. Step 0 restarts the window at t. */
  private def fold(events: Column, n: Int, winUs: Long): Column =
    aggregate(events, array_repeat(lit(-1L), n), (acc, x) => {
      val t = x.getField("__graft_ts")
      val s = x.getField("__graft_step")
      transform(acc, (v, i) =>
        when(i =!= s, v).otherwise(
          when(s === 0, greatest(v, t)).otherwise(
            when(element_at(acc, i) >= 0L && t - element_at(acc, i) <= winUs,
              greatest(v, element_at(acc, i))).otherwise(v))))
    })

  // ---- sequenceMatch / sequenceCount (ClickHouse parity) -----------------

  /** ClickHouse `sequenceCount('(?1).*(?2).*…')`: the number of
    * NON-OVERLAPPING left-to-right completions of the step chain in a
    * user's time-ordered events — no window bound, any events may sit
    * between steps. Greedy earliest-completion is optimal for maximal
    * non-overlapping chains (interval scheduling), so the whole scan is
    * a 2-slot [pointer, count] fold — same shuffle shape as
    * [[windowFunnel]] (matched events only ride the exchange; one keyed
    * agg). Ties and multi-step events follow the funnel contract: (ts,
    * step) fold order, an event matching several steps contributes one
    * list element per step.
    *
    * @return (userCol, n_matches) for every user with ≥1 matched event */
  def sequenceCount(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "sequenceCount: at least one step")
    val n = steps.size
    val stepArr = array(steps.zipWithIndex.map { case (c, i) =>
      when(c, lit(i)).otherwise(lit(-1))
    }: _*)
    val matched = df
      .withColumn("__graft_steps", filter(stepArr, s => s >= 0))
      .filter(size(col("__graft_steps")) > 0)
      .select(col(userCol), unix_micros(col(tsCol)).as("__graft_ts"),
        explode(col("__graft_steps")).as("__graft_step"))
    val sorted = sort_array(collect_list(struct(col("__graft_ts"), col("__graft_step"))))
    val folded = aggregate(sorted, array(lit(0L), lit(0L)), (acc, x) => {
      val s = x.getField("__graft_step").cast("long")
      val ptr = element_at(acc, 1)
      val np = when(s === ptr, ptr + 1L).otherwise(ptr)
      array(when(np === n, 0L).otherwise(np),
        when(np === n, element_at(acc, 2) + 1L).otherwise(element_at(acc, 2)))
    })
    matched.groupBy(col(userCol))
      .agg(element_at(folded, 2).as("n_matches"))
  }

  /** ClickHouse `sequenceMatch('(?1).*(?2).*…')`: does the chain occur
    * at least once (time-ordered, anything between steps, no window)?
    * Defined as `sequenceCount >= 1` — greedy existence equals the
    * declarative "exists events e1 ≤ e2 ≤ … matching the steps in
    * order", which is what the gate's independent EXISTS oracle checks.
    * @return (userCol, matched) for every user with ≥1 matched event */
  def sequenceMatch(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame =
    sequenceCount(df, userCol, tsCol, steps)
      .select(col(userCol), (col("n_matches") >= 1L).as("matched"))

  // ---- streaming form ----------------------------------------------------

  /** Keyed DP state: `dp` is the same latest-start-per-level array the
    * batch fold uses and `lasts` the per-level last event times
    * (strict_increase reads them); `frozen`/`first` mirror the batch
    * strict scan's flags; `buf` holds events still inside the lateness
    * bound (they fold only once the watermark passes them, in (ts, step)
    * order — out-of-order arrival within the bound cannot corrupt the
    * DP); `emitted` is the deepest level already reported.
    *
    * STATE-SCHEMA COMPATIBILITY: adding the strict-mode fields widened
    * this encoder from (dp, buf, emitted) — a checkpoint written by the
    * pre-strict release does NOT restore into it. Restarting an existing
    * streaming funnel across that upgrade needs a fresh checkpoint
    * directory (levels re-derive from the replayed source); plan the
    * cutover like any Spark state-schema change. Future fields should
    * extend a new versioned wrapper rather than widen this class again. */
  final case class FunnelState(dp: Seq[Long], lasts: Seq[Long],
    frozen: Boolean, first: Boolean, buf: Seq[(Long, Int)], emitted: Int)
  final case class FunnelEmit(user: String, funnel_level: Int)

  /** Streaming windowFunnel: per-user funnel levels over an unbounded
    * stream via flatMapGroupsWithState. Emits one Append-mode row each
    * time a user's CONFIRMED level deepens (levels are monotone, so each
    * level is reported at most once). Confirmed = derived only from
    * events at-or-before the watermark; `latenessSec` is the reorder
    * bound, exactly the batch semantics once the stream drains.
    *
    * Watermark note: Catalyst pushes the step filter BELOW the watermark
    * collector (that pushdown is what keeps unmatched traffic off the
    * shuffle), so event time advances with MATCHED events — if the funnel
    * steps go quiet, buffered near-complete chains wait for the next
    * matched event, like any event-time stream waits for data.
    *
    * State per user: n longs + the within-lateness buffer — bounded by
    * the lateness window's matched events, not history. That bound is
    * what lets the funnel run forever on a cluster. */
  def streamingWindowFunnel(df: DataFrame, userCol: String, tsCol: String,
      steps: Seq[Column], windowSec: Long, latenessSec: Long,
      strictOrder: Boolean = false, strictDedup: Boolean = false,
      strictIncrease: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "Funnel: at least one step")
    val spark = df.sparkSession
    import spark.implicits._
    val n = steps.size
    val winUs = windowSec * 1000000L

    val stepArr = array(steps.zipWithIndex.map { case (c, i) =>
      when(c, lit(i)).otherwise(lit(-1))
    }: _*)
    // strict_order carries non-matching events as step -1 (they break
    // chains, so they're semantic) — the one mode whose shuffle pays
    // full event volume; its watermark also advances with every event
    val withSteps = df
      .withWatermark(tsCol, s"$latenessSec seconds")
      .withColumn("__graft_steps", filter(stepArr, s => s >= 0))
    val matched = (if (strictOrder) withSteps
        // no cast on the ts column — it would strip the watermark tag
        .select(col(tsCol).as("__graft_t"),
          col(userCol).cast("string").as("__graft_u"),
          explode(when(size(col("__graft_steps")) === 0, array(lit(-1)))
            .otherwise(col("__graft_steps"))).as("__graft_step"))
      else withSteps
        .filter(size(col("__graft_steps")) > 0)
        .select(col(tsCol).as("__graft_t"),
          col(userCol).cast("string").as("__graft_u"),
          explode(col("__graft_steps")).as("__graft_step")))
      .as[(java.sql.Timestamp, String, Int)]

    matched.groupByKey(_._2)
      .flatMapGroupsWithState[FunnelState, FunnelEmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (key, events, state) =>
        val st = state.getOption.getOrElse(FunnelState(
          Seq.fill(n)(-1L), Seq.fill(n)(-1L), false, false, Nil, 0))
        val micros = events.map { case (ts, _, s) =>
          (ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L, s)
        }.toSeq
        val wmMs = state.getCurrentWatermarkMs()
        val wmUs = wmMs * 1000L
        val all = st.buf ++ micros
        // events at-or-before the watermark are final-ordered: fold them
        // by (ts, step); the rest wait for the next watermark advance
        val (ready, wait) = all.partition { case (t, _) => wmMs > 0 && t <= wmUs }
        // same scan as the batch strictLevel fold (with all modes off it
        // degenerates to the default DP: events arrive time-ascending, so
        // overwrite == keep-latest-start)
        val starts = st.dp.toArray
        val lasts = st.lasts.toArray
        var frozen = st.frozen
        var first = st.first
        ready.sorted.foreach { case (t, s) =>
          if (!frozen) {
            val dup = strictDedup && s >= 0 && starts(s) >= 0L
            val ob = strictOrder && s == -1 && first
            val og = strictOrder && s >= 1 && starts(s - 1) < 0L
            if (dup || ob || og) frozen = true
            else if (s == 0) { starts(0) = t; lasts(0) = t; first = true }
            else if (s >= 1 && starts(s - 1) >= 0L && t - starts(s - 1) <= winUs &&
                     (!strictIncrease || lasts(s - 1) < t)) {
              starts(s) = starts(s - 1); lasts(s) = t
            }
          }
        }
        val level = starts.takeWhile(_ >= 0L).length
        val out = if (level > st.emitted) Iterator.single(FunnelEmit(key, level))
                  else Iterator.empty
        state.update(FunnelState(starts.toSeq, lasts.toSeq, frozen, first,
          wait, math.max(level, st.emitted)))
        // a group with buffered events must be re-invoked once the
        // watermark passes the earliest of them, even with no new data —
        // that is exactly what the event-time timeout provides
        if (wait.nonEmpty)
          state.setTimeoutTimestamp(math.max(wait.map(_._1).min / 1000L, wmMs + 1L))
        out
      }.toDF()
  }
}
