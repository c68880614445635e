package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: users are anchored to the period of their FIRST
  * event matching `anchor` (e.g. signup week), and each later period
  * they appear in at all increments that cohort's retention counter —
  * the (cohort × offset) matrix every product-analytics stack draws.
  *
  * Shape — every buffer bounded or spillable, no `collect_set`:
  *
  *   1. `groupBy(user, period)` reduces raw events to distinct
  *      (user, period, has_anchor) rows — the ONLY full-volume exchange,
  *      with map-side partial aggregation (shuffle carries one row per
  *      (user × period) per map partition) and an O(1) agg buffer.
  *   2. A window over `user` stamps each period row with the user's
  *      cohort (min anchored period). This exchange carries only the
  *      distinct-period rows — cardinality rides in ROWS, which spill,
  *      not in an in-memory set: a user active hourly for 10 years is
  *      87k 16-byte rows through a spillable sort, where the previous
  *      `collect_set` held them all in one agg buffer.
  *   3. Offsets outside [0, maxOffset] are filtered BEFORE the final
  *      matrix aggregation, so it sees at most maxOffset+1 rows per user
  *      (rows are distinct per (user, period) by construction — a plain
  *      count, no count-distinct shuffle).
  */
object Retention {

  /** @param anchor    predicate choosing the cohort-defining event
    * @param periodSec cohort bucket width (e.g. 604800 = weekly)
    * @param maxOffset largest period offset to report
    * @return (cohort_period, period_offset, n_users); cohort_period is
    *   the anchor period as an epoch-period index */
  def cohorts(df: DataFrame, userCol: String, tsCol: String, anchor: Column,
      periodSec: Long, maxOffset: Int): DataFrame = {
    val pUs = periodSec * 1000000L
    // exact integer period index: epoch micros are < 2^53, so the
    // subtract-mod-divide stays exact in double and casts back clean
    def period(ts: Column): Column = {
      val us = unix_micros(ts)
      ((us - pmod(us, lit(pUs))) / lit(pUs)).cast("long")
    }
    val perPeriod = df
      .groupBy(col(userCol), period(col(tsCol)).as("__graft_period"))
      .agg(max(when(anchor, lit(1)).otherwise(lit(0))).as("__graft_has_anchor"))
    val byUser = Window.partitionBy(col(userCol))
    perPeriod
      .withColumn("__graft_cohort",
        min(when(col("__graft_has_anchor") === 1, col("__graft_period")))
          .over(byUser))
      .filter(col("__graft_cohort").isNotNull)
      .select(col("__graft_cohort").as("cohort_period"),
        (col("__graft_period") - col("__graft_cohort")).as("period_offset"))
      .filter(col("period_offset") >= 0 && col("period_offset") <= maxOffset)
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ClickHouse `retention(cond1, …, condN)`: per user, r1 = 1 iff any
    * event matches cond1 (the anchor), and r_i = 1 iff BOTH cond1 and
    * cond_i matched (any time — CH applies no ordering between the
    * anchor and the later conditions, and neither does this). One keyed
    * aggregation, O(N) agg buffer; the flags come out as flat int
    * columns r1..rN (the downstream ratio r_i/r1 is the retention
    * curve). Users with no matching event at all still appear (all
    * zeros), exactly like CH's per-group aggregate. */
  def retentionFlags(df: DataFrame, userCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retentionFlags: at least one condition")
    val raw = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, lit(1)).otherwise(lit(0))).as(s"__graft_c${i + 1}")
    }
    val flags = col("__graft_c1").as("r1") +: (2 to conds.size).map(i =>
      when(col("__graft_c1") === 1 && col(s"__graft_c$i") === 1, lit(1))
        .otherwise(lit(0)).as(s"r$i"))
    df.groupBy(col(userCol))
      .agg(raw.head, raw.tail: _*)
      .select(col(userCol) +: flags: _*)
  }

  // ---- streaming form ----------------------------------------------------

  /** Keyed state: the user's confirmed anchor period (-1 until their
    * first anchor event passes the watermark — watermark-ordered folding
    * makes the anchor FINAL once set, no earlier event can still
    * arrive), a bitmask of offsets already reported (maxOffset ≤ 63
    * keeps the whole state in two longs), and the within-lateness
    * buffer. */
  final case class RetState(anchor: Long, emitted: Long, buf: Seq[(Long, Boolean)])
  final case class RetEmit(user: String, cohort_period: Long, period_offset: Long)

  /** Streaming cohorts: emits one (user, cohort, offset) row the first
    * time each retention cell is confirmed for a user — append-only
    * events a downstream count aggregates into the live matrix (the
    * rows are per-user distinct by construction, exactly like the batch
    * operator's exploded frame). */
  def streamingCohortEvents(df: DataFrame, userCol: String, tsCol: String,
      anchor: Column, periodSec: Long, maxOffset: Int,
      latenessSec: Long): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(maxOffset >= 0 && maxOffset <= 63,
      "streaming retention keeps offsets in a long bitmask: maxOffset <= 63")
    val spark = df.sparkSession
    import spark.implicits._
    val pUs = periodSec * 1000000L

    df.withWatermark(tsCol, s"$latenessSec seconds")
      // no cast on the ts column — it would strip the watermark tag
      .select(col(tsCol).as("__graft_t"), col(userCol).cast("string").as("__graft_u"),
        anchor.as("__graft_a"))
      .as[(java.sql.Timestamp, String, Boolean)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[RetState, RetEmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (key, events, state) =>
        val st = state.getOption.getOrElse(RetState(-1L, 0L, Nil))
        val micros = events.map { case (ts, _, a) =>
          (ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L, a)
        }.toSeq
        val wmMs = state.getCurrentWatermarkMs()
        val wmUs = wmMs * 1000L
        val (ready, wait) = (st.buf ++ micros)
          .partition { case (t, _) => wmMs > 0 && t <= wmUs }
        var anchorP = st.anchor
        var emitted = st.emitted
        val out = Seq.newBuilder[RetEmit]
        ready.sortBy(_._1).foreach { case (t, isAnchor) =>
          val p = t / pUs
          if (anchorP < 0 && isAnchor) anchorP = p
          if (anchorP >= 0) {
            val off = p - anchorP
            if (off >= 0 && off <= maxOffset && (emitted & (1L << off)) == 0L) {
              emitted |= 1L << off
              out += RetEmit(key, anchorP, off)
            }
          }
        }
        state.update(RetState(anchorP, emitted, wait))
        if (wait.nonEmpty)
          state.setTimeoutTimestamp(math.max(wait.map(_._1).min / 1000L, wmMs + 1L))
        out.result().iterator
      }.toDF()
  }
}
