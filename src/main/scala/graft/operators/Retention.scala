package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention: users are anchored to the period of their FIRST
  * event matching `anchor` (e.g. signup week), and each later period
  * they appear in at all increments that cohort's retention counter —
  * the (cohort × offset) matrix every product-analytics stack draws.
  *
  * Shape: ONE aggregation per user collects both the anchor period and
  * the distinct active periods (`min(when(anchor, p))` +
  * `collect_set(p)` share the single keyed exchange), then the exploded
  * (cohort, offset, user) rows — already distinct per user by
  * construction, so a plain count, no count-distinct shuffle — aggregate
  * to the matrix. Two exchanges total; per-user state is the distinct
  * period set, bounded by `maxOffset`, not event count.
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
    val perUser = df
      .groupBy(col(userCol))
      .agg(
        min(when(anchor, period(col(tsCol)))).as("__cohort"),
        collect_set(period(col(tsCol))).as("__periods"))
      .filter(col("__cohort").isNotNull)
    perUser
      .select(col("__cohort").as("cohort_period"),
        explode(filter(
          transform(col("__periods"), p => p - col("__cohort")),
          o => o >= 0 && o <= maxOffset)).as("period_offset"))
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
