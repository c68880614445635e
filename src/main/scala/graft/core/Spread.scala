package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Spread barriers PINNED to the session's shuffle-partition count (r19).
  *
  * The repo's standard barrier — `repartition(col(id))` before an
  * expensive per-row kernel — exists to (a) spread a few-split input
  * across all cores and (b) materialize a projection once for multiple
  * consumers. But a bare keyed/no-arg repartition plans as
  * REPARTITION_BY_COL, which AQE's partition coalescing folds back to ~1
  * post-shuffle partition whenever the shuffled bytes sit under the
  * advisory size — precisely the small-input case the barrier exists
  * for (measured: the media fixture carried ONE partition through its
  * barrier, pinning every synthesize/decode pass to one task).
  *
  * Passing an explicit count plans as REPARTITION_BY_NUM, which AQE
  * honors verbatim. The count is the session's `shuffle.partitions` —
  * the same value the bare form would have produced without coalescing,
  * and the operator's normal scale knob (the bench session sets it to
  * the core count; a cluster deployment tunes it with the rest of the
  * job) — never a hard-coded constant.
  */
object Spread {

  private def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Keyed spread barrier: hash-partition by `key` into the session's
    * shuffle-partition count, AQE-coalescing-proof. */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(parts(df), key)

  /** Round-robin spread barrier with the same pinned count. */
  def roundRobin(df: DataFrame): DataFrame =
    df.repartition(parts(df))
}
