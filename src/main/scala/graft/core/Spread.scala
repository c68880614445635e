package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Spread barriers PINNED to the session's shuffle-partition count (r19),
  * with an optional ROW-AWARE cap (r20).
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
  *
  * r20 (`minRowsPerTask`): the full pin OVER-shards tiny inputs — each
  * post-spread task pays a fixed schedule/codegen/setup cost, and when a
  * barrier carries a few hundred rows per task whose per-row work is
  * cheap (the media fixture synthesizers: ~0.1–1 ms/row), that fixed
  * cost exceeds the parallelism win. Measured (r19 verdict item 1 — the
  * 8-core driver run BEAT the 32-core run on the media family):
  * q_image_phash 0.61 s at 32 post-spread partitions vs 0.36 s at 8;
  * q_multimodal_curate 0.73 vs 0.36. Callers whose per-row kernel cost
  * is in that regime pass the measured rows-per-task floor and the
  * count is capped at ceil(estimatedRows / minRowsPerTask) — derived
  * from the plan's own size estimate, so it is scale-ADAPTIVE: at gate
  * scale the barrier takes the handful of tasks that amortize the fixed
  * cost, at corpus scale the estimate exceeds minRowsPerTask × the
  * session pin and the cap stops binding — never a constant, never a
  * local-mode special case. Callers whose post-spread per-row work is
  * expensive or row-multiplying (kNN's O(n²) scoring, minhash pair
  * verification) keep the default full pin.
  */
object Spread {

  private def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Row estimate from the optimized plan's stats — `rowCount` when the
    * planner has one (CBO), else sizeInBytes over the schema's default
    * row width. Estimate-grade (filters on the prefix may not reduce
    * it), which is fine for a task-count cap: ±2× misestimate moves the
    * count one bucket, not the semantics. */
  private def estRows(df: DataFrame): Long = {
    val st = df.queryExecution.optimizedPlan.stats
    st.rowCount.map(_.toLong).getOrElse {
      val width = math.max(1, df.schema.map(_.dataType.defaultSize).sum + 8)
      (st.sizeInBytes / width).toLong
    }
  }

  /** Pure cap rule (spec hook): partitions for `est` rows under the
    * session pin `sessionParts` and a `minRowsPerTask` floor. */
  private[graft] def cappedParts(sessionParts: Int, est: Long,
      minRowsPerTask: Long): Int =
    if (minRowsPerTask <= 1L) sessionParts
    else {
      val byRows = (est + minRowsPerTask - 1L) / minRowsPerTask
      math.max(1L, math.min(sessionParts.toLong, byRows)).toInt
    }

  /** Partition count for `df` under the row-aware cap. STREAMING frames
    * skip the cap (full session pin): probing `queryExecution` on a
    * streaming Dataset forces the batch-execution analysis check and
    * throws, and a micro-batch's size varies per batch anyway — the
    * pinned spread is the safe constant-free default there. */
  private def targetParts(df: DataFrame, minRowsPerTask: Long): Int =
    if (minRowsPerTask <= 1L || df.isStreaming) parts(df)
    else cappedParts(parts(df), estRows(df), minRowsPerTask)

  /** Keyed spread barrier: hash-partition by `key` into the session's
    * shuffle-partition count (optionally row-aware-capped),
    * AQE-coalescing-proof. */
  def byKey(df: DataFrame, key: Column, minRowsPerTask: Long = 1L): DataFrame =
    df.repartition(targetParts(df, minRowsPerTask), key)

  /** Round-robin spread barrier with the same pinned count. */
  def roundRobin(df: DataFrame, minRowsPerTask: Long = 1L): DataFrame =
    df.repartition(targetParts(df, minRowsPerTask))
}
