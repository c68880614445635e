package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization: partition each key's event stream into sessions
  * separated by an inactivity gap — the standard "30-minute web session"
  * log-analytics operator, and the grouping a behavioral training corpus
  * (user → session → event sequence) is built on.
  *
  * Two forms, spec-pinned to produce the SAME partition of events:
  *
  *   - [[assign]]: per-event session sequence number via window functions
  *     (lag → gap flag → running sum). Use when downstream needs the
  *     events themselves grouped (sequence packing, funnel analysis).
  *   - [[summarize]]: per-session aggregate via Spark's native
  *     `session_window` — Catalyst's own merging-interval aggregation,
  *     which also runs under Structured Streaming with watermark-based
  *     state eviction (the batch and streaming plans share this one
  *     declaration).
  *
  * Gap rule (both forms): an event at `ts` joins the current session iff
  * `ts - previous < gap`, i.e. a gap of EXACTLY `gapSec` starts a new
  * session — matching `session_window`'s half-open `[start, last+gap)`
  * range semantics.
  *
  * Scale shape: both forms pay exactly one hash exchange on the key.
  * `assign` adds a per-partition sort (window); `summarize`'s aggregation
  * groups by (key, merged interval) with partial aggregation upstream of
  * the exchange. Session count per key is bounded by event count; state
  * per key is one open interval — this is why `session_window` streams at
  * 100 TB where a collect-the-user's-history UDF would not.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, in event-time order) to every
    * row. One exchange + one sort; both window frames share it. */
  def assign(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long,
             outCol: String = "session_seq"): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val prev  = lag(col(tsCol), 1).over(byKey)
    val isNew = when(prev.isNull
      .or(unix_micros(col(tsCol)) - unix_micros(prev) >= gapSec * 1000000L), 1L)
      .otherwise(0L)
    df.withColumn(outCol,
      sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary rows: key, first/last event time, event count,
    * plus caller aggregates. Session identity comes from `session_window`;
    * the window struct itself is dropped (its `end` is `last + gap`, an
    * implementation detail — `session_last` is the real max event time). */
  def summarize(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long,
                extraAggs: Seq[Column] = Seq.empty): DataFrame = {
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_last"),
      count(lit(1)).as("n_events")) ++ extraAggs
    df.groupBy(col(keyCol), session_window(col(tsCol), s"$gapSec seconds"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")
  }

  // ---- streaming per-event assignment ------------------------------------

  /** Keyed session state: the last CONFIRMED event time and session
    * sequence, plus the buffer of events still inside the lateness
    * bound (they assign only once the watermark passes them, in ts
    * order — out-of-order arrival within the bound gets the same ids
    * the batch operator would give). */
  final case class SessState(lastTsUs: Long, seq: Long, buf: Seq[Long])
  final case class SessEmit(key: String, ts: java.sql.Timestamp, session_seq: Long)

  /** Streaming [[assign]]: emits each event with its session sequence
    * once the watermark confirms its position — the per-event form the
    * native `session_window` cannot give (it only aggregates). Same
    * state pattern as the streaming funnel: O(1) confirmed state per key
    * plus the within-lateness buffer, event-time timeouts re-invoking
    * keys whose buffered events the watermark has passed. Output contract
    * is (key, ts, session_seq) — join back on (key, ts) when the full
    * event row is needed downstream. */
  def streamingAssign(df: DataFrame, keyCol: String, tsCol: String,
      gapSec: Long, latenessSec: Long,
      target: String = "session_seq"): DataFrame = {
    // schema parity with batch `assign` lives HERE, not at call sites:
    // the emitted triple comes back under the configured key/timestamp
    // names with the key cast back to its input type, so every caller
    // (YAML dispatch or direct API) sees the same contract. Payload
    // columns are NOT carried — the keyed state confirms events out of
    // batch order; join back on (key, ts) when the full row is needed.
    val keyType = df.schema(df.schema.fieldIndex(keyCol)).dataType
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L

    df.withWatermark(tsCol, s"$latenessSec seconds")
      // no cast on the ts column — it would strip the watermark tag
      .select(col(tsCol).as("__graft_t"), col(keyCol).cast("string").as("__graft_k"))
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessState, SessEmit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (key, events, state) =>
        val st = state.getOption.getOrElse(SessState(-1L, 0L, Nil))
        val micros = events.map { case (ts, _) =>
          ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
        }.toSeq
        val wmMs = state.getCurrentWatermarkMs()
        val wmUs = wmMs * 1000L
        val (ready, wait) = (st.buf ++ micros)
          .partition(t => wmMs > 0 && t <= wmUs)
        var last = st.lastTsUs
        var seq = st.seq
        val emits = ready.sorted.map { t =>
          if (last < 0 || t - last >= gapUs) seq += 1
          last = t
          val ts = new java.sql.Timestamp(t / 1000L)
          ts.setNanos((t % 1000000L).toInt * 1000)
          SessEmit(key, ts, seq)
        }
        state.update(SessState(last, seq, wait))
        if (wait.nonEmpty)
          state.setTimeoutTimestamp(math.max(wait.min / 1000L, wmMs + 1L))
        emits.iterator
      }.toDF()
      .select(col("key").cast(keyType).as(keyCol), col("ts").as(tsCol),
        col("session_seq").as(target))
  }
}
