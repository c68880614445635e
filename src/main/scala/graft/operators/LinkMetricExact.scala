package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact-cadence streaming LinkMetric via custom keyed state
  * (flatMapGroupsWithState) — the escape hatch SURVEY §2.5 flags for when
  * the built-in `window()` + output-mode mapping isn't faithful enough.
  *
  * Reference semantics reproduced exactly (filter/link_metric.go):
  *   - per-group state: window_start → count (`:219` floor to batchWindow)
  *   - `windowOffset`: a window is flushed only once it is `windowOffset`
  *     whole windows behind the flush horizon (`:154-181`); the reference's
  *     wall-clock ticker becomes the event-time watermark — deterministic
  *     and replayable instead of wall-clock-dependent
  *   - `accumulateMode=separate`: emit once when flushed, then clear state
  *     (`:169-179`)
  *   - `accumulateMode=cumulative`: re-emit the updated running total for
  *     every live window each batch it changes, clearing only windows
  *     older than `reserveWindow` (`:169-179`)
  *   - too-old events (beyond reserveWindow) are dropped on arrival
  *     (`:214-216`) — here by the watermark plus an explicit state guard
  *
  * State is bounded: at most reserveWindow/batchWindow window slots per
  * group, and event-time timeouts garbage-collect idle groups — this is
  * what lets it run indefinitely at cluster scale.
  */
object LinkMetricExact {

  final case class Emit(window: Timestamp, group: String, count: Long)

  private val Sep = "\u0000" // NUL separator, escaped so the file stays text

  final case class ExactConfig(
      fieldsLink: String,
      batchWindowSec: Long,
      reserveWindowSec: Long,
      windowOffset: Int = 0,
      cumulative: Boolean = false,
      tsColumn: String = "@timestamp")

  def streaming(c: ExactConfig)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = c.fieldsLink.split("->").map(_.trim).toSeq
    val batchMs = c.batchWindowSec * 1000L
    val reserveMs = c.reserveWindowSec * 1000L
    val offsetMs = c.windowOffset * batchMs
    val cumulative = c.cumulative

    // per-element presence marker (SOH prefix for non-null, empty for
    // null): concat_ws SKIPS nulls, so without it (a, null, c) and
    // (a, c, null) collapsed into one key and the split-back shifted c's
    // value into b's column — merged counts under wrong labels. The
    // Catalyst batch sibling groups nulls natively; this keeps parity.
    val Mark = "\u0001" // SOH, escaped so the file stays text
    def enc(f: String) = when(col(s"`$f`").isNull, lit(""))
      .otherwise(concat(lit(Mark), col(s"`$f`").cast("string")))
    val keyed = df
      .withWatermark(s"`${c.tsColumn}`", s"${c.reserveWindowSec} seconds")
      .select(col(s"`${c.tsColumn}`").as("ts"), // no cast — it would strip the watermark tag
        concat_ws(Sep, fields.map(enc): _*).as("g"))
      .as[(Timestamp, String)]
      .groupByKey(_._2)

    val out: Dataset[Emit] = keyed.flatMapGroupsWithState[Map[Long, Long], Emit](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: String, events: Iterator[(Timestamp, String)], state: GroupState[Map[Long, Long]]) =>
        var windows = state.getOption.getOrElse(Map.empty[Long, Long])
        val wm = state.getCurrentWatermarkMs()

        if (!state.hasTimedOut) {
          events.foreach { case (ts, _) =>
            val w = Math.floorDiv(ts.getTime, batchMs) * batchMs
            // arrival-time age guard (reference drops, not just late-data)
            if (wm <= 0 || w >= wm - reserveMs) {
              windows = windows.updated(w, windows.getOrElse(w, 0L) + 1L)
            }
          }
        }

        // flush horizon: windows whose END is windowOffset windows behind
        // the watermark are final
        val flushBefore = wm - offsetMs
        val (closed, live) = windows.partition { case (w, _) => w + batchMs <= flushBefore }

        val emits =
          if (cumulative) {
            // re-emit running totals for everything still in state;
            // drop only slots past the reserve horizon
            val keep = windows.filter { case (w, _) => w + batchMs > wm - reserveMs }
            val out = windows.toSeq.sortBy(_._1)
              .map { case (w, n) => Emit(new Timestamp(w), key, n) }
            windows = keep
            out
          } else {
            windows = live
            closed.toSeq.sortBy(_._1)
              .map { case (w, n) => Emit(new Timestamp(w), key, n) }
          }

        if (windows.isEmpty) state.remove()
        else {
          state.update(windows)
          // wake this group when its oldest live window becomes flushable
          val nextFlush = windows.keys.min + batchMs + offsetMs
          if (wm > 0) state.setTimeoutTimestamp(Math.max(nextFlush, wm + 1))
          else state.setTimeoutTimestamp(nextFlush)
        }
        emits.iterator
    }

    // split the composite key back into the original link columns; a
    // marker-less (empty) token decodes back to null
    val parts = split(col("group"), Sep, -1)
    fields.zipWithIndex.foldLeft(out.toDF()) { (d, fi) =>
      val tok = element_at(parts, fi._2 + 1)
      d.withColumn(fi._1,
        when(tok.startsWith(Mark), substring(tok, 2, Int.MaxValue)))
    }
      .withColumnRenamed("window", "@timestamp")
      .drop("group")
  }
}
