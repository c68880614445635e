package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Bounded in-memory event log with monotonically increasing LOGICAL
  * offsets, shared by the UDP and TCP edge-ingest sources: `base` is the
  * offset of the first retained entry, so committed (or overflowed)
  * entries can be physically dropped while already-planned offset ranges
  * stay valid. On overflow the OLDEST uncommitted entries are dropped —
  * the bounded-channel back-pressure of the reference inputs.
  *
  * Entries are (message, remote_addr, epochMicros).
  */
final class BoundedLog(maxEntries: Int) {
  private val buf = ArrayBuffer[(String, String, Long)]()
  private var base = 0L

  /** Lossy append (UDP contract): overflow drops the oldest entries. */
  def append(msg: String, addr: String, tsMicros: Long): Unit = synchronized {
    buf += ((msg, addr, tsMicros))
    if (buf.length > maxEntries) {
      val drop = buf.length - maxEntries
      buf.remove(0, drop)
      base += drop
    }
  }

  /** Blocking append (TCP contract): like the reference's bounded channel
    * the writer WAITS for the consumer instead of losing acknowledged
    * reliable-transport data — back-pressure propagates to the client
    * through the unread socket. Unblocked by trim/rebase. */
  def appendBlocking(msg: String, addr: String, tsMicros: Long): Unit =
    synchronized {
      while (buf.length >= maxEntries) wait()
      buf += ((msg, addr, tsMicros))
    }

  /** Fast-forward the logical offset after a checkpointed restart: a fresh
    * (empty) log would otherwise restart at 0 while Spark resumes from the
    * checkpointed offset, silently skipping every line until the log
    * caught up. Data during the downtime is gone either way (socket
    * source); this keeps post-restart lines flowing immediately. */
  def rebaseTo(offset: Long): Unit = synchronized {
    if (offset > base + buf.length) {
      buf.clear()
      base = offset
    }
    notifyAll()
  }

  /** Logical end offset (total entries ever appended). */
  def end: Long = synchronized(base + buf.length)

  def slice(from: Long, until: Long): Array[(String, String, Long)] =
    synchronized {
      val lo = math.max(from - base, 0L).toInt
      val hi = math.max(until - base, 0L).toInt
      buf.slice(lo, hi).toArray
    }

  /** Drop entries below the committed offset (micro-batch completed). */
  def trim(upTo: Long): Unit = synchronized {
    val drop = math.min(math.max(upTo - base, 0L), buf.length.toLong).toInt
    if (drop > 0) { buf.remove(0, drop); base += drop }
    notifyAll()
  }
}
