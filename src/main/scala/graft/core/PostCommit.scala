package graft.core

/** Deferred side effects for pipeline stages — actions that must run
  * only AFTER the run's sinks have succeeded. The motivating case is
  * incremental dedup's seen-store update: appending the increment's
  * fingerprints at transform time would poison a retry (sink fails →
  * re-run reads its own fingerprints from the store → the whole
  * increment anti-joins away and the day's data is silently lost).
  * Stages register the update here instead; `Planner.runBatch` and the
  * foreachBatch writer `drain()` on success and `clear()` on failure.
  *
  * Thread-scoped like [[CacheRegistry]]: a stage registers on the thread
  * that applies it, and the driver that applied it drains on the same
  * thread — so two concurrent streaming queries cannot run (or drop)
  * each other's hooks. */
object PostCommit {
  private val local =
    ThreadLocal.withInitial[java.util.ArrayDeque[() => Unit]](
      () => new java.util.ArrayDeque[() => Unit]())

  def register(hook: () => Unit): Unit = local.get.add(hook)

  /** Run and clear this thread's hooks, in registration order. A hook
    * failure propagates (a lost store update must be loud — the run's
    * data is already safely written, the operator re-runs the update). */
  def drain(): Unit = {
    val q = local.get
    var h = q.poll()
    while (h != null) { h(); h = q.poll() }
  }

  /** Drop this thread's hooks without running them (failure path). */
  def clear(): Unit = local.get.clear()

  def size: Int = local.get.size
}
