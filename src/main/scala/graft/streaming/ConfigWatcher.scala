package graft.streaming

import java.nio.file.{Files, Paths}

/** Hot config reload (reference: gohangout.go:114-131 file-watch +
  * internal/config/config_watcher.go — on change, stop the pipeline and
  * rebuild it). Spark mapping: a mtime poll on the YAML; on change the
  * callback stops the running StreamingQuery and starts a fresh one from
  * the re-parsed spec. Checkpoint compatibility is the caller's contract —
  * same sink + same aggregation keys resume, anything else needs a new
  * checkpoint dir (documented reference behavior is a full restart too).
  */
final class ConfigWatcher(path: String, intervalMs: Long)(onChange: () => Unit) {

  @volatile private var running = true
  private var lastModified = mtime()

  private def mtime(): Long =
    try Files.getLastModifiedTime(Paths.get(path)).toMillis catch { case _: Exception => 0L }

  private val thread = new Thread(() => {
    try {
      while (running) {
        Thread.sleep(intervalMs)
        val m = mtime()
        if (m != lastModified) {
          // advance lastModified only AFTER a successful reload: a poll
          // that fires mid-editor-write parses a truncated file and
          // fails — consuming the mtime then would silently drop the
          // completed write and run the old config forever; leaving it
          // untouched retries on the next tick
          try { onChange(); lastModified = m }
          catch { case e: Exception =>
            System.err.println(s"[graft] config reload failed " +
              s"(will retry next poll): ${e.getMessage}")
          }
        }
      }
    } catch {
      case _: InterruptedException => () // clean shutdown
      case e: Throwable =>
        // a dying watcher must say so — the operator otherwise believes
        // hot reload is active while edits are silently ignored
        System.err.println(s"[graft] config watcher died: $e")
    }
  }, s"graft-config-watcher-$path")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }
  def stop(): Unit = { running = false }
}
