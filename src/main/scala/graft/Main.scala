package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession

import graft.pipeline.Planner

/** CLI entry point — the analogue of running the reference binary with
  * `--config` (reference: gohangout.go main + flags). Batch vs streaming
  * is auto-detected from the input types; `--watch` restarts a streaming
  * pipeline when the config file changes (the reference's hot reload,
  * gohangout.go's SIGHUP/file-watch path).
  *
  *   spark-submit --class graft.Main graft.jar --config pipeline.yml \
  *     [--master local[*]] [--watch]
  */
object Main {

  private val StreamingInputs = Set("Kafka", "Rate", "UDP", "TCP")

  def isStreamingSpec(spec: graft.pipeline.PipelineConfig.Spec): Boolean =
    spec.inputs.exists {
      case (name, _) if StreamingInputs.contains(name) => true
      // a Custom input plugin's frame shape is invisible at spec level —
      // `streaming: true` is the explicit hint that routes it through
      // runStreaming (runBatch also detects and rejects a streaming
      // frame loudly, so forgetting the hint is a named error, not a
      // cryptic writeStream AnalysisException mid-wiring)
      case ("Custom", conf) => conf.get("streaming").exists(_.toString == "true")
      case _ => false
    }

  def main(args: Array[String]): Unit = {
    def flagValue(name: String): Option[String] =
      args.sliding(2).collectFirst {
        // a following flag is NOT this flag's value: `--master --watch`
        // must fail on the missing value, not adopt "--watch" as master
        case Array(`name`, v) if !v.startsWith("--") => v
      }
    val configPath = flagValue("--config").getOrElse(
      sys.error("usage: graft.Main --config pipeline.yml [--master url] " +
        "[--watch] [--checkpoint dir]"))
    val master = flagValue("--master").getOrElse("local[*]")
    val watch = args.contains("--watch")
    val checkpoint = flagValue("--checkpoint")

    val spark = SparkSession.builder()
      .appName("graft")
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, configPath, watch, checkpoint)
    finally spark.stop()
  }

  /** Run the pipeline at `configPath`; returns when a batch pipeline
    * finishes or a streaming one terminates. Factored from main so tests
    * drive it without process-level plumbing.
    *
    * The active query lives in an AtomicReference: the watcher/signal
    * thread swaps in the replacement before stopping the old query, and
    * the main thread loops on awaitTermination until the query that
    * terminated is still the active one (i.e. it stopped for a reason
    * other than a reload swap). */
  def run(spark: SparkSession, configPath: String, watch: Boolean = false,
      checkpoint: Option[String] = None): Unit = {
    val pipeline = Planner.fromFile(configPath)
    if (!isStreamingSpec(pipeline.spec)) {
      pipeline.runBatch(spark): Unit
    } else {
      // --checkpoint (or YAML `checkpoint_location` on any input): a
      // durable checkpoint is what makes a Kafka restart RESUME from
      // committed offsets — without one, every redeploy starts at
      // startingOffsets and drops the outage backlog (the reference
      // resumes from group offsets; Spark needs the checkpoint dir)
      val ckpt = checkpoint.orElse(pipeline.spec.inputs.collectFirst {
        case (_, c) if c.contains("checkpoint_location") =>
          c("checkpoint_location").toString
      })
      val query = new AtomicReference(
        Planner.runStreaming(spark, pipeline, ckpt))
      // reference hot reload: rebuild the topology from the changed file
      // and swap the running query (gohangout restarts its
      // input/filter/output chain in place)
      // Reload is reachable from BOTH the watcher thread and the SIGUSR1
      // handler, and must be SERIALIZED end to end: a CAS guards only the
      // reference swap, not the runStreaming start — two racing reloads
      // would each start a replacement (evaluated before the CAS) and the
      // loser's query would leak running, with a checkpoint dir that must
      // host exactly ONE active query then hosting two.
      val reloadLock = new Object
      val reload: () => Unit = { () =>
        reloadLock.synchronized {
          val next = Planner.fromFile(configPath)
          if (ckpt.isDefined) {
            // one checkpoint dir hosts ONE active query: stop-then-start
            // (the checkpoint preserves offsets across the gap — that is
            // its job)
            query.get().stop()
            query.set(Planner.runStreaming(spark, next, ckpt))
          } else {
            val old = query.getAndSet(Planner.runStreaming(spark, next, ckpt))
            old.stop()
          }
        }
      }
      val watcher =
        if (watch) Some(new graft.streaming.ConfigWatcher(configPath, 2000)(reload).start())
        else None
      if (watch) trapReloadSignal(reload): Unit
      try {
        var q = query.get()
        var done = false
        while (!done) {
          q.awaitTermination()
          if (q ne query.get()) q = query.get() // swapped: follow the replacement
          else if (watch && ckpt.isDefined) {
            // a checkpointed reload stops the old query BEFORE its
            // replacement can start (same checkpoint dir) — grace-wait
            // for the swap before concluding the pipeline really ended.
            // Reads go THROUGH the reload lock: a slow replacement start
            // (e.g. Kafka connect) holds the lock past the grace window,
            // and an unlocked read would conclude "really ended" while
            // the reload is mid-start — the first locked read blocks
            // until the in-flight reload commits its swap.
            def current() = reloadLock.synchronized(query.get())
            val deadline = System.currentTimeMillis() + 10000
            while ((q eq current()) && System.currentTimeMillis() < deadline)
              Thread.sleep(100)
            if (q eq current()) done = true else q = query.get()
          } else done = true
        }
      } finally watcher.foreach(_.stop())
    }
  }

  /** Trap SIGUSR1 → reload, the reference's manual-reload trigger
    * (reference: gohangout.go:149-155 traps syscall.SIGUSR1 and re-reads
    * the config). `sun.misc.Signal` lives in jdk.unsupported and JVMs may
    * reserve USR1 (e.g. for their own use under -Xrs), so failure to
    * install is a logged no-op, not an error. Returns whether the handler
    * was installed. */
  def trapReloadSignal(onReload: () => Unit): Boolean =
    try {
      sun.misc.Signal.handle(
        new sun.misc.Signal("USR1"),
        (_: sun.misc.Signal) =>
          try onReload()
          catch {
            case e: Exception =>
              System.err.println(s"[graft] SIGUSR1 reload failed: ${e.getMessage}")
          })
      true
    } catch {
      case _: Throwable =>
        System.err.println("[graft] SIGUSR1 unavailable on this JVM; use --watch")
        false
    }
}
