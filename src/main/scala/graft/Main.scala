package graft

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
    spec.inputs.exists { case (name, _) => StreamingInputs.contains(name) }

  def main(args: Array[String]): Unit = {
    def flagValue(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val configPath = flagValue("--config").getOrElse(
      sys.error("usage: graft.Main --config pipeline.yml [--master url] [--watch]"))
    val master = flagValue("--master").getOrElse("local[*]")
    val watch = args.contains("--watch")

    val spark = SparkSession.builder()
      .appName("graft")
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, configPath, watch)
    finally spark.stop()
  }

  /** Run the pipeline at `configPath`; returns when a batch pipeline
    * finishes or a streaming one terminates. Factored from main so tests
    * drive it without process-level plumbing. */
  def run(spark: SparkSession, configPath: String, watch: Boolean = false): Unit = {
    val pipeline = Planner.fromFile(configPath)
    if (!isStreamingSpec(pipeline.spec)) {
      pipeline.runBatch(spark): Unit
    } else {
      var query = Planner.runStreaming(spark, pipeline)
      val watcher =
        if (watch)
          Some(new graft.streaming.ConfigWatcher(configPath, 2000)({ () =>
            // reference hot reload: rebuild the topology from the changed
            // file and swap the running query (gohangout restarts its
            // input/filter/output chain in place)
            val next = Planner.fromFile(configPath)
            val old = query
            query = Planner.runStreaming(spark, next)
            old.stop()
          }).start())
        else None
      try query.awaitTermination()
      finally watcher.foreach(_.stop())
    }
  }
}
