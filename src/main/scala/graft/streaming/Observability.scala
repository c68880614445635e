package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-operator counters + query progress — the Spark-native analogue of
  * the reference's Prometheus plumbing (topology/prom_counter.go:68-92,
  * wired per input/filter/output box).
  *
  * The reference increments a counter per event per box; here each
  * instrumented stage contributes an `observe` aggregate — collected once
  * per batch/epoch by the engine with no per-row callback cost — and the
  * listener aggregates them across micro-batches. Scale cost: one extra
  * accumulator per stage, nothing on the row path.
  */
object Observability {

  /** Instrument a stage boundary: counts rows flowing past this point
    * (reference: InputBox/FilterBox/OutputBox counters). */
  def observeCount(df: DataFrame, name: String): DataFrame =
    df.observe(s"graft_$name", count(lit(1)).as("events"))

  /** Batch-side counter: run the action under an Observation and read the
    * counts without a second pass over the data. */
  def observedCount(df: DataFrame)(action: DataFrame => Unit): Long = {
    val obs = new org.apache.spark.sql.Observation()
    val observed = df.observe(obs, count(lit(1)).as("events"))
    action(observed)
    obs.get("events").asInstanceOf[Long]
  }

  /** Collects observed metrics + input/processed rates per query. */
  final class Listener extends StreamingQueryListener {
    private val counters = new ConcurrentHashMap[String, Long]()
    @volatile private var lastProgress: Map[String, Double] = Map.empty

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      lastProgress = Map(
        "inputRowsPerSecond" -> p.inputRowsPerSecond,
        "processedRowsPerSecond" -> p.processedRowsPerSecond,
        "numInputRows" -> p.numInputRows.toDouble)
      // only graft's own observations carry the `events` schema — a
      // foreign df.observe from a Custom plugin would throw here and
      // (the listener bus swallowing it) silently drop every counter
      // merged after it in the iteration
      p.observedMetrics.asScala.foreach { case (name, row) =>
        if (name.startsWith("graft_") &&
            row.schema.fieldNames.contains("events")) {
          val n = row.getAs[Long]("events")
          counters.merge(name, n, (a, b) => a + b): Unit
        }
      }
    }

    /** Cumulative per-stage event counts (Prometheus scrape shape). */
    def snapshot: Map[String, Long] = counters.asScala.toMap
    def progress: Map[String, Double] = lastProgress
  }
}
