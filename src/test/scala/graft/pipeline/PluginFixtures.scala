package graft.testplugins

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filters.{EventFilter, StageCols}
import graft.pipeline.Plugins

/** Test-classpath exemplars of the four plugin seams — written the way a
  * third-party user would write them (plain constructors over the YAML
  * config map, no graft internals beyond the published traits). */

/** Per-event filter: append `suffix` to `field`; success = field present
  * and (when configured) containing `must_contain` — a parse-like success
  * predicate so the FilterBox contract (if / add_fields / failTag) has
  * real failure rows to tag. */
class SuffixFilter(conf: Map[String, Any]) extends EventFilter {
  private val field = conf.getOrElse("field", "message").toString
  private val suffix = conf.getOrElse("suffix", "!").toString
  private val mustContain = conf.get("must_contain").map(_.toString)

  override def success(df: DataFrame): Column = {
    val base = col(s"`$field`").isNotNull
    mustContain.fold(base)(s => base && col(s"`$field`").contains(s))
  }

  def transform(df: DataFrame, cond: Column): DataFrame =
    StageCols.setField(df, field,
      concat(col(s"`$field`"), lit(suffix)), cond, overwrite = true)
}

/** Corpus-level plugin: keeps even ids — changes cardinality, so the
  * Planner must reject per-event box options for it. */
class EvenIdSampler(conf: Map[String, Any]) extends Plugins.CorpusStagePlugin {
  private val idField = conf.getOrElse("id_field", "id").toString
  def transform(df: DataFrame): DataFrame =
    df.filter(col(s"`$idField`") % 2 === 0)
}

/** Config-free corpus plugin as a plain Scala function object. */
object DropNullMessage extends (DataFrame => DataFrame) {
  def apply(df: DataFrame): DataFrame = df.filter(col("message").isNotNull)
}

/** A CLASS that also has a companion object — instantiate must construct
  * the class, not hand back the (useless) companion (r14 fix: the
  * MODULE$ fallback shadowed the constructor for any companioned class). */
class CompanionedSampler(conf: Map[String, Any]) extends Plugins.CorpusStagePlugin {
  private val keep = conf.getOrElse("keep_mod", CompanionedSampler.DefaultMod)
    .toString.toInt
  def transform(df: DataFrame): DataFrame =
    df.filter(col("id") % keep === 0)
}
object CompanionedSampler {
  val DefaultMod = 2 // plain helper — implements none of the plugin traits
}

/** A Function1 that is NOT (DataFrame => DataFrame): must fail the
  * pipeline BUILD loudly (the type-erased `case Function1` match would
  * otherwise CCE at first application — mid-job on a stream). */
object WrongTypeFn extends (String => String) {
  def apply(s: String): String = s.toUpperCase
}

/** User source: n synthetic rows with the stdin-style schema. */
class CountingInput(conf: Map[String, Any]) extends Plugins.InputPlugin {
  private val n = conf.getOrElse("n", "5").toString.toLong
  def read(spark: SparkSession): DataFrame =
    spark.range(n).select(
      concat(lit("msg-"), col("id").cast("string")).as("message"),
      current_timestamp().as("@timestamp"))
}

/** User sink: captures messages into a static buffer the spec reads. */
object CapturingOutput extends Plugins.OutputPlugin {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def write(df: DataFrame): DataFrame = {
    val it = df.select(col("message").cast("string")).toLocalIterator()
    while (it.hasNext) seen.add(it.next().getString(0))
    df
  }
}
