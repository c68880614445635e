package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Third-party operator escape hatch — the reference's plugin surface
  * (reference: filter/filter.go:40-61, input/input.go:40-59,
  * output/output.go:46-67): an unknown filter/input/output type there is
  * treated as a compiled plugin path whose `New(config)` factory returns
  * the operator. The JVM analog is a fully-qualified class name resolved
  * with `Class.forName` from the application classpath (or
  * `--jars`-shipped user jars on a cluster), constructed with the stage's
  * YAML config map.
  *
  * A user class plugs in by implementing one of:
  *  - [[graft.filters.EventFilter]] — a per-event filter; it gets the
  *    full FilterBox treatment (`if` guards, add_fields / remove_fields,
  *    failTag) exactly like the built-ins;
  *  - [[CorpusStagePlugin]] (or plain `DataFrame => DataFrame`) — a
  *    corpus-level stage that may change cardinality; box options are
  *    rejected exactly like the built-in corpus stages;
  *  - [[InputPlugin]] — a batch or streaming source;
  *  - [[OutputPlugin]] — a sink.
  *
  * Construction mirrors the reference's `New(map[any]any)`: prefer a
  * single-argument `Map[String, Any]` constructor, fall back to a no-arg
  * constructor, and accept a Scala `object` (MODULE$ singleton) for
  * config-free operators.
  */
object Plugins {

  /** A corpus-level stage (may change row cardinality — dedup, sample). */
  trait CorpusStagePlugin {
    def transform(df: DataFrame): DataFrame
  }

  /** A user source: return a batch or streaming frame. */
  trait InputPlugin {
    def read(spark: SparkSession): DataFrame
  }

  /** A user sink: consume `df`, return it (the writeBatch contract). */
  trait OutputPlugin {
    def write(df: DataFrame): DataFrame
  }

  /** Instantiate `className` with the stage config. Errors name the
    * class and what was tried — a plugin typo must fail the pipeline
    * build loudly, not surface as a mid-job ClassNotFound. */
  def instantiate(className: String, conf: Map[String, Any]): Any = {
    val cls =
      try Class.forName(className)
      catch {
        case _: ClassNotFoundException =>
          // a Scala `object Foo` compiles to class Foo$ — accept the
          // source-level name the user actually wrote
          try Class.forName(className + "$")
          catch {
            case e: ClassNotFoundException =>
              sys.error(s"custom operator class '$className' not found on " +
                s"the classpath (ship user jars with --jars): $e")
          }
      }
    // Scala `object`: a MODULE$ singleton, no construction needed. But a
    // CLASS that merely HAS a companion object must construct the class:
    // the `$`-suffixed lookup is a fallback for when `cls` is a
    // static-forwarder mirror (an object referenced by its source name)
    // — i.e. only when no usable constructor exists on `cls` itself.
    def moduleInstance: Option[Any] =
      cls.getFields.find(_.getName == "MODULE$")
        .orElse(
          try Class.forName(cls.getName + "$").getFields
            .find(_.getName == "MODULE$")
          catch { case _: ClassNotFoundException => None })
        .map(_.get(null))
    if (cls.getFields.exists(_.getName == "MODULE$")) moduleInstance.get
    else {
      val mapCtor = cls.getConstructors.find { c =>
        c.getParameterCount == 1 &&
          c.getParameterTypes()(0).isAssignableFrom(classOf[Map[String, Any]])
      }
      mapCtor match {
        case Some(c) => c.newInstance(conf)
        case None =>
          try cls.getDeclaredConstructor().newInstance()
          catch {
            case _: NoSuchMethodException => moduleInstance.getOrElse(sys.error(
              s"custom operator '$className' needs a (Map[String, Any]) " +
                "constructor, a no-arg constructor, or to be a Scala object"))
          }
      }
    }
  }

  /** Resolve + instantiate a custom stage from a `Custom` stage config
    * (`class: com.example.MyFilter`). */
  def forConf(conf: Map[String, Any]): Any = {
    import PipelineConfig.ConfigOps
    instantiate(conf.strReq("class"), conf)
  }
}
