package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.paths.FieldPath
import graft.render.Render

/** Add: set k → render(v); `overwrite` keeps existing values when false.
  * (reference: filter/add.go:27-64) */
final case class AddFilter(fields: Map[String, String], overwrite: Boolean = true)
    extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.foldLeft(df) { case (d, (k, v)) =>
      StageCols.setField(d, k, Render.compile(v)(d), cond, overwrite)
    }
}

/** Remove fields — one-level or multi-level `[a][b]` targets, like the
  * reference's FieldDeleter dispatch. (reference: filter/remove.go,
  * field_deleter/) */
final case class RemoveFilter(fields: Seq[String]) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.foldLeft(df)((d, f) => StageCols.deleteField(d, f, Some(cond)))
  override def transformAll(df: DataFrame): DataFrame =
    fields.foldLeft(df)((d, f) => StageCols.deleteField(d, f, None))
}

/** Rename src → dst: render src (any depth), set dst (any depth),
  * delete src — a missing src is a no-op, exactly the reference's
  * render-err guard. (reference: filter/rename.go:60-69) */
final case class RenameFilter(fields: Map[String, String]) extends EventFilter {
  // A src the deleter cannot touch (a path through a JSON-overflow
  // string column) must not rename at all: setting dst while leaving
  // src would ship the field under BOTH names (r17 review finding).
  // deleteField returns the INPUT frame unchanged for undeletable
  // paths, so reference equality detects the case.
  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.foldLeft(df) { case (d, (src, dst)) =>
      FieldPath.resolve(d, src) match {
        case None => d
        case Some(v) =>
          // probe deletability on the ORIGINAL frame, then set-then-
          // delete (set first: `v` references src's original position —
          // deleting first would unresolve a same-struct rename)
          if (StageCols.deleteField(d, src, Some(cond)) eq d) d
          else {
            val d2 = StageCols.setField(d, dst, v, cond, overwrite = true)
            StageCols.deleteField(d2, src, Some(cond))
          }
      }
    }
  override def transformAll(df: DataFrame): DataFrame =
    fields.foldLeft(df) { case (d, (src, dst)) =>
      FieldPath.resolve(d, src) match {
        case None => d
        case Some(v) =>
          val srcTop = StageCols.multiSegs(src).isEmpty
          val dstTop = StageCols.multiSegs(dst).isEmpty
          // withColumnRenamed does NOT overwrite: renaming onto an
          // existing dst column produces two columns of the same name
          // and every later dst reference fails ambiguous (r17 ADVICE).
          // The reference overwrites (SetField overwrite=true, then
          // deletes src) — route the clash through set-then-delete.
          val srcName = StageCols.topLevel(src)
          val dstClash = d.columns.exists(c =>
            c.equalsIgnoreCase(StageCols.topLevel(dst)) &&
              !c.equalsIgnoreCase(srcName))
          if (srcTop && dstTop && !dstClash && d.columns.contains(srcName))
            d.withColumnRenamed(srcName, StageCols.topLevel(dst))
          else if (StageCols.deleteField(d, src, None) eq d) d
          else {
            val d2 = StageCols.setField(d, dst, v, lit(true), overwrite = true)
            StageCols.deleteField(d2, src, None)
          }
      }
    }
}

/** Lowercase / Uppercase listed fields — string-typed only, like the
  * reference. (reference: filter/lowercase.go, uppercase.go) */
final case class CaseFilter(fields: Seq[String], upper: Boolean) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.map(StageCols.topLevel).foldLeft(df) { (d, f) =>
      FieldPath.resolveTyped(d, f) match {
        case Some((c, StringType)) =>
          d.withColumn(f, when(cond, if (upper) org.apache.spark.sql.functions.upper(c)
            else lower(c)).otherwise(c))
        case _ => d
      }
    }
}

/** URL-decode listed fields. (reference: filter/url_decode.go)
  * Uses the built-in codegen'd `url_decode` guarded by a validity check so
  * malformed input passes through unchanged instead of erroring. */
final case class UrlDecodeFilter(fields: Seq[String]) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.map(StageCols.topLevel).foldLeft(df) { (d, f) =>
      FieldPath.resolveTyped(d, f) match {
        case Some((c, StringType)) =>
          // valid %-escapes only → url_decode can't throw
          val valid = !c.rlike("%(?![0-9A-Fa-f]{2})")
          d.withColumn(f, when(cond && valid, url_decode(c)).otherwise(c))
        case _ => d
      }
    }
}

/** Split a string field into positional fields.
  * (reference: filter/split_filter.go:42-124) */
final case class SplitFilter(
    src: String, sep: String, fields: Seq[String],
    maxSplit: Int = -1, trimChars: Option[String] = None,
    ignoreBlank: Boolean = true) extends EventFilter {

  private def parts(df: DataFrame): Column = {
    val c = FieldPath.resolve(df, src).getOrElse(lit(null))
    split(c.cast("string"), java.util.regex.Pattern.quote(sep), maxSplit)
  }
  override def success(df: DataFrame): Column =
    size(parts(df)) >= fields.length

  def transform(df: DataFrame, cond: Column): DataFrame = {
    val p = parts(df)
    fields.zipWithIndex.foldLeft(df) { case (d, (f, i)) =>
      var v: Column = element_at(p, i + 1)
      trimChars.foreach(tc => v = trim(v, tc))
      if (ignoreBlank) v = when(v === "", lit(null)).otherwise(v)
      StageCols.setField(d, f, v, cond, overwrite = true)
    }
  }
}

/** KV: split into key/value pairs. With `includeKeys` the output schema is
  * static (one column per key) — the scalable path; otherwise pairs land
  * in a map column named by `target`. (reference: filter/kv.go:40-113) */
final case class KvFilter(
    src: String, fieldSplit: String, valueSplit: String,
    includeKeys: Seq[String] = Nil, excludeKeys: Seq[String] = Nil,
    trimValue: Option[String] = None, trimKey: Option[String] = None,
    target: Option[String] = None) extends EventFilter {

  private def kvMap(df: DataFrame): Column = {
    import org.apache.spark.sql.{functions => F}
    val c = FieldPath.resolve(df, src).getOrElse(lit(null)).cast("string")
    var m = str_to_map(c,
      lit(java.util.regex.Pattern.quote(fieldSplit)),
      lit(java.util.regex.Pattern.quote(valueSplit)))
    trimKey.foreach(tc => m = map_from_arrays(
      F.transform(map_keys(m), k => trim(k, tc)), map_values(m)))
    trimValue.foreach(tc => m = map_from_arrays(
      map_keys(m), F.transform(map_values(m), v => trim(v, tc))))
    if (excludeKeys.nonEmpty)
      m = map_filter(m, (k, _) => !k.isin(excludeKeys.map(lit(_)): _*))
    m
  }

  def transform(df: DataFrame, cond: Column): DataFrame = {
    val m = kvMap(df)
    if (includeKeys.nonEmpty) {
      includeKeys.foldLeft(df) { (d, k) =>
        StageCols.setField(d, k, element_at(m, k), cond, overwrite = true)
      }
    } else {
      val tgt = target.getOrElse(
        sys.error("KV without include_keys needs a target map column " +
          "(dynamic keys cannot merge into a static schema)"))
      StageCols.setField(df, tgt, m, cond, overwrite = true)
    }
  }
}

/** Gsub: regex replace per field; Go `$name` refs → Java `${name}`.
  * (reference: filter/gsub.go:36-98) */
final case class GsubFilter(subs: Seq[(String, String, String)]) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    subs.foldLeft(df) { case (d, (f, src, repl)) =>
      FieldPath.resolveTyped(d, f) match {
        case Some((c, StringType)) =>
          d.withColumn(StageCols.topLevel(f),
            when(cond, regexp_replace(c, src, repl)).otherwise(c))
        case _ => d
      }
    }
}

/** Replace: literal string replace; `count` limits replacements like Go
  * strings.Replace. (reference: filter/replace_filter.go) */
final case class ReplaceFilter(field: String, oldStr: String, newStr: String,
    count: Int = -1) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame =
    FieldPath.resolveTyped(df, field) match {
      case Some((c, StringType)) =>
        val replaced =
          if (count < 0) replace(c, lit(oldStr), lit(newStr))
          else {
            // count-limited: replace the first `count` occurrences.
            // split keeps it codegen'd: rebuild with at most `count`
            // joins. NULL guard: split(null) is null but concat_ws over
            // a null array is "" — a null field must stay null, like
            // the unlimited branch (and the reference's missing-field
            // no-op)
            val quoted = java.util.regex.Pattern.quote(oldStr)
            val parts = split(c, quoted, count + 1)
            when(c.isNull, c).otherwise(concat_ws(newStr, parts))
          }
        df.withColumn(StageCols.topLevel(field), when(cond, replaced).otherwise(c))
      case _ => df
    }
}

/** Translate: dictionary enrichment (reference: filter/translate.go).
  *
  * Three dictionary sources, by scale:
  *   - inline `dictionary` map → a literal map lookup baked into the plan
  *     (zero shuffle, codegen'd — the common small-dict case);
  *   - `dictionary_path` (file / file:// / http(s):// YAML) with
  *     `refresh_interval` → an executor-local TTL-cached lookup; each JVM
  *     re-reads the dict when the interval elapses, the Spark analogue of
  *     the reference's background reload goroutine (translate.go:79-131).
  *     Because the lookup runs at EXECUTION time, every streaming
  *     micro-batch sees the freshest dict without replanning.
  *   - `TranslateFilter.joined` → broadcast join against a dict DataFrame
  *     for dictionaries too large to ship per executor. */
final case class TranslateFilter(src: String, target: String,
    dict: Map[String, String],
    dictPath: Option[String] = None,
    refreshIntervalSec: Int = 300) extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame = {
    val key = FieldPath.resolve(df, src).getOrElse(lit(null)).cast("string")
    val value = dictPath match {
      case Some(p) =>
        // the lookup runs on EXECUTORS: a plain filesystem path must be
        // visible there — shared storage in cluster mode, or a file shipped
        // via spark-submit --files (DictCache.load falls back to the
        // SparkFiles copy). An http(s) URL works everywhere and is the
        // form that supports live TTL reload in cluster mode; a missing
        // file FAILS the task rather than silently translating to null.
        // (Auto-addFile was rejected: Spark pins an added file's contents,
        // so the refresh_interval reload contract would break the job the
        // first time the dictionary legitimately changed.)
        val ttl = refreshIntervalSec
        val lookup = udf { (k: String) =>
          if (k == null) null
          else TranslateFilter.DictCache.get(p, ttl).getOrElse(k, null)
        }
        lookup(key)
      case None => element_at(typedlit(dict), key)
    }
    StageCols.setField(df, target, value, cond, overwrite = true)
  }
}

object TranslateFilter {
  /** Broadcast-join variant for dictionaries too large to inline in the
    * plan. At scale this is the one to use: the dict is broadcast once,
    * the fact side never shuffles. In a streaming pipeline the static
    * dict side is re-planned per micro-batch, so a dict re-read through
    * `spark.read` hot-reloads there too. */
  def joined(df: DataFrame, dictDf: DataFrame, srcCol: String,
      keyCol: String, valueCol: String, target: String): DataFrame = {
    val d = dictDf.select(col(keyCol).as("__graft_k"), col(valueCol).as(target))
    df.join(broadcast(d), col(srcCol) === col("__graft_k"), "left")
      .drop("__graft_k")
  }

  /** Per-JVM dictionary cache with TTL refresh. `ttlSec <= 0` re-reads on
    * every call (test/dev); a failed refresh keeps serving the last good
    * dict like the reference (translate.go logs and keeps the old map). */
  object DictCache {
    private final case class Entry(dict: Map[String, String], loadedAt: Long)
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

    def get(path: String, ttlSec: Int): Map[String, String] = {
      val now = System.currentTimeMillis()
      val cur = cache.get(path)
      if (cur != null && ttlSec > 0 && now - cur.loadedAt < ttlSec * 1000L) cur.dict
      else {
        val d =
          try load(path)
          catch { case _: Exception if cur != null => cur.dict }
        cache.put(path, Entry(d, now))
        d
      }
    }

    /** Read YAML `key: value` pairs from a filesystem path or URL. A plain
      * path missing on this node (executor in cluster mode) falls back to
      * the SparkFiles copy the driver shipped via addFile; if neither
      * exists this THROWS (fail fast) rather than serving nulls. */
    def load(path: String): Map[String, String] = {
      val text =
        if (path.startsWith("http://") || path.startsWith("https://") ||
            path.startsWith("file:")) {
          val in = java.net.URI.create(path).toURL.openStream()
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        } else {
          val direct = java.nio.file.Paths.get(path)
          val resolved =
            if (java.nio.file.Files.isRegularFile(direct)) direct
            else {
              val shipped = java.nio.file.Paths.get(
                org.apache.spark.SparkFiles.get(new java.io.File(path).getName))
              if (java.nio.file.Files.isRegularFile(shipped)) shipped
              else sys.error(s"Translate dictionary not found at $path (nor in " +
                "SparkFiles) — in cluster mode use shared storage or an " +
                "http(s) URL, or keep the file present when the plan is built")
            }
          new String(java.nio.file.Files.readAllBytes(resolved), "UTF-8")
        }
      val root = new org.yaml.snakeyaml.Yaml().load[Object](text)
      root match {
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asScala.map { case (k, v) =>
            k.toString -> (if (v == null) null else v.toString)
          }.toMap
        case other => sys.error(s"Translate dictionary at $path is not a map: $other")
      }
    }
  }
}

/** Drop the event. Always runs under a FilterBox `if` guard.
  * (reference: filter/drop.go) */
final case object DropFilter extends EventFilter {
  def transform(df: DataFrame, cond: Column): DataFrame = df.filter(!coalesce(cond, lit(false)))
  override def transformAll(df: DataFrame): DataFrame = df.limit(0)
}

/** Filters: a nested chain run as one unit under a shared `if` guard
  * (reference: filter/filters.go). The shared conditions are AND-prefixed
  * onto every inner box — identical semantics, and Catalyst de-duplicates
  * the repeated predicate via subexpression elimination. */
object NestedFilters {
  def stage(sharedIf: Seq[String], boxes: Seq[FilterBox]): DataFrame => DataFrame =
    df => boxes.foldLeft(df)((d, b) =>
      b.copy(ifConds = sharedIf ++ b.ifConds).stage(d))
}
