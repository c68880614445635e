package graft.render

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.paths.FieldPath

/** The reference's "value render protocol" → plan-time Column builder
  * (reference: value_render/value_render.go:28-56 dispatch).
  *
  *   - `[a][b]` / `[a]`       field reference (multi/one level)
  *   - `$.a.b[0]`             jsonpath reference
  *   - `web-%{appid}-%{+YYYY.MM.dd}`  index pattern: literal + field +
  *                            date-format segments over the event timestamp
  *                            (reference: value_render/index_render.go)
  *   - `{{.a}}…{{.b}}`        Go-template subset: field interpolation
  *   - anything else          literal
  *
  * Everything compiles to `concat`/`date_format`/column refs — codegen'd
  * built-ins, no UDFs in the hot path.
  */
object Render {

  private val MultiLevel = """^(\[.*?\])+$""".r
  private val GoTemplate = """\{\{.*\}\}""".r.unanchored
  private val IndexPattern = """%\{.*?\}""".r.unanchored

  /** Compile; literal fallback (reference GetValueRender). */
  def compile(spec: String, tsColumn: String = "@timestamp"): DataFrame => Column =
    compileOpt(spec, tsColumn).getOrElse(_ => lit(spec))

  /** Compile; bare-name-is-field fallback (reference GetValueRender2). */
  def compileFieldRef(spec: String, tsColumn: String = "@timestamp"): DataFrame => Column =
    compileOpt(spec, tsColumn).getOrElse(df => FieldPath.resolve(df, spec).getOrElse(lit(null)))

  private def compileOpt(spec: String, tsColumn: String): Option[DataFrame => Column] =
    spec match {
      case MultiLevel(_) =>
        Some(df => FieldPath.resolve(df, spec).getOrElse(lit(null)))
      case _ if spec.startsWith("$.") =>
        Some(df => FieldPath.resolve(df, spec).getOrElse(lit(null)))
      case GoTemplate() => Some(template(spec))
      case IndexPattern() => Some(indexPattern(spec, tsColumn))
      case _ => None
    }

  /** Go-template subset: `{{.a.b}}` field refs interleaved with literals.
    * (The sprig function surface is out of scope for templates-as-columns;
    * the DSL + built-in functions cover it.) */
  private def template(spec: String)(df: DataFrame): Column = {
    val ref = """\{\{\s*(\.[\w.@-]+)\s*\}\}""".r
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    for (m <- ref.findAllMatchIn(spec)) {
      if (m.start > last) parts += lit(spec.substring(last, m.start))
      val path = m.group(1).stripPrefix(".").split('.').toSeq
      parts += FieldPath.resolveSegs(df, path.map(FieldPath.Key))
        .map(_._1.cast("string")).getOrElse(lit(""))
      last = m.end
    }
    if (last < spec.length) parts += lit(spec.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Logstash/ES index pattern: `prefix-%{field}-%{+YYYY.MM.dd}`. */
  private def indexPattern(spec: String, tsColumn: String)(df: DataFrame): Column = {
    val seg = """%\{([^}]*)\}""".r
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    for (m <- seg.findAllMatchIn(spec)) {
      if (m.start > last) parts += lit(spec.substring(last, m.start))
      val body = m.group(1)
      if (body.startsWith("+")) {
        val fmt = jodaToJava(body.stripPrefix("+"))
        val ts = FieldPath.resolve(df, tsColumn).getOrElse(current_timestamp())
        parts += date_format(ts, fmt)
      } else {
        parts += FieldPath.resolve(df, body).map(_.cast("string")).getOrElse(lit(""))
      }
      last = m.end
    }
    if (last < spec.length) parts += lit(spec.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** ES index patterns use Joda-style tokens; Java's week-based `Y`/`w`
    * differ — translate the common ones. */
  private def jodaToJava(fmt: String): String =
    fmt.replace("YYYY", "yyyy").replace("YY", "yy")
}
