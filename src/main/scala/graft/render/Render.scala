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

  /** Go-template subset: `{{.a.b}}` field refs and `{{func args…}}` calls
    * interleaved with literals. Function surface mirrors the reference's
    * registered template funcs (value_render/template_value_render.go:
    * 41-138): arithmetic plus/minus/multiply/divide/mod, now/timestamp,
    * timeFormat (Go layout), and the sprig-style string helpers
    * upper/lower/trim/title. Everything compiles to built-in Columns. */
  private def template(spec: String)(df: DataFrame): Column = {
    val seg = """\{\{\s*([^}]+?)\s*\}\}""".r
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    for (m <- seg.findAllMatchIn(spec)) {
      if (m.start > last) parts += lit(spec.substring(last, m.start))
      parts += templateExpr(m.group(1), df).cast("string")
      last = m.end
    }
    if (last < spec.length) parts += lit(spec.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.map(coalesce(_, lit(""))).toSeq: _*)
  }

  private def fieldRef(path: String, df: DataFrame): Column =
    FieldPath.resolveSegs(df,
      path.stripPrefix(".").split('.').toSeq.map(FieldPath.Key))
      .map(_._1).getOrElse(lit(null))

  /** One `{{ … }}` body → Column. */
  private def templateExpr(body: String, df: DataFrame): Column = {
    // split on spaces outside double quotes
    val toks = """"[^"]*"|\S+""".r.findAllIn(body).toSeq
    def arg(t: String): Column =
      if (t.startsWith(".")) fieldRef(t, df)
      else if (t.startsWith("\"") && t.endsWith("\"")) lit(t.substring(1, t.length - 1))
      else scala.util.Try(lit(t.toLong)).getOrElse(
        scala.util.Try(lit(t.toDouble)).getOrElse(lit(t)))
    toks match {
      case Seq(p) if p.startsWith(".") => fieldRef(p, df)
      case Seq("now") => current_timestamp()
      case Seq("timestamp") => unix_timestamp()
      case Seq("plus", a, b) => arg(a).cast("double") + arg(b).cast("double")
      case Seq("minus", a, b) => arg(a).cast("double") - arg(b).cast("double")
      case Seq("multiply", a, b) => arg(a).cast("double") * arg(b).cast("double")
      case Seq("divide", a, b) => arg(a).cast("double") / arg(b).cast("double")
      case Seq("mod", a, b) => arg(a).cast("long") % arg(b).cast("long")
      case Seq("timeFormat", a, f) =>
        date_format(arg(a).cast("timestamp"),
          graft.filters.GoTimeLayout.translate(
            f.stripPrefix("\"").stripSuffix("\"")))
      case Seq("upper", a) => upper(arg(a).cast("string"))
      case Seq("lower", a) => lower(arg(a).cast("string"))
      case Seq("trim", a) => trim(arg(a).cast("string"))
      case Seq("title", a) => initcap(arg(a).cast("string"))
      case other => sys.error(s"unsupported template expression '${other.mkString(" ")}'")
    }
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
