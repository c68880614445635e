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
    // a `}` may appear INSIDE a quoted argument (regex replacements like
    // "hi ${who}"); the action body is any run of quoted-strings or
    // non-} chars up to the closing }}
    val seg = """\{\{\s*((?:"[^"]*"|[^}])+?)\s*\}\}""".r
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

  /** Sprig's "empty" test (default/ternary/coalesce truthiness): the zero
    * VALUE of the argument's own type — null, "" for strings, 0 for
    * numerics, false for booleans. Type-aware like sprig's reflect-based
    * check: the STRING "0" is non-empty/truthy (a string-image comparison
    * would misfire on text that merely looks falsy). */
  private def isEmptyCol(c: Column, df: DataFrame): Column = {
    import org.apache.spark.sql.types._
    val dt = df.select(c).schema.head.dataType
    dt match {
      case StringType => c.isNull || c === ""
      case _: NumericType => c.isNull || c === 0
      case BooleanType => c.isNull || !c
      case _ => c.isNull
    }
  }

  /** Top-level argument scanner: whitespace separates, but a quoted
    * string or a (parenthesized call) — nested to any depth — is ONE
    * argument (Go's command word structure, same scanner shape as
    * ConditionFilter's). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    s.foreach { ch =>
      if (inQ) { cur += ch; if (ch == '"') inQ = false }
      else ch match {
        case '"' => cur += ch; inQ = true
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case c if c.isWhitespace && depth == 0 =>
          if (cur.nonEmpty) { out += cur.toString; cur.clear() }
        case c => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** One `{{ … }}` body → Column. */
  private def templateExpr(body: String, df: DataFrame): Column = {
    val toks = splitTopLevel(body.trim)
    def arg(t: String): Column =
      if (t.startsWith("(") && t.endsWith(")"))
        templateExpr(t.substring(1, t.length - 1).trim, df) // nested call
      else if (t.startsWith(".")) fieldRef(t, df)
      else if (t.startsWith("\"") && t.endsWith("\"")) lit(t.substring(1, t.length - 1))
      else scala.util.Try(lit(t.toLong)).getOrElse(
        scala.util.Try(lit(t.toDouble)).getOrElse(lit(t)))
    // static-int argument (template-compile-time constant, e.g. trunc/repeat)
    def argInt(t: String): Int = t.stripPrefix("\"").stripSuffix("\"").toInt
    def unquote(t: String): String = t.stripPrefix("\"").stripSuffix("\"")
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

      // ---- sprig surface (the reference registers sprig's whole FuncMap,
      //      template_value_render.go:41-44; this is the used subset) ----
      // branch values render as strings (the template output is a string
      // either way, and mixed-type branches must not ANSI-coerce)
      case Seq("default", d, v) =>
        when(isEmptyCol(arg(v), df), arg(d).cast("string"))
          .otherwise(arg(v).cast("string"))
      case Seq("ternary", t, f, c) =>
        when(!isEmptyCol(arg(c), df), arg(t).cast("string"))
          .otherwise(arg(f).cast("string"))
      case Seq("coalesce", xs @ _*) =>
        // sprig coalesce: first non-EMPTY (not merely non-null)
        xs.map(arg).foldRight(lit(null).cast("string"): Column)((c, acc) =>
          when(!isEmptyCol(c, df), c.cast("string")).otherwise(acc))
      case Seq("empty", a) => isEmptyCol(arg(a), df)
      case Seq("b64enc", a) => base64(arg(a).cast("string").cast("binary"))
      case Seq("b64dec", a) => unbase64(arg(a).cast("string")).cast("string")
      case Seq("trunc", n, s) =>
        // sprig v3 trunc: first n chars; negative n keeps the last -n
        val k = argInt(n)
        if (k >= 0) substring(arg(s).cast("string"), 1, k)
        else substring(arg(s).cast("string"), k, -k)
      case Seq("abbrev", n, s) =>
        val k = argInt(n)
        val c = arg(s).cast("string")
        // sprig: abbreviation needs room for "..." — maxWidth < 4 is a
        // no-op, not a truncate-to-negative
        if (k < 4) c
        else when(length(c) <= k, c)
          .otherwise(concat(substring(c, 1, k - 3), lit("...")))
      case Seq("substr", st, en, s) =>
        val (a0, b0) = (argInt(st), argInt(en))
        substring(arg(s).cast("string"), a0 + 1, b0 - a0)
      case Seq("repeat", n, s) =>
        repeat(arg(s).cast("string"), argInt(n))
      case Seq("quote", a) => concat(lit("\""), arg(a).cast("string"), lit("\""))
      case Seq("trimPrefix", p, s) =>
        // prefix through arg(): a field-ref prefix ({{trimPrefix .pfx
        // .msg}}) previously stripped the literal text ".pfx" — silently
        // wrong output
        val c = arg(s).cast("string")
        val pc = arg(p).cast("string")
        when(pc.isNotNull && c.startsWith(pc),
          c.substr(length(pc) + 1, length(c))).otherwise(c)
      case Seq("trimSuffix", sfx, s) =>
        val c = arg(s).cast("string")
        val sc = arg(sfx).cast("string")
        when(sc.isNotNull && c.endsWith(sc),
          c.substr(lit(1), length(c) - length(sc)))
          .otherwise(c)
      case Seq("add", xs @ _*) if xs.nonEmpty =>
        xs.map(arg(_).cast("long")).reduce(_ + _)
      case Seq("sub", a, b) => arg(a).cast("long") - arg(b).cast("long")
      case Seq("mul", xs @ _*) if xs.nonEmpty =>
        xs.map(arg(_).cast("long")).reduce(_ * _)
      case Seq("div", a, b) => (arg(a).cast("long") / arg(b).cast("long")).cast("long")
      case Seq("max", xs @ _*) if xs.nonEmpty =>
        if (xs.length == 1) arg(xs.head).cast("long")
        else greatest(xs.map(arg(_).cast("long")): _*)
      case Seq("min", xs @ _*) if xs.nonEmpty =>
        if (xs.length == 1) arg(xs.head).cast("long")
        else least(xs.map(arg(_).cast("long")): _*)
      case Seq("round", a, n) => round(arg(a).cast("double"), argInt(n))

      // ---- Go strings.* registered on top of sprig
      //      (template_value_render.go:46-51; Go argument order) ----
      case Seq("compare", a, b) =>
        when(arg(a).cast("string") < arg(b).cast("string"), lit(-1))
          .when(arg(a).cast("string") === arg(b).cast("string"), lit(0))
          .otherwise(lit(1))
      case Seq("contains", s, sub) =>
        arg(s).cast("string").contains(arg(sub).cast("string"))
      case Seq("containsAny", s, chars) =>
        val set = unquote(chars)
        if (set.isEmpty) lit(false)
        else set.map(ch => arg(s).cast("string")
          .contains(lit(ch.toString))).reduce(_ || _)
      case Seq("hasprefix", s, p) =>
        arg(s).cast("string").startsWith(arg(p).cast("string"))
      case Seq("hassuffix", s, p) =>
        arg(s).cast("string").endsWith(arg(p).cast("string"))
      case Seq("replace", s, o, n, cnt) =>
        // Go strings.Replace(s, old, new, n); n < 0 = all
        val k = argInt(cnt)
        val c = arg(s).cast("string")
        if (k < 0) replace(c, arg(o).cast("string"), arg(n).cast("string"))
        else {
          // the counted form splits on a compile-time pattern — a
          // field-ref old/new cannot compile to one, and silently
          // treating ".sep" as literal text is worse than refusing
          def litOnly(t: String, what: String): String = {
            if (t.startsWith(".") || t.startsWith("("))
              sys.error("template replace with a count needs a LITERAL " +
                s"$what — field refs are only supported with count -1")
            unquote(t)
          }
          concat_ws(litOnly(n, "replacement"),
            split(c, java.util.regex.Pattern.quote(litOnly(o, "old")), k + 1))
        }

      // ---- sprig date math over Go durations ----
      case Seq("dateModify", d, t) =>
        val secs = graft.conditions.GoDuration.parseSeconds(unquote(d))
        timestamp_seconds(unix_timestamp(arg(t).cast("timestamp")) + lit(secs.toLong))
      case Seq("date", f, t) =>
        date_format(arg(t).cast("timestamp"),
          graft.filters.GoTimeLayout.translate(unquote(f)))

      // ---- sprig list family (splitList's array<string> is the template
      //      list type; nested calls compose — `join "," (uniq (splitList
      //      " " .msg))`) ----
      case Seq("splitList", sep, s) =>
        // sprig splitList = Go strings.Split: LITERAL separator, -1 limit
        // (trailing empties kept)
        split(arg(s).cast("string"),
          java.util.regex.Pattern.quote(unquote(sep)), -1)
      case Seq("join", sep, l) =>
        array_join(arg(l).cast("array<string>"), unquote(sep))
      case Seq("first", l) => get(arg(l).cast("array<string>"), lit(0))
      case Seq("last", l) =>
        val c = arg(l).cast("array<string>")
        get(c, size(c) - 1)
      case Seq("uniq", l) =>
        // sprig uniq keeps first-occurrence order — array_distinct's order
        array_distinct(arg(l).cast("array<string>"))

      // ---- sprig regex family: RE2 patterns translate to Java (named
      //      groups `(?P<x>` → `(?<x>`; the rest of RE2's surface is a
      //      Java sub-dialect at these call sites); Go replacement
      //      `$name` refs translate to Java `${name}` ----
      case Seq("regexMatch", re, s) =>
        arg(s).cast("string").rlike(goRegexToJava(unquote(re)))
      case Seq("regexFind", re, s) =>
        regexp_extract(arg(s).cast("string"),
          "(" + goRegexToJava(unquote(re)) + ")", 1)
      case Seq("regexReplaceAll", re, s, repl) =>
        regexp_replace(arg(s).cast("string"), goRegexToJava(unquote(re)),
          goReplacementToJava(unquote(repl)))

      // ---- sprig checksum family ----
      case Seq("sha1sum", a) => sha1(arg(a).cast("string").cast("binary"))
      case Seq("sha256sum", a) => sha2(arg(a).cast("string").cast("binary"), 256)
      case Seq("md5sum", a) => md5(arg(a).cast("string").cast("binary"))

      case other =>
        // every sprig name beyond the implemented subset fails AT PLAN
        // TIME with the full supported list — a migrating config learns
        // its delta on the first compile, never mid-job (reference
        // registers all of sprig, template_value_render.go:41-44)
        val name = other.headOption.getOrElse("")
        sys.error(s"unsupported template function '$name' in '${other
          .mkString(" ")}' (supported: ${SupportedTemplateFns.mkString(", ")})")
    }
  }

  /** The implemented template-function surface (kept in sync with
    * templateExpr's match arms — RenderSpec pins membership). */
  val SupportedTemplateFns: Seq[String] = Seq(
    "now", "timestamp", "plus", "minus", "multiply", "divide", "mod",
    "timeFormat", "upper", "lower", "trim", "title", "default", "ternary",
    "coalesce", "empty", "b64enc", "b64dec", "trunc", "abbrev", "substr",
    "repeat", "quote", "trimPrefix", "trimSuffix", "add", "sub", "mul",
    "div", "max", "min", "round", "compare", "contains", "containsAny",
    "hasprefix", "hassuffix", "replace", "dateModify", "date", "splitList",
    "join", "first", "last", "uniq", "regexMatch", "regexFind",
    "regexReplaceAll", "sha1sum", "sha256sum", "md5sum").sorted

  /** RE2 pattern → Java: the one syntactic difference at these call
    * sites is named groups — RE2 `(?P<name>`, Java `(?<name>`. */
  private def goRegexToJava(re: String): String =
    re.replace("(?P<", "(?<")

  /** Go regexp replacement syntax → Java: Go allows bare `$name` /
    * `$1` group refs and `$$` for a literal dollar; Java needs `${name}`
    * for named groups (numeric `$1` is shared). */
  private def goReplacementToJava(repl: String): String =
    """\$\$|\$\{?([A-Za-z_][A-Za-z0-9_]*|\d+)\}?|\$""".r
      .replaceAllIn(repl, m =>
        java.util.regex.Matcher.quoteReplacement(
          if (m.matched == "$$") "\\$"
          // a lone `$` (end of string / before a non-name char) is a
          // literal dollar — unescaped it throws Java's "Illegal group
          // reference" at row-evaluation time
          else if (m.matched == "$") "\\$"
          else if (m.group(1).forall(_.isDigit)) "$" + m.group(1)
          else "${" + m.group(1) + "}"))

  /** Logstash/ES index pattern: `prefix-%{field}-%{+YYYY.MM.dd}`. */
  private def indexPattern(spec: String, tsColumn: String)(df: DataFrame): Column = {
    // a %-ref is a RUN of {…} groups (reference index_render.go:69
    // `%({.*?})+`): one group is a plain field, several are ONE
    // multi-level path — `web-%{@metadata}{kafka}{topic}` is the
    // decorate_events per-topic-index idiom
    val seg = """%((?:\{[^{}]*\})+)""".r
    val groupsOf = """\{([^{}]*)\}""".r
    val parts = scala.collection.mutable.ArrayBuffer[Column]()
    var last = 0
    for (m <- seg.findAllMatchIn(spec)) {
      if (m.start > last) parts += lit(spec.substring(last, m.start))
      val groups = groupsOf.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      val body =
        if (groups.length == 1) groups.head
        else "" // multi-group: handled below, body unused
      if (groups.length > 1) {
        parts += FieldPath.resolveSegs(df, groups.map(FieldPath.Key))
          .map { case (c, t) => stringFieldOrNull(c, t) }
          .getOrElse(lit("null"))
      } else if (body.startsWith("+")) {
        // the reference renders %{+…} with GO reference-time layouts
        // (value_render/index_render.go:118 `t.Format(format)`; the
        // README's own example is 'web-%{+2006-01-02}') — a digit marks
        // a Go layout (Joda/Logstash tokens are all letters, kept as a
        // compat shim). Rendering the Go layout as a Java pattern
        // emitted the layout text verbatim — the r17 reference-parity
        // e2e spec caught every index named literally "web-2006-01-02".
        val raw = body.stripPrefix("+")
        // letter-only Go layouts (%{+Jan}, %{+Monday}, %{+MST}, %{+PM})
        // carry no digit — the digit heuristic alone misrouted them to
        // the Joda shim, which emitted the token verbatim as an (invalid
        // or wrong) DateTimeFormatter pattern (r17 ADVICE). Whole
        // letter-RUN equality, not substring containment: a digitless
        // pattern merely CONTAINING 'pm'/'Mon' inside a longer literal
        // run is not a Go layout and must keep the Joda path (r18
        // review finding).
        val letterRuns = "[A-Za-z]+".r.findAllIn(raw).toSeq
        val fmt =
          if (raw.exists(_.isDigit) ||
              letterRuns.exists(graft.filters.GoTimeLayout.letterTokens.contains))
            graft.filters.GoTimeLayout.translate(raw)
          else jodaToJava(raw)
        val ts = FieldPath.resolve(df, tsColumn).getOrElse(current_timestamp())
        parts += date_format(ts, fmt)
      } else {
        // a missing or null FIELD renders as the literal "null" — the
        // reference's documented compat behavior (index_render.go:28-30
        // "always use null as a result when err is not nil"; its own
        // test expects app-null-2022.03.04-log). Template rendering
        // ({{.missing}} → "") is a different renderer with different
        // reference semantics — only index patterns say "null".
        parts += FieldPath.resolveTyped(df, body)
          .map { case (c, t) => stringFieldOrNull(c, t) }
          .getOrElse(lit("null"))
      }
      last = m.end
    }
    if (last < spec.length) parts += lit(spec.substring(last))
    // per-part coalesce: a null date part must still render as "" rather
    // than nulling the WHOLE index name (a null _index bounces the bulk
    // request); field parts already coalesced to "null" above
    if (parts.isEmpty) lit("")
    else concat(parts.map(coalesce(_, lit(""))).toSeq: _*)
  }

  /** A %{field} index part renders its value only when the field IS a
    * string; a present non-string value renders the literal "null" like
    * missing/null fields do — the reference's errNotString contract
    * (index_render.go: the value must assert to string). Stringifying
    * would arguably be nicer, but it would route events with numeric
    * index fields to different indices than the reference (r17 ADVICE). */
  private def stringFieldOrNull(c: Column, t: org.apache.spark.sql.types.DataType): Column =
    t match {
      case org.apache.spark.sql.types.StringType => coalesce(c, lit("null"))
      case _ => lit("null")
    }

  /** ES index patterns use Joda-style tokens; Java's week-based `Y`/`w`
    * differ — translate the common ones. */
  private def jodaToJava(fmt: String): String =
    fmt.replace("YYYY", "yyyy").replace("YY", "yy")
}
