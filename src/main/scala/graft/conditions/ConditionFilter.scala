package graft.conditions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.paths.FieldPath

/** The reference's condition DSL compiled to a Catalyst `Column` predicate.
  *
  * Grammar (reference: condition_filter/parse.go:27-190, filter.go:628-741):
  * atoms `Exist(a,b)`, `EQ(a,b,v)`, `IN(f,v)`, `HasPrefix/HasSuffix/
  * Contains(f,"s")`, `ContainsAny(f,"chars")`, `Match(f,re)`, `Random(n)`,
  * `Before(dur)`, `After(dur)` combined with `&&`, `||`, `!` and parens.
  * Field forms: bare / `[a][b]` multi-level / `$.jsonpath`. String literals
  * are double-quoted; unquoted values parse as int/float; `nil` tests null.
  *
  * Everything compiles at plan time to built-in expressions — Catalyst then
  * simplifies, pushes the predicate into the scan, and folds statically-
  * missing fields (which compile to `lit(false)`, the reference's
  * missing-key result) out of the plan entirely. At 100 TB this matters:
  * an `EQ` on a parquet column becomes a row-group skip, not a row filter.
  *
  * Known deviation: a struct field that is present-but-null is
  * indistinguishable from absent in a schema-ful world; `Exist` maps to
  * `isNotNull` (exact for map columns via `map_contains_key`).
  */
object ConditionFilter {

  /** Compile a DSL string against a concrete DataFrame's schema. */
  def compile(dsl: String, df: DataFrame, tsColumn: String = "@timestamp"): Column = {
    val t = dsl.trim
    if (t.startsWith("{{")) templateCondition(t, df, tsColumn)
    else new Compiler(df, tsColumn).parseBoolTree(t)
  }

  private val TplExist = """^\{\{\s*if\s+(\.[\w.@-]+)\s*\}\}y\{\{\s*end\s*\}\}$""".r
  private val TplEqStr =
    """^\{\{\s*if\s+eq\s+(\.[\w.@-]+)\s+"([^"]*)"\s*\}\}y\{\{\s*end\s*\}\}$""".r
  private val TplEqNum =
    """^\{\{\s*if\s+eq\s+(\.[\w.@-]+)\s+([-0-9.]+)\s*\}\}y\{\{\s*end\s*\}\}$""".r


  /** Template conditions (reference: condition_filter/filter.go:23-41 —
    * render the Go template, pass when the result equals "y").
    *
    * Three regex fast paths cover the documented forms; beyond them the
    * RENDER-AND-COMPARE fallback mirrors the reference exactly: the
    * template — `{{if COND}}…{{else if COND}}…{{else}}…{{end}}` blocks
    * nested to any depth, interleaved with literals and `{{.field}}` /
    * template-function interpolation — compiles recursively to ONE string
    * Column (each if-block becomes a `when(cond, then).otherwise(else)`),
    * and the condition passes iff the rendered string is "y". COND
    * supports Go truthiness, the six template comparisons, not,
    * contains/hasprefix/hassuffix, the reference's before/after event-
    * time predicates (value_render/template_value_render.go:69-95), and
    * Go-template prefix calls `and`/`or` over parenthesized pipelines
    * nested to any depth — `{{if or (before . "-24h") (after . "24h")}}`,
    * the README's own example (reference README.md:604), compiles to one
    * boolean Column tree. */
  private def templateCondition(t: String, df: DataFrame,
      tsColumn: String = "@timestamp"): Column = {
    def path(p: String): Column =
      graft.paths.FieldPath.resolveSegs(df,
        p.stripPrefix(".").split('.').toSeq.map(graft.paths.FieldPath.Key))
        .map(_._1).getOrElse(lit(null))
    // Go-template truthiness by the RESOLVED column type (Go treats the
    // type's zero value as false): booleans are themselves, numbers
    // compare against 0, strings against "" — so string "0" is truthy
    // (non-empty) while numeric 0 and boolean false are not, exactly as
    // a Go template over a parsed JSON event behaves. A path that ends
    // inside a JSON OVERFLOW column yields the string IMAGE of a parsed
    // scalar (get_json_object) — there the image gets value semantics:
    // "0"/"0.0" read as the number zero (falsy, like the reference's
    // float64 0), "false" as boolean false; a json STRING "0" is
    // indistinguishable from the number and also reads falsy (documented
    // divergence, the number case is overwhelmingly the common one).
    def truthy(p: String): Column =
      graft.paths.FieldPath.resolveSegsDetailed(df,
        p.stripPrefix(".").split('.').toSeq.map(graft.paths.FieldPath.Key)) match {
        case None => lit(false)
        case Some((c, _, true)) =>
          // try_cast, not cast: a non-numeric image ("true", "abc")
          // must fall through to the non-empty-string arm, not throw
          // under ANSI mode. "[]"/"{}" — the images of a parsed empty
          // array/object — read falsy like Go's zero-length slice/map
          // (a json STRING "[]" is indistinguishable from the array and
          // also reads falsy; same documented-divergence class as "0")
          c.isNotNull && c =!= "" && c =!= "false" &&
            c =!= "[]" && c =!= "{}" &&
            !coalesce(c.try_cast("double") === 0.0, lit(false))
        case Some((c, dt, false)) =>
          import org.apache.spark.sql.types._
          dt match {
            case BooleanType => coalesce(c, lit(false))
            case _: NumericType => c.isNotNull && c =!= lit(0)
            case NullType => lit(false)
            // Go's IsTrue: zero-length slice/map is falsy
            case _: ArrayType | _: MapType => c.isNotNull && size(c) > 0
            case _ => c.isNotNull && c.cast("string") =!= ""
          }
      }
    // Top-level argument split: whitespace separates, but a quoted
    // string or a (parenthesized pipeline) — nested to any depth — is
    // ONE argument, exactly Go's command/pipeline word structure.
    def splitTopLevel(s: String): Seq[String] = {
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
    def condExpr(body: String): Column = {
      val toks = splitTopLevel(body.trim)
      def isQuoted(x: String) = x.startsWith("\"") && x.endsWith("\"")
      def isNum(x: String) = scala.util.Try(x.toDouble).isSuccess
      def isParen(x: String) = x.startsWith("(") && x.endsWith(")")
      // one and/or/not argument as a boolean: a parenthesized pipeline
      // recurses, a path takes Go truthiness, a literal is its own
      // zero-value truthiness (Go folds these statically)
      def argCond(x: String): Column =
        if (isParen(x)) condExpr(x.substring(1, x.length - 1).trim)
        else if (x.startsWith(".")) truthy(x)
        else if (isQuoted(x)) lit(x.length > 2)
        else if (isNum(x)) lit(x.toDouble != 0.0)
        else sys.error(s"unsupported and/or/not argument '$x' in " +
          s"template if-condition")
      def unq(x: String) =
        if (isQuoted(x)) x.substring(1, x.length - 1) else x
      def cmp(a: String, b: String)(f: (Column, Column) => Column): Column =
        if (isQuoted(a) || isQuoted(b)) {
          def s(x: String) =
            if (isQuoted(x)) lit(x.substring(1, x.length - 1)) else path(x).cast("string")
          f(s(a), s(b))
        } else if (isNum(a) || isNum(b)) {
          def n(x: String) = if (isNum(x)) lit(x.toDouble) else path(x).cast("double")
          f(n(a), n(b))
        } else f(path(a), path(b))
      // Go ≥1.18 template `and`/`or` SHORT-CIRCUIT left to right, and an
      // evaluation error (a nil comparison — SQL NULL here) in any arm
      // that IS reached aborts the whole render; the reference treats a
      // render error as condition-false (Render returns err,
      // template_value_render.go:154 → not "y"). Model error as NULL:
      // examine arms left to right; a NULL arm yields NULL (the error
      // propagates outward through enclosing and/or/not), a DECIDING arm
      // stops (so a later arm's error is never reached — Go's
      // short-circuit), else continue. `compile` coalesces the final
      // template condition to false, the render-error → drop path.
      def shortCircuit(arms: Seq[Column], isOr: Boolean): Column = {
        val errNull = lit(null).cast(BooleanType)
        arms.foldRight(lit(!isOr): Column) { (a, rest) =>
          if (isOr) when(a.isNull, errNull).when(a, lit(true)).otherwise(rest)
          else when(a.isNull, errNull).when(!a, lit(false)).otherwise(rest)
        }
      }
      toks match {
        case Seq(p) if p.startsWith(".") => truthy(p)
        case Seq(p) if isParen(p) => argCond(p)
        case Seq("and", rest @ _*) if rest.nonEmpty =>
          shortCircuit(rest.map(argCond), isOr = false)
        case Seq("or", rest @ _*) if rest.nonEmpty =>
          shortCircuit(rest.map(argCond), isOr = true)
        case Seq("not", x) if isParen(x) || x.startsWith(".") => !argCond(x)
        // reference event-time predicates (template_value_render.go:69-95):
        // before/after compare the event's @timestamp against now+duration;
        // a missing/non-timestamp field is false, like the reference's
        // reflection guard
        case Seq("before", ".", d) =>
          tsTemplateCompare(df, tsColumn, unq(d), before = true)
        case Seq("after", ".", d) =>
          tsTemplateCompare(df, tsColumn, unq(d), before = false)
        case Seq("not", rest @ _*) => !condExpr(rest.mkString(" "))
        case Seq("eq", a, b) => cmp(a, b)(_ === _)
        case Seq("ne", a, b) => cmp(a, b)(_ =!= _)
        case Seq("lt", a, b) => cmp(a, b)(_ < _)
        case Seq("le", a, b) => cmp(a, b)(_ <= _)
        case Seq("gt", a, b) => cmp(a, b)(_ > _)
        case Seq("ge", a, b) => cmp(a, b)(_ >= _)
        case Seq("contains", s, sub) =>
          cmp(s, sub)((a, b) => a.cast("string").contains(b.cast("string")))
        case Seq("hasprefix", s, p) =>
          cmp(s, p)((a, b) => a.cast("string").startsWith(b.cast("string")))
        case Seq("hassuffix", s, p) =>
          cmp(s, p)((a, b) => a.cast("string").endsWith(b.cast("string")))
        case other =>
          sys.error(s"unsupported template if-condition '${other.mkString(" ")}'")
      }
    }
    // Top-level coalesce: a NULL here is the image of a Go render error
    // (nil comparison somewhere in the evaluated arm prefix), and the
    // reference's error path yields not-"y" → condition false. Without
    // it, SQL three-valued logic would let a consumer's `when`/`&&` treat
    // the error row inconsistently.
    t match {
      case TplExist(p) => truthy(p)
      case TplEqStr(p, s) =>
        coalesce(path(p).cast("string") === lit(s), lit(false))
      case TplEqNum(p, n) =>
        coalesce(path(p).cast("double") === lit(n.toDouble), lit(false))
      case other =>
        coalesce(renderTemplate(other, df, condExpr), lit("")) === "y"
    }
  }

  /** Shared event-time compare for the template `before`/`after`
    * predicates — identical semantics to the DSL's Before/After atoms
    * (Compiler.tsCompare): event ts </> now + Go duration, false when
    * the timestamp column is missing or not a timestamp. */
  private def tsTemplateCompare(df: DataFrame, tsColumn: String,
      dur: String, before: Boolean): Column = {
    val secs = GoDuration.parseSeconds(dur)
    val bound = current_timestamp() +
      make_dt_interval(lit(0), lit(0), lit(0), lit(secs))
    FieldPath.resolveTyped(df, tsColumn) match {
      case Some((c, TimestampType)) => if (before) c < bound else c > bound
      case _ => lit(false)
    }
  }

  // --- recursive Go-template-subset renderer ---------------------------------

  private sealed trait TTok
  private final case class TText(s: String) extends TTok
  private final case class TAction(body: String) extends TTok

  /** Split a template into literal runs and `{{…}}` action bodies (same
    * action regex as Render.template — `}` cannot appear inside one). */
  private def tokenizeTemplate(t: String): Vector[TTok] = {
    val seg = """\{\{\s*([^}]+?)\s*\}\}""".r
    val out = Vector.newBuilder[TTok]
    var last = 0
    for (m <- seg.findAllMatchIn(t)) {
      if (m.start > last) out += TText(t.substring(last, m.start))
      out += TAction(m.group(1))
      last = m.end
    }
    if (last < t.length) out += TText(t.substring(last))
    out.result()
  }

  /** Render a template to one string Column: literals stay literals,
    * non-if actions go through the shared Render machinery ({{.field}}
    * interpolation, template functions), and every
    * `{{if}}…{{else if}}…{{else}}…{{end}}` block — nested to any depth —
    * compiles to `when(cond, then).otherwise(else)`. A null condition
    * from plain truthiness (missing field) takes the else branch,
    * matching Go's zero-value behavior. A null from an ERRORING
    * comparison (nil arm) also takes the else branch here, whereas Go
    * aborts the whole render (condition false): the two agree whenever
    * the else arm doesn't itself render "y" — the universal shape — and
    * the top-level and/or/not error path is exact (see shortCircuit). */
  private def renderTemplate(t: String, df: DataFrame,
      condExpr: String => Column): Column = {
    val toks = tokenizeTemplate(t)

    def concatParts(parts: Vector[Column]): Column =
      if (parts.isEmpty) lit("")
      else if (parts.length == 1) coalesce(parts.head, lit(""))
      else concat(parts.map(coalesce(_, lit(""))): _*)

    // `else   if` / `if\t.x` with any internal whitespace are valid in
    // Go's parser — keyword matching is whitespace-kind-agnostic
    val ElseIf = """^else\s+if\s+(.*)$""".r
    val If = """^if\s+(.*)$""".r
    def isTerminator(b: String): Boolean =
      b == "else" || b == "end" || ElseIf.matches(b)

    // renders tokens from `pos` until a terminator action or the end;
    // returns (rendered, index of the terminator or toks.length)
    def renderUntil(pos: Int): (Column, Int) = {
      var parts = Vector.empty[Column]
      var i = pos
      while (i < toks.length) {
        toks(i) match {
          case TText(s) => parts :+= lit(s); i += 1
          case TAction(b @ If(_)) =>
            val If(cond) = b: @unchecked
            val (c, next) = parseIf(cond.trim, i + 1)
            parts :+= c
            i = next
          case TAction(b) if isTerminator(b) =>
            return (concatParts(parts), i)
          case TAction(other) =>
            parts :+= graft.render.Render.compile(s"{{$other}}")(df).cast("string")
            i += 1
        }
      }
      (concatParts(parts), i)
    }

    // `pos` is the first token after an if/else-if action; consumes
    // through the block's shared {{end}} and returns (rendered, after-end)
    def parseIf(cond: String, pos: Int): (Column, Int) = {
      val (thenC, term) = renderUntil(pos)
      toks.lift(term) match {
        case Some(TAction("end")) =>
          (when(condExpr(cond), thenC).otherwise(lit("")), term + 1)
        case Some(TAction("else")) =>
          val (elseC, term2) = renderUntil(term + 1)
          toks.lift(term2) match {
            case Some(TAction("end")) =>
              (when(condExpr(cond), thenC).otherwise(elseC), term2 + 1)
            case _ => sys.error(
              s"unsupported template condition '$t' ({{else}} without {{end}})")
          }
        case Some(TAction(ElseIf(cond2))) =>
          // Go's chained form: the else-if opens a new conditional that
          // shares this block's {{end}}
          val (elseC, next) = parseIf(cond2.trim, term + 1)
          (when(condExpr(cond), thenC).otherwise(elseC), next)
        case _ => sys.error(
          s"unsupported template condition '$t' ({{if}} without {{end}})")
      }
    }

    val (rendered, end) = renderUntil(0)
    if (end != toks.length) sys.error(
      s"unsupported template condition '$t' (unbalanced {{else}}/{{end}})")
    rendered
  }

  /** Late-bound form for pipeline composition. */
  def predicate(dsl: String, tsColumn: String = "@timestamp"): DataFrame => Column =
    df => compile(dsl, df, tsColumn)

  // ----- parser ------------------------------------------------------------

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok
  private final case class Atom(text: String) extends Tok

  private final class Compiler(df: DataFrame, tsColumn: String) {

    def parseBoolTree(c: String): Column = {
      if (c.isEmpty) return lit(true)
      val rpn = toRpn(tokenize(c))
      val stack = scala.collection.mutable.Stack[Column]()
      rpn.foreach {
        case Atom(t) => stack.push(compileAtom(t))
        case NotOp => stack.push(!stack.pop())
        case AndOp => val r = stack.pop(); val l = stack.pop(); stack.push(l && r)
        case OrOp => val r = stack.pop(); val l = stack.pop(); stack.push(l || r)
        case other => sys.error(s"unexpected token $other")
      }
      require(stack.size == 1, s"could not parse condition: '$c'")
      stack.pop()
    }

    /** State machine mirroring the reference's tokenizer: an atom starts at
      * a letter outside any condition and ends at its balancing ')'; quotes
      * shield parens/operators inside atom args. */
    private def tokenize(c: String): Seq[Tok] = {
      val out = scala.collection.mutable.ArrayBuffer[Tok]()
      var i = 0
      val n = c.length
      while (i < n) {
        c.charAt(i) match {
          case ' ' | '\t' | '\n' => i += 1
          case '(' => out += LParen; i += 1
          case ')' => out += RParen; i += 1
          case '!' => out += NotOp; i += 1
          case '&' =>
            require(i + 1 < n && c.charAt(i + 1) == '&', s"stray '&' at $i in '$c'")
            out += AndOp; i += 2
          case '|' =>
            require(i + 1 < n && c.charAt(i + 1) == '|', s"stray '|' at $i in '$c'")
            out += OrOp; i += 2
          case ch if ch.isLetter =>
            val start = i
            var depth = 0
            var inStr = false
            var done = false
            while (i < n && !done) {
              val x = c.charAt(i)
              if (inStr) { if (x == '"') inStr = false }
              else x match {
                case '"' => inStr = true
                case '(' => depth += 1
                case ')' =>
                  depth -= 1
                  if (depth == 0) done = true
                case _ =>
              }
              i += 1
            }
            require(done, s"unterminated condition at $start in '$c'")
            out += Atom(c.substring(start, i))
          case ch => sys.error(s"unexpected char '$ch' at $i in '$c'")
        }
      }
      out.toSeq
    }

    /** Shunting-yard: ! > && > ||. */
    private def toRpn(toks: Seq[Tok]): Seq[Tok] = {
      def prec(t: Tok): Int = t match {
        case NotOp => 3
        case AndOp => 2
        case OrOp => 1
        case _ => 0
      }
      val out = scala.collection.mutable.ArrayBuffer[Tok]()
      val ops = scala.collection.mutable.Stack[Tok]()
      toks.foreach {
        case a: Atom => out += a
        case LParen => ops.push(LParen)
        case RParen =>
          while (ops.nonEmpty && ops.top != LParen) out += ops.pop()
          require(ops.nonEmpty, "unbalanced parentheses")
          ops.pop()
        case op =>
          while (ops.nonEmpty && ops.top != LParen && prec(ops.top) >= prec(op))
            out += ops.pop()
          ops.push(op)
      }
      while (ops.nonEmpty) {
        require(ops.top != LParen, "unbalanced parentheses")
        out += ops.pop()
      }
      out.toSeq
    }

    // ----- atoms -----------------------------------------------------------

    private val AtomRe = """^(\w+)\((.*)\)$""".r

    private def compileAtom(text: String): Column = text.trim match {
      case AtomRe(name, args) => name match {
        case "Exist" => exist(splitArgs(args))
        case "EQ" => eq(splitArgs(args))
        case "IN" => in(splitArgs(args))
        case "HasPrefix" => strTest(splitArgs(args), (c, s) => c.startsWith(s))
        case "HasSuffix" => strTest(splitArgs(args), (c, s) => c.endsWith(s))
        case "ContainsAny" => containsAny(splitArgs(args))
        case "Contains" => strTest(splitArgs(args), (c, s) => c.contains(s))
        case "Match" => matchRe(splitArgs(args))
        case "Random" => rand() * lit(args.trim.toInt) < 1
        case "Before" => tsCompare(args.trim, before = true)
        case "After" => tsCompare(args.trim, before = false)
        case other => sys.error(s"unknown condition '$other'")
      }
      case other => sys.error(s"malformed condition '$other'")
    }

    /** Split atom args on top-level commas (quotes shield commas — strictly
      * more permissive than the reference's plain split). */
    private def splitArgs(args: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val cur = new StringBuilder
      var inStr = false
      args.foreach {
        case '"' => inStr = !inStr; cur += '"'
        case ',' if !inStr => out += cur.result().trim; cur.clear()
        case ch => cur += ch
      }
      out += cur.result().trim
      out.toSeq
    }

    /** Path args: either one jsonpath `$.…` arg or N path segments. */
    private def pathOf(segs: Seq[String]): Option[(Column, DataType)] =
      if (segs.length == 1) FieldPath.resolveTyped(df, segs.head)
      else FieldPath.resolveSegs(df, segs.map(FieldPath.Key))

    private sealed trait Lit
    private final case class SLit(s: String) extends Lit
    private case object NilLit extends Lit
    private final case class ILit(v: Long) extends Lit
    private final case class FLit(v: Double) extends Lit

    private def parseLit(v: String): Lit =
      if (v.length >= 2 && v.head == '"' && v.last == '"') SLit(v.substring(1, v.length - 1))
      else if (v == "nil") NilLit
      else if (v.contains(".")) FLit(v.toDouble)
      else ILit(java.lang.Long.decode(v))

    private def exist(segs: Seq[String]): Column = {
      // exact semantics for a map final step; isNotNull otherwise
      if (segs.length > 1) {
        val parent = FieldPath.resolveSegs(df, segs.init.map(FieldPath.Key))
        parent match {
          case Some((pc, mt: MapType)) =>
            val _ = mt
            return pc.isNotNull && map_contains_key(pc, lit(segs.last))
          case _ =>
        }
      }
      pathOf(segs).map(_._1.isNotNull).getOrElse(lit(false))
    }

    private def eq(args: Seq[String]): Column = {
      require(args.length >= 2, s"EQ needs path and value")
      val target = parseLit(args.last)
      pathOf(args.init) match {
        case None => lit(false)
        case Some((c, t)) => (target, t) match {
          case (NilLit, _) => c.isNull
          case (SLit(s), StringType) => c === lit(s)
          case (SLit(_), _) => lit(false) // typed compare: string vs non-string
          case (ILit(v), StringType | LongType | IntegerType | ShortType |
                ByteType | DoubleType | FloatType | _: DecimalType) =>
            c.try_cast("double") === lit(v.toDouble)
          case (FLit(v), StringType | LongType | IntegerType | ShortType |
                ByteType | DoubleType | FloatType | _: DecimalType) =>
            c.try_cast("double") === lit(v)
          case _ => lit(false)
        }
      }
    }

    private def in(args: Seq[String]): Column = {
      require(args.length >= 2, "IN needs path and value")
      val target = parseLit(args.last)
      pathOf(args.init) match {
        case None => lit(false)
        case Some((c, at: ArrayType)) => (target, at.elementType) match {
          case (SLit(s), StringType) => array_contains(c, s)
          case (SLit(_), _) => lit(false)
          case (ILit(v), _) => arrNumContains(c, at.elementType, v.toDouble)
          case (FLit(v), _) => arrNumContains(c, at.elementType, v)
          case (NilLit, _) => exists(c, _.isNull)
        }
        case Some((c, StringType)) => // JSON array in a string column
          target match {
            case SLit(s) =>
              array_contains(from_json(c, ArrayType(StringType)), s)
            case ILit(v) =>
              array_contains(from_json(c, ArrayType(DoubleType)), v.toDouble)
            case FLit(v) =>
              array_contains(from_json(c, ArrayType(DoubleType)), v)
            case NilLit => lit(false)
          }
        case _ => lit(false)
      }
    }

    private def arrNumContains(c: Column, elem: DataType, v: Double): Column =
      elem match {
        case LongType | IntegerType | ShortType | ByteType | DoubleType |
             FloatType | _: DecimalType | StringType =>
          exists(c, e => e.try_cast("double") === lit(v))
        case _ => lit(false)
      }

    private def strTest(args: Seq[String], f: (Column, String) => Column): Column = {
      require(args.length >= 2, "string test needs path and value")
      val s = parseLit(args.last) match {
        case SLit(x) => x
        case other => sys.error(s"string test needs a quoted string, got $other")
      }
      pathOf(args.init) match {
        case Some((c, StringType)) => c.isNotNull && f(c, s)
        case _ => lit(false)
      }
    }

    private def containsAny(args: Seq[String]): Column = {
      require(args.length >= 2, "ContainsAny needs path and chars")
      val chars = parseLit(args.last) match {
        case SLit(x) => x
        case other => sys.error(s"ContainsAny needs a quoted string, got $other")
      }
      pathOf(args.init) match {
        case Some((c, StringType)) =>
          // Go strings.ContainsAny(s, "") is ALWAYS false — an empty
          // char set compiled to rlike("()"), which matches everything
          if (chars.isEmpty) lit(false)
          else {
            val cls = chars.map(ch =>
              java.util.regex.Pattern.quote(ch.toString)).mkString("|")
            c.isNotNull && c.rlike(s"($cls)")
          }
        case _ => lit(false)
      }
    }

    private def matchRe(args: Seq[String]): Column = {
      require(args.length >= 2, "Match needs path and regex")
      // regex may be bare (reference style) or double-quoted;
      // Go RE2 named groups (?P<x>…) → Java (?<x>…)
      val raw = args.last
      val unquoted =
        if (raw.length >= 2 && raw.head == '"' && raw.last == '"')
          raw.substring(1, raw.length - 1)
        else raw
      val re = unquoted.replace("(?P<", "(?<")
      pathOf(args.init) match {
        case Some((c, StringType)) => c.isNotNull && c.rlike(re)
        case _ => lit(false)
      }
    }

    private def tsCompare(dur: String, before: Boolean): Column = {
      val secs = GoDuration.parseSeconds(dur)
      val bound = current_timestamp() + make_dt_interval(lit(0), lit(0), lit(0), lit(secs))
      FieldPath.resolveTyped(df, tsColumn) match {
        case Some((c, TimestampType)) => if (before) c < bound else c > bound
        case _ => lit(false)
      }
    }
  }
}
