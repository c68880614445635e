package graft.conditions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Mirrors the reference's DSL test corpus
  * (reference: condition_filter/filter_test.go). */
class ConditionFilterSpec extends SparkSpec {

  test("template conditions: truthiness and eq forms") {
    import spark.implicits._
    val df = Seq(("app", 20L, ""), ("web", 0L, "x")).toDF("name", "age", "tag")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    assert(run("""{{if .name}}y{{end}}""") == Set("app", "web"))
    assert(run("""{{if .tag}}y{{end}}""") == Set("web"))
    assert(run("""{{if eq .name "app"}}y{{end}}""") == Set("app"))
    assert(run("""{{if eq .age 20}}y{{end}}""") == Set("app"))
  }

  test("template conditions: render-and-compare beyond the documented fast paths") {
    import spark.implicits._
    val df = Seq(("app", 20L, "", "y"), ("web", 0L, "x", "n"),
      ("worker-api", 35L, "err", "y")).toDF("name", "age", "tag", "flag")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // comparisons beyond eq (reference renders the template, passes on "y")
    assert(run("""{{if gt .age 20}}y{{end}}""") == Set("worker-api"))
    assert(run("""{{if le .age 20}}y{{end}}""") == Set("app", "web"))
    assert(run("""{{if ne .name "web"}}y{{end}}""") == Set("app", "worker-api"))
    // explicit else branch: pass only where the RENDERED result is "y"
    assert(run("""{{if eq .name "web"}}n{{else}}y{{end}}""") == Set("app", "worker-api"))
    // negation and registered string predicates inside if
    assert(run("""{{if not .tag}}y{{end}}""") == Set("app"))
    assert(run("""{{if hasprefix .name "worker"}}y{{end}}""") == Set("worker-api"))
    assert(run("""{{if contains .name "e"}}y{{end}}""") == Set("web", "worker-api"))
    // branch bodies render through the template machinery: the field's
    // own value decides the pass
    assert(run("""{{if .name}}{{.flag}}{{else}}n{{end}}""") == Set("app", "worker-api"))
    // flat template with no if at all — render the field, compare to "y"
    assert(run("""{{.flag}}""") == Set("app", "worker-api"))
  }

  test("template and/or prefix pipelines with parenthesized conditions") {
    import spark.implicits._
    val df = Seq(("app", 20L, "", "y"), ("web", 0L, "x", "n"),
      ("worker-api", 35L, "err", "y")).toDF("name", "age", "tag", "flag")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // Go template prefix calls: and/or over parenthesized pipelines
    assert(run("""{{if and (gt .age 10) (eq .flag "y")}}y{{end}}""")
      == Set("app", "worker-api"))
    assert(run("""{{if or (eq .name "web") (gt .age 30)}}y{{end}}""")
      == Set("web", "worker-api"))
    // bare-path and literal arguments follow Go truthiness
    assert(run("""{{if and .tag (gt .age 10)}}y{{end}}""") == Set("worker-api"))
    assert(run("""{{if or .tag (eq .name "app")}}y{{end}}""")
      == Set("app", "web", "worker-api"))
    // nesting to any depth, plus not over a parenthesized pipeline
    assert(run("""{{if and (or (eq .name "app") (eq .name "web")) (not (gt .age 10))}}y{{end}}""")
      == Set("web"))
    assert(run("""{{if not (and .tag (gt .age 10))}}y{{end}}""")
      == Set("app", "web"))
    // variadic: three arguments
    assert(run("""{{if or (eq .name "app") (eq .name "web") (eq .name "worker-api")}}y{{end}}""")
      == Set("app", "web", "worker-api"))
  }

  test("template and/or: a nil-comparison arm aborts like Go's render error") {
    import spark.implicits._
    // nval is NULL for "app" — comparing it is a nil comparison, which
    // errors the Go render; the reference's error path yields not-"y"
    // (template_value_render.go:154), so the row DROPS even when another
    // or-arm is true — unless Go ≥1.18 short-circuit never reaches it.
    val df = Seq(("app", Option.empty[Long], 20L), ("web", Option(5L), 0L))
      .toDF("name", "nval", "age")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // error arm FIRST: reached → render aborts → drop (SQL's naive
    // NULL||true = true would wrongly keep "app" here — the r12 ADVICE bug)
    // "app": error arm reached → drop (despite the true second arm);
    // "web": lt 5 10 true → or short-circuits true → keep
    assert(run("""{{if or (lt .nval 10) (eq .name "app")}}y{{end}}""") == Set("web"))
    // "app": error → drop; "web": true && (web=="app" false) → drop
    assert(run("""{{if and (lt .nval 10) (eq .name "app")}}y{{end}}""") == Set.empty[String])
    // deciding arm FIRST: short-circuit means the error arm is never
    // evaluated — "app" keeps on its true first or-arm
    assert(run("""{{if or (eq .name "app") (lt .nval 10)}}y{{end}}""") == Set("app", "web"))
    // "app": first arm false → and short-circuits false (error arm never
    // reached) → drop without error; "web": true && true → keep
    assert(run("""{{if and (eq .name "web") (lt .nval 10)}}y{{end}}""") == Set("web"))
    // not over an erroring pipeline: the error propagates → drop "app";
    // "web" has nval=5 → lt true → not false → drop too
    assert(run("""{{if not (lt .nval 10)}}y{{end}}""") == Set.empty[String])
    // nil TRUTHINESS is falsy, not an error: not .nval keeps both rows? no —
    // nval=5 is truthy for "web", null is falsy for "app"
    assert(run("""{{if not .nval}}y{{end}}""") == Set("app"))
  }

  test("template before/after event-time predicates (README's or example)") {
    import spark.implicits._
    val now = java.sql.Timestamp.from(java.time.Instant.now())
    val old = java.sql.Timestamp.from(
      java.time.Instant.now().minus(java.time.Duration.ofHours(48)))
    val df = Seq(("fresh", now), ("stale", old)).toDF("name", "@timestamp")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // the reference README's own template-condition example (:604):
    // events older than 24h or (impossibly) 24h in the future
    assert(run("""{{if or (before . "-24h") (after . "24h")}}y{{end}}""")
      == Set("stale"))
    assert(run("""{{if before . "-24h"}}y{{end}}""") == Set("stale"))
    assert(run("""{{if after . "-24h"}}y{{end}}""") == Set("fresh"))
    // missing/non-timestamp column → false, like the reference's guard
    val noTs = Seq(("a", 1L)).toDF("name", "v")
    assert(noTs.filter(ConditionFilter.compile(
      """{{if before . "-24h"}}y{{end}}""", noTs)).count() == 0)
  }

  test("template truthiness follows the resolved type's Go zero value") {
    import spark.implicits._
    val df = Seq(("a", "0", 0L, 0.5, true), ("b", "", 3L, 0.0, false))
      .toDF("name", "s", "n", "d", "b")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // string "0" is a NON-EMPTY string → truthy in Go (only "" is the
    // string zero value); numeric zero and boolean false are falsy
    assert(run("""{{if .s}}y{{end}}""") == Set("a"))
    assert(run("""{{if .n}}y{{end}}""") == Set("b"))
    assert(run("""{{if .d}}y{{end}}""") == Set("a"))
    assert(run("""{{if .b}}y{{end}}""") == Set("a"))
    assert(run("""{{if not .b}}y{{end}}""") == Set("b"))
    // missing field resolves to the null literal → falsy, not an error
    assert(run("""{{if .nope}}y{{end}}""") == Set.empty)
  }

  test("template truthiness: empty collections are falsy like Go's zero slice/map") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq("x"), Map("k" -> "v")),
      ("b", Seq.empty[String], Map.empty[String, String]),
      ("c", null.asInstanceOf[Seq[String]], null.asInstanceOf[Map[String, String]]),
    ).toDF("name", "arr", "m")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // Go's IsTrue: len(slice)>0 / len(map)>0 — a typed empty array/map is
    // falsy, null is falsy, only a populated collection passes
    assert(run("""{{if .arr}}y{{end}}""") == Set("a"))
    assert(run("""{{if .m}}y{{end}}""") == Set("a"))
    assert(run("""{{if not .arr}}y{{end}}""") == Set("b", "c"))
  }

  test("template truthiness inside a JSON overflow column reads the parsed value") {
    import spark.implicits._
    // paths into a json STRING column resolve via get_json_object, so
    // every scalar arrives as its string image — truthiness must treat
    // "0"/"0.0"/"false" as the zero VALUES the reference's parsed event
    // holds (float64 0 / bool false), not as non-empty strings
    val df = Seq(
      ("a", """{"k": 87, "b": true}"""),
      ("b", """{"k": 0, "b": false}"""),
      ("c", null.asInstanceOf[String]),
      ("d", """{"k": 1.5}"""),
    ).toDF("name", "props")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    assert(run("""{{if .props.k}}y{{end}}""") == Set("a", "d"))
    assert(run("""{{if .props.b}}y{{end}}""") == Set("a"))
    assert(run("""{{if .props.missing}}y{{end}}""") == Set.empty)
  }

  test("template truthiness: overflow images of empty array/object are falsy") {
    import spark.implicits._
    val df = Seq(
      ("a", """{"arr": [1,2], "obj": {"k":1}}"""),
      ("b", """{"arr": [], "obj": {}}"""),
    ).toDF("name", "props")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // the overflow image of a parsed [] / {} reads falsy, matching Go's
    // zero-length slice/map (a json STRING "[]" is indistinguishable —
    // same documented-divergence class as string-"0")
    assert(run("""{{if .props.arr}}y{{end}}""") == Set("a"))
    assert(run("""{{if .props.obj}}y{{end}}""") == Set("a"))
  }

  test("if keyword accepts any whitespace, matching Go's parser") {
    import spark.implicits._
    val df = Seq(("app", ""), ("web", "x")).toDF("name", "tag")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // {{if\t.tag}} — tab after the keyword parses as a conditional, not a
    // generic action (Go's lexer treats any space run after `if` alike)
    assert(run("{{if\t.tag}}y{{end}}") == Set("web"))
    assert(run("{{if \t eq .name \"app\"}}y{{end}}") == Set("app"))
  }

  test("nested {{if}} blocks compile recursively in either branch") {
    import spark.implicits._
    val df = Seq(("app", 20L, "", "y"), ("web", 0L, "x", "n"),
      ("worker-api", 35L, "err", "y")).toDF("name", "age", "tag", "flag")
    def run(c: String) =
      df.filter(ConditionFilter.compile(c, df)).select("name").as[String].collect().toSet
    // nested in THEN: name truthy AND tag truthy
    assert(run("""{{if .name}}{{if .tag}}y{{end}}{{end}}""") == Set("web", "worker-api"))
    // nested in ELSE: tag falsy AND flag renders the decision
    assert(run("""{{if .tag}}n{{else}}{{if .flag}}{{.flag}}{{end}}{{end}}""") == Set("app"))
    // two levels deep with literals around the blocks
    assert(run("""{{if .name}}{{if gt .age 10}}{{if le .age 30}}y{{end}}{{end}}{{end}}""")
      == Set("app"))
    // Go's chained else-if shares one {{end}}
    assert(run("""{{if eq .name "app"}}y{{else if eq .name "web"}}y{{else}}n{{end}}""")
      == Set("app", "web"))
    // missing field in a nested comparison → null condition → else branch
    assert(run("""{{if .name}}{{if eq .nope "x"}}n{{else}}y{{end}}{{end}}""")
      == Set("app", "web", "worker-api"))
  }

  test("malformed or genuinely unsupported templates still error loudly") {
    import spark.implicits._
    val df = Seq(("a", "y")).toDF("name", "flag")
    val unbalanced = intercept[RuntimeException] {
      ConditionFilter.compile("""{{if .name}}y""", df)
    }
    assert(unbalanced.getMessage.contains("unsupported template condition"))
    val strayEnd = intercept[RuntimeException] {
      ConditionFilter.compile("""{{.flag}}{{end}}""", df)
    }
    assert(strayEnd.getMessage.contains("unsupported template condition"))
    // an unknown template function inside if still errors loudly
    val unknownFn = intercept[RuntimeException] {
      ConditionFilter.compile("""{{if foo .name}}y{{end}}""", df)
    }
    assert(unknownFn.getMessage.contains("unsupported template if-condition"))
    // ...and so does an unsupported and/or argument form
    val badArg = intercept[RuntimeException] {
      ConditionFilter.compile("""{{if and nope .flag}}y{{end}}""", df)
    }
    assert(badArg.getMessage.contains("unsupported and/or/not argument"))
  }
  import spark.implicits._

  // events-like frame: typed columns + a JSON overflow string column
  lazy val df: DataFrame = Seq(
    (1L, "error", 185.22, """{"k": 87, "tags": ["a","b"], "nested": {"x": 1}}""", "app-backend"),
    (2L, "signup", 106.03, """{"k": 0}""", "app-frontend"),
    (3L, "purchase", 9.64, null, "svc-auth"),
  ).toDF("id", "event_type", "value", "props", "service")

  private def ids(dsl: String): Set[Long] =
    df.filter(ConditionFilter.compile(dsl, df)).select("id").as[Long].collect().toSet

  test("EQ string typed compare") {
    assert(ids("""EQ(event_type,"error")""") == Set(1L))
    // string literal vs numeric column → typed mismatch → false (reference equal())
    assert(ids("""EQ(value,"185.22")""") == Set.empty)
  }

  test("EQ numeric with coercion, json.Number analogue") {
    assert(ids("EQ(value,9.64)") == Set(3L))
    assert(ids("EQ(id,2)") == Set(2L))
    // numeric compare against a JSON-extracted string value
    assert(ids("EQ(props,k,87)") == Set(1L))
    assert(ids("EQ($.props.k,0)") == Set(2L))
  }

  test("EQ nil and missing fields") {
    assert(ids("EQ(props,nil)") == Set(3L))
    assert(ids("EQ(no_such_field,1)") == Set.empty)
    assert(ids("""EQ(no_such_field,nil)""") == Set.empty) // missing key → false
  }

  test("Exist") {
    assert(ids("Exist(props)") == Set(1L, 2L))
    assert(ids("Exist(nope)") == Set.empty)
    assert(ids("Exist(props,k)") == Set(1L, 2L))
    assert(ids("Exist(props,tags)") == Set(1L))
  }

  test("prefix/suffix/contains") {
    assert(ids("""HasPrefix(service,"app-")""") == Set(1L, 2L))
    assert(ids("""HasSuffix(service,"auth")""") == Set(3L))
    assert(ids("""Contains(event_type,"up")""") == Set(2L))
    assert(ids("""ContainsAny(event_type,"xk.p")""") == Set(2L, 3L))
  }

  test("Match regex incl. Go named group rewrite") {
    assert(ids("""Match(event_type,^(error|signup)$)""") == Set(1L, 2L))
    assert(ids("""Match(service,(?P<kind>app|svc)-.*)""") == Set(1L, 2L, 3L))
  }

  test("IN on json array in overflow column") {
    assert(ids("""IN($.props.tags,"a")""") == Set(1L))
    assert(ids("""IN($.props.tags,"zz")""") == Set.empty)
  }

  test("boolean composition and precedence") {
    assert(ids("""EQ(event_type,"error") || EQ(event_type,"signup")""") == Set(1L, 2L))
    assert(ids("""!EQ(event_type,"error")""") == Set(2L, 3L))
    // ! binds tighter than &&, && tighter than ||
    assert(ids("""EQ(id,3) || EQ(id,1) && EQ(event_type,"error")""") == Set(1L, 3L))
    assert(ids("""(EQ(id,3) || EQ(id,1)) && EQ(event_type,"error")""") == Set(1L))
    assert(ids("""!(EQ(id,1) || EQ(id,2))""") == Set(3L))
  }

  test("quoted parens and operators inside strings don't confuse the parser") {
    val df2 = Seq((1L, "a)b"), (2L, "x&&y")).toDF("id", "s")
    def ids2(dsl: String): Set[Long] =
      df2.filter(ConditionFilter.compile(dsl, df2)).select("id").as[Long].collect().toSet
    assert(ids2("""EQ(s,"a)b")""") == Set(1L))
    assert(ids2("""EQ(s,"x&&y") || EQ(id,1)""") == Set(1L, 2L))
  }

  test("Before/After on @timestamp") {
    val tdf = Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.now().minusSeconds(7200))),
      (2L, java.sql.Timestamp.from(java.time.Instant.now().plusSeconds(7200))),
    ).toDF("id", "@timestamp")
    def tids(dsl: String): Set[Long] =
      tdf.filter(ConditionFilter.compile(dsl, tdf)).select("id").as[Long].collect().toSet
    assert(tids("Before(-1h)") == Set(1L))
    assert(tids("After(-1h)") == Set(2L))
    assert(tids("Before(24h)") == Set(1L, 2L))
  }

  test("Random(n) is a bernoulli filter") {
    val big = spark.range(10000).toDF("id")
    val n = big.filter(ConditionFilter.compile("Random(10)", big)).count()
    assert(n > 500 && n < 1500, s"Random(10) kept $n of 10000")
  }

  test("GoDuration parsing") {
    assert(GoDuration.parseSeconds("300ms") == 0.3)
    assert(GoDuration.parseSeconds("-1.5h") == -5400.0)
    assert(GoDuration.parseSeconds("2h45m") == 9900.0)
    assert(GoDuration.parseSeconds("10s") == 10.0)
    intercept[IllegalArgumentException](GoDuration.parseSeconds("10x"))
  }
}
