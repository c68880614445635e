package graft.filters

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  def oneRow(df: DataFrame): Row = df.collect().head

  test("Add: literal, field ref, template, index pattern; overwrite flag") {
    val df = Seq(("alice", "web")).toDF("user", "app")
    val out = FilterBox(AddFilter(Map(
      "greet" -> "hello",
      "copy" -> "[user]",
      "combo" -> "{{.app}}-{{.user}}",
      "idx" -> "logs-%{app}",
    ))).stage(df)
    val r = oneRow(out.select("greet", "copy", "combo", "idx"))
    assert(r == Row("hello", "alice", "web-alice", "logs-web"))

    // multi-group %-ref = ONE multi-level path (index_render.go:69 —
    // the decorate_events per-topic-index idiom); Go layouts render
    // dates off the event @timestamp
    val meta = Seq(("2024-03-05 10:20:30", "t1")).toDF("ts", "topic")
      .select(to_timestamp(col("ts")).as("@timestamp"),
        struct(struct(col("topic").as("topic")).as("kafka")).as("@metadata"))
    val idx = FilterBox(AddFilter(Map(
      "per_topic" -> "logs-%{@metadata}{kafka}{topic}-%{+2006.01.02}",
      // missing fields render as the LITERAL "null" — the reference's
      // own index_render test expects app-null-2022.03.04-log
      "miss1" -> "app-%{nope}-x",
      "miss2" -> "app-%{@metadata}{nope}{deeper}-x",
    ))).stage(meta)
    assert(oneRow(idx.select("per_topic", "miss1", "miss2")) ==
      Row("logs-t1-2024.03.05", "app-null-x", "app-null-x"))

    val df2 = Seq(("x", "keep")).toDF("a", "existing")
    val keep = FilterBox(AddFilter(Map("existing" -> "new"), overwrite = false)).stage(df2)
    assert(oneRow(keep.select("existing")) == Row("keep"))
    val over = FilterBox(AddFilter(Map("existing" -> "new"))).stage(df2)
    assert(oneRow(over.select("existing")) == Row("new"))
  }

  test("template functions: arithmetic, timeFormat, string helpers") {
    import graft.render.Render
    val df = Seq((7L, "abc", java.sql.Timestamp.valueOf("2024-03-05 10:20:30")))
      .toDF("n", "s", "ts")
    def render(t: String): String =
      df.select(Render.compile(t)(df).cast("string")).collect().head.getString(0)
    assert(render("{{plus .n 3}}") == "10.0")
    assert(render("{{mod .n 4}}") == "3")
    assert(render("{{upper .s}}-{{title .s}}") == "ABC-Abc")
    assert(render("""{{timeFormat .ts "2006/01/02"}}""") == "2024/03/05")
    assert(render("x{{.missing}}y") == "xy") // absent field renders empty
  }

  test("sprig template functions: default/ternary/b64/trunc/strings/date math") {
    import graft.render.Render
    val df = Seq((7L, "abc def", "",
        java.sql.Timestamp.valueOf("2024-03-05 10:20:30"), "ab"))
      .toDF("n", "s", "blank", "ts", "pfx")
    def render(t: String): String =
      df.select(Render.compile(t)(df).cast("string")).collect().head.getString(0)
    assert(render("""{{default "fallback" .missing}}""") == "fallback")
    assert(render("""{{default "fallback" .blank}}""") == "fallback") // "" is empty
    assert(render("""{{default "fallback" .s}}""") == "abc def")
    assert(render("""{{ternary "yes" "no" .n}}""") == "yes")
    assert(render("""{{ternary "yes" "no" .blank}}""") == "no")
    // sprig emptiness is the zero value of the argument's OWN type: the
    // STRING "0" is non-empty/truthy (only numeric 0 / bool false count)
    val zdf = Seq(("0", 0L, false)).toDF("zstr", "znum", "zbool")
    def zrender(t: String): String =
      zdf.select(Render.compile(t)(zdf).cast("string")).collect().head.getString(0)
    assert(zrender("""{{default "d" .zstr}}""") == "0")
    assert(zrender("""{{ternary "y" "n" .zstr}}""") == "y")
    assert(zrender("""{{default "d" .znum}}""") == "d")
    assert(zrender("""{{ternary "y" "n" .zbool}}""") == "n")
    assert(render("""{{coalesce .missing .blank .s}}""") == "abc def")
    assert(render("""{{b64enc .s}}""") == java.util.Base64.getEncoder
      .encodeToString("abc def".getBytes("UTF-8")))
    assert(render("""{{b64dec "YWJjIGRlZg=="}}""") == "abc def")
    assert(render("""{{trunc 3 .s}}""") == "abc")
    assert(render("""{{trunc -3 .s}}""") == "def")
    assert(render("""{{abbrev 6 .s}}""") == "abc...")
    assert(render("""{{substr 4 7 .s}}""") == "def")
    assert(render("""{{repeat 3 "ab"}}""") == "ababab")
    assert(render("""{{add .n 3 2}}""") == "12")
    assert(render("""{{sub .n 3}}""") == "4")
    assert(render("""{{mul .n 3}}""") == "21")
    assert(render("""{{div .n 2}}""") == "3")
    assert(render("""{{max .n 10 2}}""") == "10")
    assert(render("""{{min .n 10 2}}""") == "2")
    assert(render("""{{contains .s "c d"}}""") == "true")
    assert(render("""{{containsAny .s "xyzb"}}""") == "true")
    assert(render("""{{containsAny .s "xyz"}}""") == "false")
    assert(render("""{{hasprefix .s "abc"}}""") == "true")
    assert(render("""{{hassuffix .s "def"}}""") == "true")
    assert(render("""{{compare "a" "b"}}""") == "-1")
    assert(render("""{{replace .s "ab" "X" -1}}""") == "Xc def")
    assert(render("""{{trimPrefix "abc" .s}}""") == " def")
    assert(render("""{{trimSuffix "def" .s}}""") == "abc ")
    // FIELD-REF prefix/suffix (r14 fix: the literal-only path silently
    // stripped the text ".pfx" instead of the column's value)
    assert(render("""{{trimPrefix .pfx .s}}""") == "c def")
    assert(render("""{{trimSuffix .pfx .s}}""") == "abc def")
    // counted replace refuses field-ref old/new loudly (it would need a
    // compile-time pattern); count -1 keeps supporting columns
    assert(intercept[RuntimeException](
      render("""{{replace .s .pfx "X" 1}}""")).getMessage.contains("LITERAL"))
    assert(render("""{{abbrev 3 .s}}""") == "abc def") // sprig: <4 is a no-op
    assert(render("""{{quote .s}}""") == "\"abc def\"")
    assert(render("""{{dateModify "-1h30m" .ts}}""") == "2024-03-05 08:50:30")
    assert(render("""{{date "2006/01/02 15:04" .ts}}""") == "2024/03/05 10:20")
  }

  test("sprig list/regex/checksum families with nested calls (r12 verdict task 6)") {
    import graft.render.Render
    val df = Seq(("b a b c a", "access-2024")).toDF("s", "name")
    def render(t: String): String =
      df.select(Render.compile(t)(df).cast("string")).collect().head.getString(0)
    // list family composes through nested (parenthesized) calls
    assert(render("""{{join "|" (splitList " " .s)}}""") == "b|a|b|c|a")
    assert(render("""{{join "|" (uniq (splitList " " .s))}}""") == "b|a|c")
    assert(render("""{{first (splitList " " .s)}}""") == "b")
    assert(render("""{{last (splitList " " .s)}}""") == "a")
    // splitList is a LITERAL separator (Go strings.Split), not a regex
    val dotted = Seq(Tuple1("a.b.c")).toDF("d")
    assert(dotted.select(Render.compile("""{{join "-" (splitList "." .d)}}""")(dotted)
      .cast("string")).collect().head.getString(0) == "a-b-c")
    // regex family
    assert(render("""{{regexMatch "^acc" .name}}""") == "true")
    assert(render("""{{regexMatch "^x" .name}}""") == "false")
    assert(render("""{{regexFind "[0-9]+" .name}}""") == "2024")
    assert(render("""{{regexReplaceAll "[0-9]" .name "#"}}""") == "access-####")
    // Go replacement $name refs translate to Java ${name}; $$ is literal
    val named = Seq(Tuple1("user=alice")).toDF("kv")
    assert(named.select(Render.compile(
      """{{regexReplaceAll "user=(?P<who>[a-z]+)" .kv "hi ${who}$$"}}""")(named)
      .cast("string")).collect().head.getString(0) == "hi alice$")
    // checksums match the JDK digests
    def hex(alg: String, s: String) = java.security.MessageDigest
      .getInstance(alg).digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(render("{{sha256sum .name}}") == hex("SHA-256", "access-2024"))
    assert(render("{{sha1sum .name}}") == hex("SHA-1", "access-2024"))
    assert(render("{{md5sum .name}}") == hex("MD5", "access-2024"))
  }

  test("unknown template functions fail at plan time with the supported list") {
    import graft.render.Render
    val df = Seq(Tuple1("x")).toDF("s")
    val e = intercept[RuntimeException] {
      df.select(Render.compile("{{uuidv4}}")(df))
    }
    assert(e.getMessage.contains("unsupported template function 'uuidv4'"),
      e.getMessage)
    assert(e.getMessage.contains("supported:"), e.getMessage)
    assert(e.getMessage.contains("splitList"), e.getMessage) // the list is real
    // nested unknowns surface the INNER name
    val e2 = intercept[RuntimeException] {
      df.select(Render.compile("""{{join "," (shuffle .s)}}""")(df))
    }
    assert(e2.getMessage.contains("'shuffle'"), e2.getMessage)
  }

  test("Remove: unconditional drops column; conditional nulls per-row") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "junk")
    assert(!FilterBox(RemoveFilter(Seq("junk"))).stage(df).columns.contains("junk"))
    val cond = FilterBox(RemoveFilter(Seq("junk")), ifConds = Seq("EQ(id,1)")).stage(df)
    assert(cond.orderBy("id").select("junk").as[String].collect().toSeq == Seq(null, "b"))
  }

  test("Rename") {
    val df = Seq((1, "x")).toDF("id", "old")
    val out = FilterBox(RenameFilter(Map("old" -> "new"))).stage(df)
    assert(out.columns.toSeq == Seq("id", "new"))
    assert(oneRow(out.select("new")) == Row("x"))
  }

  test("multi-level targets: Add sets nested structs, Remove deletes " +
      "nested keys, Rename moves across depths (reference field_setter/" +
      "field_deleter parity)") {
    val df = Seq((1L, "orig", ("inner", 7L))).toDF("id", "msg", "stored")
      .withColumn("stored", struct(col("stored._1").as("message"),
        col("stored._2").as("n")))
    // nested target on a FRESH top-level: struct created
    val added = FilterBox(AddFilter(Map("[a][b]" -> "[msg]"))).stage(df)
    assert(oneRow(added.select("a.b")) == Row("orig"))
    // nested target on an EXISTING struct: sibling fields preserved
    val upd = FilterBox(AddFilter(Map("[stored][message]" -> "patched"))).stage(df)
    assert(oneRow(upd.select("stored.message", "stored.n")) == Row("patched", 7L))
    // multi-level remove drops the key, keeps the sibling
    val rm = FilterBox(RemoveFilter(Seq("[stored][message]"))).stage(df)
    assert(oneRow(rm.select("stored.n")) == Row(7L))
    assert(!rm.select("stored.*").columns.contains("message"))
    // missing / non-struct level: reference no-op, never an error
    assert(FilterBox(RemoveFilter(Seq("[nope][x]"))).stage(df).collect().length == 1)
    assert(FilterBox(RemoveFilter(Seq("[msg][x]"))).stage(df).collect().length == 1)
    // rename OUT of a nested path: dst set, src key deleted
    val rn = FilterBox(RenameFilter(Map("[stored][message]" -> "flat"))).stage(df)
    assert(oneRow(rn.select("flat")) == Row("inner"))
    assert(!rn.select("stored.*").columns.contains("message"))
    // rename INTO a nested path
    val rn2 = FilterBox(RenameFilter(Map("msg" -> "[stored][moved]"))).stage(df)
    assert(oneRow(rn2.select("stored.moved")) == Row("orig"))
    assert(!rn2.columns.contains("msg"))
    // a leaf that is its struct's only field NULLs instead of dropping
    // (Spark structs cannot be empty where the reference keeps {})
    val one = Seq((1L, "v")).toDF("id", "x")
      .withColumn("s", struct(col("x").as("only")))
    val rmOnly = FilterBox(RemoveFilter(Seq("[s][only]"))).stage(one)
    assert(oneRow(rmOnly.select("s.only")) == Row(null))
  }

  test("nested set through an existing SCALAR level skips it " +
      "(reference mfields_field_setter parity) and conditional sets " +
      "stay row-safe") {
    val df = Seq((1L, "scalarA", "m1"), (2L, "scalarB", "m2"))
      .toDF("id", "a", "msg")
    // '[a][b]' with scalar `a`: the reference stays at the parent and
    // sets top-level `b`; `a` is untouched on EVERY row
    val out = FilterBox(AddFilter(Map("[a][b]" -> "[msg]"))).stage(df)
    assert(out.orderBy("id").select("a", "b").collect().toSeq ==
      Seq(Row("scalarA", "m1"), Row("scalarB", "m2")))
    // conditionally: rows failing the guard keep the scalar AND get a
    // null `b` — nothing is rebuilt out from under them (r17 review:
    // the old rebuild destroyed `a` for non-matching rows)
    val cond = FilterBox(AddFilter(Map("[a][b]" -> "[msg]")),
      ifConds = Seq("EQ(id,1)")).stage(df)
    assert(cond.orderBy("id").select("a", "b").collect().toSeq ==
      Seq(Row("scalarA", "m1"), Row("scalarB", null)))
  }

  test("nested set resurrects a per-row NULL struct only where cond " +
      "holds") {
    val df = Seq((1L, "hit"), (2L, "miss")).toDF("id", "msg")
      .withColumn("stored",
        when(col("id") === 99L, struct(lit("x").as("note"))))
    // stored is a typed struct column, NULL on every row
    val out = FilterBox(AddFilter(Map("[stored][flag]" -> "y")),
      ifConds = Seq("EQ(id,1)")).stage(df)
    val rows = out.orderBy("id").select("stored.note", "stored.flag").collect()
    assert(rows(0) == Row(null, "y"))   // resurrected with typed nulls
    assert(out.orderBy("id").filter(col("id") === 2L)
      .select("stored").collect().head == Row(null)) // untouched row stays NULL
  }

  test("map-typed leaf parents: set upserts the key, remove deletes it, " +
      "rename moves out of the map") {
    val df = Seq((1L, Map("k1" -> "v1", "k2" -> "v2"), "new"))
      .toDF("id", "kv", "msg")
    val set = FilterBox(AddFilter(Map("[kv][extra]" -> "[msg]"))).stage(df)
    assert(set.select(element_at(col("kv"), "extra"),
      element_at(col("kv"), "k1")).collect().head == Row("new", "v1"))
    // conditional upsert leaves non-matching rows' maps untouched
    val condSet = FilterBox(AddFilter(Map("[kv][extra]" -> "x")),
      ifConds = Seq("EQ(id,99)")).stage(df)
    assert(condSet.select(size(col("kv"))).collect().head == Row(2))
    val rm = FilterBox(RemoveFilter(Seq("[kv][k1]"))).stage(df)
    assert(rm.select(size(col("kv")),
      element_at(col("kv"), "k2")).collect().head == Row(1, "v2"))
    val rn = FilterBox(RenameFilter(Map("[kv][k1]" -> "flat"))).stage(df)
    assert(rn.select(col("flat"), size(col("kv"))).collect().head ==
      Row("v1", 1))
    // setting THROUGH a map level (deeper than the leaf) fails loudly
    val e = intercept[RuntimeException] {
      FilterBox(AddFilter(Map("[kv][deep][er]" -> "x"))).stage(df).collect()
    }
    assert(e.getMessage.contains("nested map level"), e.getMessage)
  }

  test("nested set/delete edge semantics: NULL guards, NULL structs on " +
      "delete, case-insensitive targets, non-castable map keys") {
    // a guard over a NULL field evaluates NULL — it must behave as
    // false, never resurrect the struct (three-valued-logic pin)
    val df = Seq((1L, null.asInstanceOf[String], "m")).toDF("id", "name", "msg")
      .withColumn("stored",
        when(col("id") === 99L, struct(lit("x").as("note"))))
    val g = FilterBox(AddFilter(Map("[stored][flag]" -> "y")),
      ifConds = Seq("""EQ(name,"x")""")).stage(df)
    assert(g.select("stored").collect().head == Row(null))
    // DELETING a field inside a per-row NULL struct must not
    // materialize the struct (the set path resurrects; delete must not)
    val d = Seq((1L, "k")).toDF("id", "x")
      .withColumn("s", when(col("id") === 99L,
        struct(lit("a").as("p"), lit("b").as("q"))))
    val del = FilterBox(RemoveFilter(Seq("[s][p]")),
      ifConds = Seq("EQ(id,1)")).stage(d)
    assert(del.select("s").collect().head == Row(null))
    // case-insensitive top-level rename (FieldPath reads are
    // case-insensitive; the delete half must be too)
    val cased = Seq((1L, "v")).toDF("id", "Foo")
    val rn = FilterBox(RenameFilter(Map("foo" -> "bar"))).stage(cased)
    assert(rn.columns.toSeq == Seq("id", "bar"))
    // a key that cannot cast to the map's key type is a NO-OP, never a
    // whole-map wipe (null-safe <=> pin)
    val im = Seq((1L, Map(7 -> "seven"))).toDF("id", "m")
    val rmBad = FilterBox(RemoveFilter(Seq("[m][oops]"))).stage(im)
    assert(rmBad.select(size(col("m"))).collect().head == Row(1))
    val setBad = FilterBox(AddFilter(Map("[m][oops]" -> "x"))).stage(im)
    assert(setBad.select(size(col("m"))).collect().head == Row(1))
    // rename through a map level DEEPER than the leaf's parent fails
    // loudly like the set path (silent drop shipped config errors)
    val deep = Seq((1L, Map("k" -> "v"))).toDF("id", "m")
    val e = intercept[RuntimeException] {
      FilterBox(RenameFilter(Map("[m][k][x]" -> "flat"))).stage(deep).collect()
    }
    assert(e.getMessage.contains("nested map level"), e.getMessage)
  }

  test("Rename onto an existing column overwrites, never duplicates " +
      "(reference SetField overwrite=true then delete src — r17 ADVICE)") {
    // withColumnRenamed does NOT overwrite: renaming src onto an
    // existing dst used to ship TWO `dst` columns and every later
    // reference failed ambiguous
    val df = Seq((1L, "moved", "old")).toDF("id", "src", "dst")
    val out = FilterBox(RenameFilter(Map("src" -> "dst"))).stage(df)
    assert(out.columns.count(_.equalsIgnoreCase("dst")) == 1)
    assert(!out.columns.exists(_.equalsIgnoreCase("src")))
    assert(oneRow(out.select("dst")) == Row("moved"))
    // dst stays referenceable — the ambiguity is what the old path broke
    assert(out.filter(col("dst") === "moved").count() == 1)
    // case-insensitive clash counts as a clash too
    val cased = Seq((1L, "moved", "old")).toDF("id", "src", "DST")
    val out2 = FilterBox(RenameFilter(Map("src" -> "dst"))).stage(cased)
    assert(out2.columns.count(_.equalsIgnoreCase("dst")) == 1)
    assert(out2.filter(col("dst") === "moved").count() == 1)
    // no clash → plain rename still taken (cheapest plan)
    val plain = FilterBox(RenameFilter(Map("src" -> "fresh"))).stage(df)
    assert(plain.columns.toSeq == Seq("id", "fresh", "dst"))
  }

  test("Remove descends nested MAP levels like the reference's " +
      "maps-of-maps field deleter (r17 ADVICE)") {
    // [a][b][c] through map<string, map<string,int>>: drop key c of the
    // inner map under key b; sibling keys at both levels survive
    val df = Seq((1L, Map(
      "b" -> Map("c" -> 1, "keep" -> 2),
      "other" -> Map("c" -> 3)))).toDF("id", "a")
    val out = FilterBox(RemoveFilter(Seq("[a][b][c]"))).stage(df)
    val r = oneRow(out.select(
      map_keys(element_at(col("a"), "b")),
      element_at(element_at(col("a"), "b"), "keep"),
      element_at(element_at(col("a"), "other"), "c")))
    assert(r == Row(Seq("keep"), 2, 3))
    // absent intermediate key: reference no-op, map untouched
    val miss = FilterBox(RemoveFilter(Seq("[a][nope][c]"))).stage(df)
    assert(oneRow(miss.select(size(col("a")))) == Row(2))
    // three map levels deep
    val deep3 = Seq((1L, Map("x" -> Map("y" -> Map("z" -> 1, "w" -> 2)))))
      .toDF("id", "a")
    val out3 = FilterBox(RemoveFilter(Seq("[a][x][y][z]"))).stage(deep3)
    assert(oneRow(out3.select(
      map_keys(element_at(element_at(col("a"), "x"), "y")))) == Row(Seq("w")))
    // struct pre-path INTO a map chain (struct → map → map)
    val mixed = Seq((1L, "v")).toDF("id", "v")
      .withColumn("s", struct(
        map(lit("b"), map(lit("c"), lit(1), lit("k"), lit(2))).as("m")))
    val outM = FilterBox(RemoveFilter(Seq("[s][m][b][c]"))).stage(mixed)
    assert(oneRow(outM.select(
      map_keys(element_at(col("s.m"), "b")))) == Row(Seq("k")))
    // Rename can now move a value out of a nested map path
    val rn = FilterBox(RenameFilter(Map("[a][b][c]" -> "flat"))).stage(df)
    assert(oneRow(rn.select(col("flat"),
      map_keys(element_at(col("a"), "b")))) == Row(1, Seq("keep")))
  }

  test("Add descends nested MAP levels: upsert, missing-key creation, " +
      "row-safe conditionals (r18 — the set twin of the map delete)") {
    val df = Seq((1L, Map("b" -> Map("c" -> 10L, "keep" -> 20L))),
      (2L, Map("b" -> Map("keep" -> 21L))))
      .toDF("id", "a")
    // existing inner key overwritten; siblings at both levels survive
    val set = FilterBox(AddFilter(Map("[a][b][c]" -> "{{.id}}"))).stage(df)
    val rows = set.select(col("id"),
      element_at(element_at(col("a"), "b"), "c"),
      element_at(element_at(col("a"), "b"), "keep"))
      .orderBy("id").collect()
    assert(rows(0) == Row(1L, 1L, 20L))
    assert(rows(1) == Row(2L, 2L, 21L)) // missing inner key created
    // missing INTERMEDIATE key created (reference missing-map creation)
    val deep = FilterBox(AddFilter(Map("[a][fresh][x]" -> "7"))).stage(df)
    assert(oneRow(deep.select(
      element_at(element_at(col("a"), "fresh"), "x"))) == Row(7L))
    // three map levels
    val d3 = Seq((1L, Map("x" -> Map("y" -> Map("z" -> 1L))))).toDF("id", "a")
    val set3 = FilterBox(AddFilter(Map("[a][x][y][w]" -> "9"))).stage(d3)
    assert(oneRow(set3.select(
      element_at(element_at(element_at(col("a"), "x"), "y"), "w"),
      element_at(element_at(element_at(col("a"), "x"), "y"), "z")))
      == Row(9L, 1L))
    // conditional: non-matching rows keep the map untouched
    val cond = FilterBox(AddFilter(Map("[a][b][c]" -> "99")),
      ifConds = Seq("EQ(id,1)")).stage(df)
    val crows = cond.select(col("id"),
      element_at(element_at(col("a"), "b"), "c")).orderBy("id").collect()
    assert(crows(0) == Row(1L, 99L))
    assert(crows(1) == Row(2L, null))
    // overwrite=false keeps an existing inner value
    val keep = FilterBox(AddFilter(Map("[a][b][keep]" -> "0"),
      overwrite = false)).stage(df)
    assert(oneRow(keep.select(
      element_at(element_at(col("a"), "b"), "keep"))) == Row(20L))
    // a non-castable intermediate key is a no-op, never a map wipe
    val im = Seq((1L, Map(7 -> Map("c" -> 1L)))).toDF("id", "m")
    val bad = FilterBox(AddFilter(Map("[m][oops][c]" -> "5"))).stage(im)
    assert(oneRow(bad.select(size(col("m")))) == Row(1))
    // descent into a non-map value type stays a loud plan-time error
    val flat = Seq((1L, Map("k" -> "v"))).toDF("id", "m")
    val e = intercept[RuntimeException] {
      FilterBox(AddFilter(Map("[m][k][x]" -> "5"))).stage(flat).collect()
    }
    assert(e.getMessage.contains("nested map level"), e.getMessage)
  }

  test("index patterns: present NON-string fields render the literal " +
      "\"null\" (reference errNotString); letter-only Go layouts " +
      "dispatch to the Go translator (r17 ADVICE)") {
    val df = Seq((7L, "web")).toDF("num", "app")
      .withColumn("@timestamp",
        to_timestamp(lit("2024-03-05 10:20:30"))) // a Tuesday
      .withColumn("nested", struct(col("num").as("n")))
    val out = FilterBox(AddFilter(Map(
      "numidx" -> "app-%{num}-x",            // long field → "null"
      "nestidx" -> "app-%{nested}{n}-x",     // multi-group long → "null"
      "stridx" -> "app-%{app}-x",            // string still renders
      "monthidx" -> "m-%{+Jan}",             // letter-only Go layouts
      "dayidx" -> "d-%{+Monday}",
    ))).stage(df)
    assert(oneRow(out.select("numidx", "nestidx", "stridx", "monthidx",
      "dayidx")) == Row("app-null-x", "app-null-x", "app-web-x",
      "m-Mar", "d-Tuesday"))
    // the dispatch list is DERIVED from GoTimeLayout's table (single
    // source of truth — a future digitless token cannot drift out of
    // the index-pattern dispatch), and matching is whole-letter-run,
    // not substring (a literal run merely containing 'pm' stays Joda)
    assert(GoTimeLayout.letterTokens.sorted ==
      Seq("Jan", "January", "MST", "Mon", "Monday", "PM", "pm"))
  }

  test("remove_fields post-processing handles multi-level targets " +
      "(the reference's Grok remove_fields accepts them)") {
    val df = Seq((1L, "GET 200", "keepme"))
      .toDF("id", "message", "note")
      .withColumn("stored", struct(col("note").as("raw"), lit(7L).as("n")))
    val out = graft.pipeline.Planner.filterStage("Grok", Map(
      "src" -> "message",
      "match" -> Seq("^%{WORD:verb} %{INT:code}$"),
      "remove_fields" -> Seq("message", "[stored][raw]")))(df)
    val r = oneRow(out.select(col("verb"), col("message"), col("stored.n")))
    assert(r == Row("GET", null, 7L))
    assert(oneRow(out.select("stored.raw")) == Row(null))
  }

  test("Convert: casts, failure handling") {
    val df = Seq(("12", "bad", "3.5", "true"), ("7", "8", "x", "nope"))
      .toDF("a", "b", "c", "d")
    val out = FilterBox(ConvertFilter(Map(
      "a" -> ConvertFilter.Spec("int"),
      "b" -> ConvertFilter.Spec("int", settoIfFail = Some(-1L)),
      "c" -> ConvertFilter.Spec("float", removeIfFail = true),
      "d" -> ConvertFilter.Spec("bool"),
    ))).stage(df)
    val rows = out.orderBy("a").select("a", "b", "c", "d").collect()
    assert(rows(0) == Row(7L, 8L, null, null)) // "x"→removed, "nope"→null cast
    assert(rows(1) == Row(12L, -1L, 3.5, true))
    assert(out.schema("a").dataType.typeName == "long")
  }

  test("Convert: array casts") {
    val df = Seq((Seq("1", "2", "3"), "seq")).toDF("arr", "tag")
    val out = FilterBox(ConvertFilter(Map(
      "arr" -> ConvertFilter.Spec("array(int)")))).stage(df)
    assert(oneRow(out.select("arr")) == Row(Seq(1L, 2L, 3L)))
  }

  test("Date: Go layouts, UNIX, UNIX_MS, first-match-wins, failTag") {
    val df = Seq(
      ("2024-03-05 10:20:30", "fmt"),
      ("1709634030", "unix"),
      ("05/Mar/2024:10:20:30 +0000", "apache"),
      ("not a date", "bad"),
    ).toDF("t", "kind")
    val out = FilterBox(
      DateFilter("t", Seq("2006-01-02 15:04:05", "02/Jan/2006:15:04:05 -0700", "UNIX")),
      failTag = Some("date_fail")).stage(df)
    val byKind = out.collect().map(r =>
      r.getString(r.fieldIndex("kind")) ->
        (Option(r.get(r.fieldIndex("@timestamp"))), Option(r.get(r.fieldIndex("tags"))))).toMap
    assert(byKind("fmt")._1.get.toString == "2024-03-05 10:20:30.0")
    assert(byKind("apache")._1.get.toString == "2024-03-05 10:20:30.0")
    assert(byKind("unix")._1.get.toString == "2024-03-05 10:20:30.0")
    assert(byKind("bad")._1.isEmpty)
    assert(byKind("bad")._2.contains(Seq("date_fail")))
    assert(byKind("fmt")._2.isEmpty)
  }

  test("GoTimeLayout translation") {
    assert(GoTimeLayout.translate("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss")
    assert(GoTimeLayout.translate("02/Jan/2006:15:04:05 -0700") == "dd/MMM/yyyy:HH:mm:ss xx")
    assert(GoTimeLayout.translate("2006-01-02T15:04:05Z07:00") == "yyyy-MM-dd'T'HH:mm:ssXXX")
  }

  test("Grok: nginx-style access log, first-match-wins, fail tag") {
    val line = """192.168.1.10 - frank [05/Mar/2024:10:20:30 +0000] "GET /api/users HTTP/1.1" 200 1543"""
    val df = Seq((line, 1), ("garbage", 2)).toDF("message", "id")
    val grok = GrokFilter("message", Seq(
      """%{IP:clientip} - %{USER:ident} \[%{DATA:logtime}\] "%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}" %{INT:status} %{INT:bytes}"""))
    val out = FilterBox(grok, failTag = Some("grok_fail")).stage(df)
    val ok = out.filter($"id" === 1).collect().head
    assert(ok.getString(ok.fieldIndex("clientip")) == "192.168.1.10")
    assert(ok.getString(ok.fieldIndex("verb")) == "GET")
    assert(ok.getString(ok.fieldIndex("status")) == "200")
    val bad = out.filter($"id" === 2).collect().head
    assert(bad.isNullAt(bad.fieldIndex("clientip")))
    assert(bad.getSeq[String](bad.fieldIndex("tags")) == Seq("grok_fail"))
  }

  test("Grok: pattern file loading") {
    val f = java.nio.file.Files.createTempFile("graft_patterns", ".txt")
    java.nio.file.Files.writeString(f,
      "# custom patterns\nMYID [A-Z]{2}-\\d+\n\nMYLINE %{MYID:id} %{WORD:w}\n")
    val loaded = Grok.loadPatternFile(f.toString)
    assert(loaded == Map("MYID" -> """[A-Z]{2}-\d+""", "MYLINE" -> "%{MYID:id} %{WORD:w}"))
    val gf = GrokFilter("message", Seq("^%{MYLINE}$"), patternPaths = Seq(f.toString))
    val out = FilterBox(gf).stage(Seq("AB-12 hello").toDF("message")).collect().head
    assert(out.getString(out.fieldIndex("id")) == "AB-12")
    assert(out.getString(out.fieldIndex("w")) == "hello")

    // URL form (reference grok.go:139-160 loads http(s) pattern sets;
    // file:// exercises the same stream path without egress)
    val viaUrl = GrokFilter("message", Seq("^%{MYLINE}$"),
      patternPaths = Seq(f.toUri.toString))
    val out2 = FilterBox(viaUrl).stage(Seq("CD-7 bye").toDF("message")).collect().head
    assert(out2.getString(out2.fieldIndex("id")) == "CD-7")
    assert(out2.getString(out2.fieldIndex("w")) == "bye")
  }

  test("Json: schema'd merge to root and map target") {
    val df = Seq(("""{"k": 87, "name": "x"}""", 1)).toDF("props", "id")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k LONG, name STRING")
    val out = FilterBox(JsonFilter("props", schema = Some(schema))).stage(df)
    val r = oneRow(out.select("k", "name"))
    assert(r == Row(87L, "x"))

    val out2 = FilterBox(JsonFilter("props", target = Some("parsed"))).stage(df)
    val m = oneRow(out2.select("parsed")).getMap[String, String](0)
    assert(m("k") == "87" && m("name") == "x")
  }

  test("bracket keys containing '.' resolve the LITERAL key in a JSON overflow column") {
    // [attrs][a.b] previously compiled to $.a.b — descending into nested
    // objects instead of looking up the literal "a.b" key (r14 fix:
    // bracket-quoted JSONPath)
    val df = Seq(("""{"a.b": 7, "a": {"b": 99}}""", 1L)).toDF("attrs", "id")
    val c = graft.paths.FieldPath.resolve(df, "[attrs][a.b]").get
    assert(df.select(c.cast("string")).as[String].head() == "7")
    // degenerate paths resolve to None — never a plan-time crash from a
    // user template string
    assert(graft.paths.FieldPath.resolve(df, "$.").isEmpty)
  }

  test("Json: malformed input FAILS (tagged), never a struct of nulls") {
    // PERMISSIVE from_json returns a row of nulls for garbage — the old
    // .isNotNull success called it parsed, so failTag never fired and
    // every schema field was nulled onto the corrupt row (r14 fix)
    val df = Seq(("""{"k": 87, "name": "x"}""", 1), ("not json{", 2))
      .toDF("props", "id")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k LONG, name STRING")
    val out = FilterBox(JsonFilter("props", schema = Some(schema)),
      failTag = Some("json_fail")).stage(df)
    val good = out.filter($"id" === 1).collect().head
    assert(good.getLong(good.fieldIndex("k")) == 87L)
    assert(good.isNullAt(good.fieldIndex("tags")))
    val bad = out.filter($"id" === 2).collect().head
    assert(bad.getSeq[String](bad.fieldIndex("tags")) == Seq("json_fail"))
    assert(bad.isNullAt(bad.fieldIndex("k")))
  }

  test("Grok: field names with underscores (standard grok) compile and extract") {
    // Java named groups reject '_' — the old compile crashed per-executor
    // at first row; names are now aliased in the regex and mapped back
    val df = Seq(("GET /x 200 12.5", 1)).toDF("message", "id")
    val g = GrokFilter("message", Seq(
      "^%{WORD:verb} %{NOTSPACE:req_path} %{INT:status_code} %{NUMBER:response_time}$"))
    assert(g.outputFields == Seq("verb", "req_path", "status_code", "response_time"))
    val out = FilterBox(g).stage(df)
    val r = out.collect().head
    assert(r.getString(r.fieldIndex("req_path")) == "/x")
    assert(r.getString(r.fieldIndex("status_code")) == "200")
    assert(r.getString(r.fieldIndex("response_time")) == "12.5")
  }

  test("Split: positional fields, arity failure") {
    val df = Seq(("a|b|c", 1), ("x|y", 2)).toDF("s", "id")
    val out = FilterBox(
      SplitFilter("s", "|", Seq("f1", "f2", "f3")),
      failTag = Some("split_fail")).stage(df)
    val r1 = out.filter($"id" === 1).collect().head
    assert(r1.getString(r1.fieldIndex("f1")) == "a" && r1.getString(r1.fieldIndex("f3")) == "c")
    val r2 = out.filter($"id" === 2).collect().head
    assert(r2.getSeq[String](r2.fieldIndex("tags")) == Seq("split_fail"))
  }

  test("KV: include_keys static columns; map target; trims") {
    val df = Seq(("a=1 b=2 c=3", 1)).toDF("s", "id")
    val out = FilterBox(KvFilter("s", " ", "=", includeKeys = Seq("a", "c"))).stage(df)
    val r = oneRow(out.select("a", "c"))
    assert(r == Row("1", "3"))
    val out2 = FilterBox(KvFilter("s", " ", "=", target = Some("kv"),
      excludeKeys = Seq("b"))).stage(df)
    val m = oneRow(out2.select("kv")).getMap[String, String](0)
    assert(m == Map("a" -> "1", "c" -> "3"))
  }

  test("Gsub / Replace / Case / UrlDecode") {
    val df = Seq(("Hello  World", "a%20b c", "x-y-z")).toDF("s", "u", "r")
    val out = FilterBox(GsubFilter(Seq(("s", """\s+""", " ")))).stage(df)
    assert(oneRow(out.select("s")) == Row("Hello World"))

    val rep = FilterBox(ReplaceFilter("r", "-", "_", count = 1)).stage(df)
    assert(oneRow(rep.select("r")) == Row("x_y-z"))
    val repAll = FilterBox(ReplaceFilter("r", "-", "_")).stage(df)
    assert(oneRow(repAll.select("r")) == Row("x_y_z"))

    val up = FilterBox(CaseFilter(Seq("s"), upper = true)).stage(df)
    assert(oneRow(up.select("s")) == Row("HELLO  WORLD"))

    val dec = FilterBox(UrlDecodeFilter(Seq("u"))).stage(df)
    assert(oneRow(dec.select("u")) == Row("a b c"))
  }

  test("Translate: literal map and broadcast join") {
    val df = Seq(("error", 1), ("unknown", 2)).toDF("level", "id")
    val out = FilterBox(TranslateFilter("level", "code",
      Map("error" -> "E", "info" -> "I"))).stage(df)
    assert(out.orderBy("id").select("code").as[String].collect().toSeq == Seq("E", null))

    val dict = Seq(("error", "E2")).toDF("k", "v")
    val joined = TranslateFilter.joined(df, dict, "level", "k", "v", "code")
    assert(joined.orderBy("id").select("code").as[String].collect().toSeq == Seq("E2", null))
  }

  test("Translate: YAML file dictionary hot-reloads on refresh_interval") {
    val dictFile = java.nio.file.Files.createTempFile("graft_dict", ".yml")
    java.nio.file.Files.writeString(dictFile, "error: E\ninfo: I\n")
    val df = Seq(("error", 1), ("info", 2), ("unknown", 3)).toDF("level", "id")

    // refresh_interval 0 = re-read on every lookup (dev/test cadence)
    val stage = FilterBox(TranslateFilter("level", "code", Map.empty,
      Some(dictFile.toString), refreshIntervalSec = 0)).stage
    assert(stage(df).orderBy("id").select("code").as[String].collect().toSeq ==
      Seq("E", "I", null))

    // mutate the dict; the SAME compiled stage sees the new mapping
    java.nio.file.Files.writeString(dictFile, "error: E9\nunknown: U\n")
    assert(stage(df).orderBy("id").select("code").as[String].collect().toSeq ==
      Seq("E9", null, "U"))

    // file:// URL form (zero-egress stand-in for the reference's http dicts)
    val viaUrl = FilterBox(TranslateFilter("level", "code", Map.empty,
      Some(dictFile.toUri.toString), refreshIntervalSec = 0)).stage(df)
    assert(viaUrl.orderBy("id").select("code").as[String].collect().toSeq ==
      Seq("E9", null, "U"))

    // a broken refresh keeps serving the last good dict
    java.nio.file.Files.delete(dictFile)
    assert(stage(df).orderBy("id").select("code").as[String].collect().toSeq ==
      Seq("E9", null, "U"))
  }

  test("Translate: TTL caches between refreshes") {
    val dictFile = java.nio.file.Files.createTempFile("graft_dict_ttl", ".yml")
    java.nio.file.Files.writeString(dictFile, "a: 1\n")
    val path = dictFile.toString
    assert(TranslateFilter.DictCache.get(path, 3600) == Map("a" -> "1"))
    java.nio.file.Files.writeString(dictFile, "a: 2\n")
    // within the interval the cached dict is served
    assert(TranslateFilter.DictCache.get(path, 3600) == Map("a" -> "1"))
    // interval 0 forces the re-read
    assert(TranslateFilter.DictCache.get(path, 0) == Map("a" -> "2"))
  }

  test("Drop under condition; guard keeps non-matching rows") {
    val df = Seq(("debug", 1), ("error", 2)).toDF("level", "id")
    val out = FilterBox(DropFilter, ifConds = Seq("""EQ(level,"debug")""")).stage(df)
    assert(out.select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("FilterBox: if-guard gates transform; add/remove under success") {
    val df = Seq(("error", "x", 1), ("info", "y", 2)).toDF("level", "v", "id")
    val box = FilterBox(
      AddFilter(Map("seen" -> "yes")),
      ifConds = Seq("""EQ(level,"error")"""),
      addFields = Map("post" -> "[v]"),
      removeFields = Seq("v"))
    val out = box.stage(df).orderBy("id")
    val rows = out.select("seen", "post", "v").collect()
    assert(rows(0) == Row("yes", "x", null))
    assert(rows(1) == Row(null, null, "y"))
  }

  test("NestedFilters: shared guard applies to all inner boxes") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "id")
    val stage = NestedFilters.stage(Seq("""EQ(k,"a")"""), Seq(
      FilterBox(AddFilter(Map("x" -> "1"))),
      FilterBox(AddFilter(Map("y" -> "2")))))
    val rows = stage(df).orderBy("id").select("x", "y").collect()
    assert(rows(0) == Row("1", "2"))
    assert(rows(1) == Row(null, null))
  }
}
