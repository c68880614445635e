package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The third-party operator escape hatch (reference plugin surface:
  * filter/filter.go:40-61, input/input.go:40-59, output/output.go:46-67):
  * `Custom` stages resolve a user class from the classpath and get the
  * same box semantics as built-ins. */
class PluginSpec extends SparkSpec {
  import spark.implicits._

  test("custom EventFilter loads through YAML with full box semantics") {
    val dir = Files.createTempDirectory("graft_plugin")
    val f = dir.resolve("in.txt")
    Files.write(f, java.util.Arrays.asList("alice", "bob", "carol"))
    val out = dir.resolve("out").toString
    graft.testplugins.CapturingOutput.seen.clear()
    val yaml =
      s"""inputs:
         |  - Custom:
         |      class: graft.testplugins.CountingInput
         |      n: 4
         |filters:
         |  - Custom:
         |      class: graft.testplugins.SuffixFilter
         |      field: message
         |      suffix: "-ok"
         |      must_contain: "2"
         |      if:
         |        - 'HasPrefix(message,"msg")'
         |      add_fields:
         |        marked: "yes"
         |      failTag: parsefail
         |outputs:
         |  - Custom:
         |      class: graft.testplugins.CapturingOutput
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    Planner.fromYaml(yaml).runBatch(spark)

    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 4)
    val byMsg = rows.map(r =>
      r.getString(r.fieldIndex("message")) -> r).toMap
    // success row: transformed + add_fields, no tag
    assert(byMsg.contains("msg-2-ok"), byMsg.keySet)
    val hit = byMsg("msg-2-ok")
    assert(hit.getString(hit.fieldIndex("marked")) == "yes")
    assert(hit.isNullAt(hit.fieldIndex("tags")) ||
      hit.getSeq[String](hit.fieldIndex("tags")).isEmpty)
    // success=false row: untouched, failTag appended (q_fail_tag semantics)
    val miss = byMsg("msg-1")
    assert(miss.isNullAt(miss.fieldIndex("marked")))
    assert(miss.getSeq[String](miss.fieldIndex("tags")).contains("parsefail"))
    // the custom sink saw every row
    assert(graft.testplugins.CapturingOutput.seen.size == 4)
  }

  test("custom corpus-level plugin: applies, and rejects box options") {
    val df = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "text")
    val stage = Planner.filterStage("Custom",
      Map("class" -> "graft.testplugins.EvenIdSampler"))
    assert(stage(df).select("id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))

    val e = intercept[RuntimeException] {
      Planner.filterStage("Custom", Map(
        "class" -> "graft.testplugins.EvenIdSampler",
        "failTag" -> "x"))(df)
    }
    assert(e.getMessage.contains("corpus-level"), e.getMessage)
  }

  test("a class WITH a companion object constructs the class, not the companion") {
    // r14 fix: the MODULE$ fallback used to return the companion (which
    // implements nothing) for any companioned plugin class — a valid
    // plugin then failed the build as "implements none of ..."
    val df = (0L until 9L).map(i => (i, s"t$i")).toDF("id", "text")
    val stage = Planner.filterStage("Custom", Map(
      "class" -> "graft.testplugins.CompanionedSampler", "keep_mod" -> 3))
    assert(stage(df).select("id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 3L, 6L))
  }

  test("function-object plugin resolves by its source-level object name") {
    val df = Seq(Some("a"), None, Some("b")).toDF("message")
    val stage = Planner.filterStage("Custom",
      Map("class" -> "graft.testplugins.DropNullMessage"))
    assert(stage(df).count() == 2)
  }

  test("plugin errors are loud and name the class") {
    val df = Seq(("x")).toDF("message")
    val missing = intercept[RuntimeException] {
      Planner.filterStage("Custom", Map("class" -> "com.nope.Missing"))(df)
    }
    assert(missing.getMessage.contains("com.nope.Missing"), missing.getMessage)
    // a resolvable class that implements none of the seams
    val wrong = intercept[RuntimeException] {
      Planner.filterStage("Custom",
        Map("class" -> "java.lang.StringBuilder"))(df)
    }
    assert(wrong.getMessage.contains("implements none"), wrong.getMessage)
    // a Function1 of the WRONG element types: type erasure would let it
    // through the `case Function1` match and CCE at first application —
    // the build must reject it loudly instead (r12 ADVICE)
    val wrongFn = intercept[RuntimeException] {
      Planner.filterStage("Custom",
        Map("class" -> "graft.testplugins.WrongTypeFn"))(df)
    }
    assert(wrongFn.getMessage.contains("not (DataFrame"), wrongFn.getMessage)
    assert(wrongFn.getMessage.contains("WrongTypeFn"), wrongFn.getMessage)
  }
}
