package graft.codecs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CodecsSpec extends SparkSpec {
  import spark.implicits._

  test("plainDecode wraps the raw line as message + @timestamp") {
    val out = Codecs.plainDecode(Seq("raw line").toDF("value")).collect().head
    assert(out.getString(out.fieldIndex("message")) == "raw line")
    assert(out.getTimestamp(out.fieldIndex("@timestamp")) != null)
  }

  test("jsonDecode parses good rows and falls back to plain on bad ones") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val out = Codecs.jsonDecode(
      Seq("""{"a": 1, "b": "x"}""", "not json at all").toDF("value"), schema)
      .orderBy(col("a").asc_nulls_last).collect()
    assert(out(0).getLong(out(0).fieldIndex("a")) == 1L)
    assert(out(0).getString(out(0).fieldIndex("b")) == "x")
    assert(out(0).isNullAt(out(0).fieldIndex("message")))
    assert(out(1).isNullAt(out(1).fieldIndex("a")))
    assert(out(1).getString(out(1).fieldIndex("message")) == "not json at all")
  }

  test("jsonDecode: a schema declaring message/@timestamp MERGES, never duplicates") {
    // json.* + the fallback columns produced two `message` columns for
    // the (normal) log schema that has one — every later reference threw
    // AMBIGUOUS_REFERENCE (r14 fix). Parsed rows take the parsed value,
    // fallback rows the raw line.
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("message", StringType)))
    val out = Codecs.jsonDecode(
      Seq("""{"a": 1, "message": "parsed msg"}""", "garbage{").toDF("value"),
      schema)
    assert(out.columns.count(_ == "message") == 1)
    val rows = out.orderBy(col("a").asc_nulls_last).collect()
    assert(rows(0).getString(rows(0).fieldIndex("message")) == "parsed msg")
    assert(rows(1).getString(rows(1).fieldIndex("message")) == "garbage{")
    // downstream references resolve (the old frame threw here)
    assert(out.filter(col("message").contains("msg")).count() == 1)
  }

  test("jsonDecode: empty/field-less objects parse (no fallback); non-objects fall back") {
    val schema = StructType(Seq(StructField("a", LongType)))
    val out = Codecs.jsonDecode(
      Seq("{}", "\n\t{\"other\": 1}", "42", "[1,2]").toDF("value"), schema)
      .collect()
    // valid objects missing every schema field are PARSED events with null
    // fields, not parse failures (the old to_json probe misrouted them);
    // leading tabs/newlines before the brace are still objects
    assert(out(0).isNullAt(out(0).fieldIndex("a")) &&
      out(0).isNullAt(out(0).fieldIndex("message")))
    assert(out(1).isNullAt(out(1).fieldIndex("a")) &&
      out(1).isNullAt(out(1).fieldIndex("message")))
    // valid JSON that is not an object cannot become an event → plain path
    assert(out(2).getString(out(2).fieldIndex("message")) == "42")
    assert(out(3).getString(out(3).fieldIndex("message")) == "[1,2]")
  }

  test("jsonEncode/formatEncode render rows to text") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val js = Codecs.jsonEncode(df).as[String].head()
    assert(js == """{"id":1,"name":"x"}""")
    val fmt = Codecs.formatEncode(df, "{{.name}}:{{.id}}").as[String].head()
    assert(fmt == "x:1")
  }
}
