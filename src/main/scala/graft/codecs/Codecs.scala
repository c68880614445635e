package graft.codecs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.render.Render

/** Codecs (reference: codec/) as explicit DataFrame stages.
  *
  * The reference decodes one event at a time; here a codec is a
  * projection over a raw `value` column, so decode fuses into the scan
  * and downstream filters under whole-stage codegen.
  */
object Codecs {

  /** plain: `{message: raw, @timestamp: now}`
    * (reference: codec/plain_decoder.go:8-13). */
  def plainDecode(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(col(valueCol).cast("string").as("message"),
      current_timestamp().as("@timestamp"))

  /** json: parse with a schema; rows that fail to parse fall back to the
    * plain behavior — raw line in `message` — exactly the reference's
    * fallback (codec/json_decoder.go:20-28; Logstash `_jsonparsefailure`
    * analogue). Schema-first keeps the parse codegen'd and prunable; pass
    * the schema rather than inferring in production. */
  def jsonDecode(df: DataFrame, schema: StructType,
      valueCol: String = "value"): DataFrame = {
    val raw = col(valueCol).cast("string")
    val parsed = from_json(raw, schema)
    // Parse-only failure test, like the reference's Unmarshal-into-map:
    // invalid JSON (try_parse_json null) or valid JSON that is not an
    // object (a bare scalar/array can't become an event). An empty object
    // or one missing every schema field parses fine — null fields, no
    // fallback. The object probe is a regex (ltrim strips only ASCII
    // spaces; JSON allows leading tabs/newlines too).
    val failed = raw.isNull || try_parse_json(raw).isNull ||
      !raw.rlike("""^\s*\{""")
    // a schema that itself declares `message`/`@timestamp` (normal for
    // log events) must MERGE with the fallback columns, not duplicate
    // them — json.* + message produced two `message` columns and every
    // later reference threw AMBIGUOUS_REFERENCE
    val base = df.select(
      when(!failed, parsed).as("json"),
      when(failed, raw).as("__graft_raw"))
    val jsonFields = schema.fieldNames
      .filterNot(n => n == "message" || n == "@timestamp")
      .map(n => col("json").getField(n).as(n)).toSeq
    val msg =
      if (schema.fieldNames.contains("message"))
        coalesce(col("json").getField("message").cast("string"),
          col("__graft_raw"))
      else col("__graft_raw")
    val ts =
      if (schema.fieldNames.contains("@timestamp"))
        coalesce(col("json").getField("@timestamp").cast("timestamp"),
          current_timestamp())
      else current_timestamp()
    base.select(jsonFields ++
      Seq(msg.as("message"), ts.as("@timestamp")): _*)
  }

  /** json encode: one JSON text per row over all columns
    * (reference: codec/json_encoder.go). */
  def jsonEncode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(c => col(s"`$c`")): _*)).as("value"))

  /** format encode: render a value-render template per row
    * (reference: codec/format_encoder.go:15-31). */
  def formatEncode(df: DataFrame, template: String): DataFrame =
    df.select(Render.compile(template)(df).cast("string").as("value"))
}
