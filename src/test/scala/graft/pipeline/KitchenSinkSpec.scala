package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every per-event filter the reference ships, in ONE YAML chain — the
  * "switch your gohangout config over" demonstration. */
class KitchenSinkSpec extends SparkSpec {
  import spark.implicits._

  test("full reference filter chain runs as one declarative pipeline") {
    val yaml =
      """filters:
        |  - Grok:
        |      src: message
        |      match: ['^%{WORD:verb} %{NOTSPACE:path} %{INT:status} %{NUMBER:latency} %{NOTSPACE:kvs} %{GREEDYDATA:rest}$']
        |  - Convert:
        |      fields:
        |        status: {to: int}
        |        latency: {to: float}
        |  - Date: {src: ts, formats: ['2006-01-02 15:04:05'], target: '@timestamp'}
        |  - KV:
        |      src: kvs
        |      field_split: ','
        |      value_split: '='
        |      include_keys: [region, tier]
        |  - Split:
        |      src: path
        |      sep: '/'
        |      fields: [lead, root, section]
        |  - Translate:
        |      source: region
        |      target: region_name
        |      dictionary: {us: United States, de: Germany}
        |  - Gsub:
        |      fields: [[rest, '\d+', 'N']]
        |  - Replace: {src: rest, old: 'N', new: 'num', count: 1}
        |  - Uppercase: {fields: [verb]}
        |  - Lowercase: {fields: [tier]}
        |  - URLDecode: {fields: [section]}
        |  - Add:
        |      fields:
        |        summary: '{{.verb}} {{.section}} from {{.region_name}}'
        |        latency_x2: '{{multiply .latency 2}}'
        |  - Rename: {fields: {verb: http_verb}}
        |  - Remove: {fields: [kvs, message]}
        |  - Drop: {if: ['EQ(status,500)']}
        |""".stripMargin

    val input = Seq(
      ("get /api/user%20list 200 12.5 region=us,tier=GOLD trailing 42 stuff", "2024-02-01 10:00:00"),
      ("post /api/orders 500 99.0 region=de,tier=SILVER boom 7", "2024-02-01 10:00:01"),
    ).toDF("message", "ts")

    val out = Planner.fromYaml(yaml).transform(input)
    val rows = out.collect()
    assert(rows.length == 1) // the 500 row was dropped
    val r = rows.head
    def s(c: String) = r.getString(r.fieldIndex(c))
    assert(s("http_verb") == "GET")
    assert(s("section") == "user list")     // url-decoded %20
    assert(r.getLong(r.fieldIndex("status")) == 200L)
    assert(r.getDouble(r.fieldIndex("latency")) == 12.5)
    assert(s("region_name") == "United States")
    assert(s("tier") == "gold")
    assert(s("root") == "api")
    assert(r.isNullAt(r.fieldIndex("lead")))  // leading '/' → blank → null
    assert(s("rest") == "trailing num stuff")
    assert(s("summary") == "GET user list from United States")
    assert(s("latency_x2") == "25.0")
    assert(r.getTimestamp(r.fieldIndex("@timestamp")) ==
      java.sql.Timestamp.valueOf("2024-02-01 10:00:00"))
    assert(!out.columns.contains("kvs") && !out.columns.contains("message"))
  }
}
