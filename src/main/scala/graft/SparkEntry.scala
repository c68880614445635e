package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.filters._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is written so Spark and the DuckDB oracle agree bit-for-bit:
  * sums are accumulated in exact DECIMAL and only cast to DOUBLE at the end
  * (decimal → double conversion is deterministic and order-independent,
  * unlike a floating-point sum).
  */
object SparkEntry {

  /** Exact decimal for money/quantity accumulation. Scale 4 means no
    * double value can sit on a rounding midpoint (x.xxxx5 is never a
    * binary fraction), so Spark and DuckDB round identically. */
  private val Dec = DecimalType(18, 4)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation core (LinkStatsMetric-style partial/final agg) ----
    "q1_pricing" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(Dec)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(Dec)).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice".cast(Dec) * ($"l_discount".cast(Dec) * lit(-1) + lit(1))))
            .cast("double").as("sum_disc_price"),
          (sum($"l_quantity".cast(Dec)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ---- LinkMetric: event-time tumbling-window multi-level count ----
    // reference: filter/link_metric.go (fieldsLink 'a->b' nested counts)
    "q_link_metric" -> { (s, dir) =>
      graft.operators.LinkMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->user_id", batchWindowSec = 3600, tsColumn = "ts"))(
        Tables.load(s, dir, "events"))
    },

    // ---- LinkStatsMetric: windowed count/sum/min/max/mean ----
    // reference: filter/link_stats_metric.go
    "q_link_stats" -> { (s, dir) =>
      graft.operators.LinkStatsMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->value", batchWindowSec = 3600, tsColumn = "ts"))(
        Tables.load(s, dir, "events"))
    },

    // ---- condition DSL (reference: condition_filter) compiled to a
    //      pushed-down Catalyst predicate ----
    "q_condition_dsl" -> { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val dsl = """(EQ(event_type,"error") || HasPrefix(event_type,"sign"))""" +
        """ && !EQ($.props.k,0) && Contains(props,"k")"""
      ev.filter(graft.conditions.ConditionFilter.compile(dsl, ev))
        .select("event_id", "event_type", "value", "user_id")
    },

    // ---- per-event filter operators through the declarative chain ----
    // Grok: synthesize a log line, parse it back (reference: filter/grok.go)
    "q_grok" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .withColumn("message",
          concat($"event_type", lit(" "), $"user_id", lit(" "), $"value".cast("string")))
      val grokked = FilterBox(GrokFilter("message",
        Seq("""^%{WORD:etype} %{INT:uid} %{NUMBER:val}$"""))).stage(ev)
      grokked.select($"event_id", $"etype", $"uid", $"val")
    },

    // Date: format → parse round-trip, first-match-wins across formats
    "q_date" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .withColumn("t", date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
      val dated = FilterBox(DateFilter("t",
        Seq("02/Jan/2006:15:04:05", "2006-01-02 15:04:05"), target = "parsed")).stage(ev)
      dated.select($"event_id", $"parsed")
    },

    // Json + Convert: extract JSON field, cast with failure handling
    "q_json_convert" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val parsed = FilterBox(JsonFilter("props", target = Some("pm"))).stage(ev)
        .withColumn("k", element_at($"pm", "k"))
      val conv = FilterBox(ConvertFilter(Map(
        "k" -> ConvertFilter.Spec("int")))).stage(parsed)
      conv.select($"event_id", $"k")
    },

    // Split + KV over a synthesized payload
    "q_split_kv" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .withColumn("kvline", concat(lit("type="), $"event_type", lit(" uid="), $"user_id"))
        .withColumn("psv", concat($"event_type", lit("|"), $"user_id"))
      val kv = FilterBox(KvFilter("kvline", " ", "=", includeKeys = Seq("type", "uid"))).stage(ev)
      val sp = FilterBox(SplitFilter("psv", "|", Seq("p1", "p2"))).stage(kv)
      sp.select($"event_id", $"type", $"uid", $"p1", $"p2")
    },

    // Gsub / Replace(count) / case folding on documents
    "q_strings" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val st1 = FilterBox(GsubFilter(Seq(("text", """\s+""", "_")))).stage(docs)
      val st2 = FilterBox(ReplaceFilter("text", "spark", "SPARK", count = 2)).stage(st1)
      val st3 = FilterBox(CaseFilter(Seq("lang"), upper = true)).stage(st2)
      st3.select($"doc_id", $"text", $"lang")
    },

    // Add/Rename/Remove + Translate dictionary enrichment
    "q_enrich" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val chain = Seq(
        FilterBox(AddFilter(Map("combo" -> "{{.event_type}}-{{.user_id}}"))).stage,
        FilterBox(TranslateFilter("event_type", "code", Map(
          "error" -> "E", "purchase" -> "P", "signup" -> "S"))).stage,
        FilterBox(RenameFilter(Map("user_id" -> "uid"))).stage,
        FilterBox(RemoveFilter(Seq("props", "value", "ts", "event_type"))).stage,
      )
      chain.foldLeft(ev.toDF())((d, f) => f(d))
    },

    // ---- join pipeline (Translate/IPIP-style enrichment at scale:
    //      dims are broadcast, fact side never shuffles for the join) ----
    "q5_region_revenue" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val o  = Tables.load(s, dir, "orders")
      val c  = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n  = Tables.load(s, dir, "nation")
      val r  = Tables.load(s, dir, "region")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(su), $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .where($"r_name" === "ASIA" &&
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice".cast(Dec) * ($"l_discount".cast(Dec) * lit(-1) + lit(1))))
          .cast("double").as("revenue"))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_link_metric" ->
      """SELECT date_trunc('hour', ts) AS "@timestamp", event_type, user_id,
        |  count(*) AS count
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_link_stats" ->
      """SELECT date_trunc('hour', ts) AS "@timestamp", event_type,
        |  count(value) AS count,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum,
        |  min(value) AS min,
        |  max(value) AS max,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS mean
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_condition_dsl" ->
      """SELECT event_id, event_type, value, user_id
        |FROM events
        |WHERE (event_type = 'error' OR event_type LIKE 'sign%')
        |  AND NOT (CAST(json_extract_string(props, '$.k') AS DOUBLE) = 0)
        |  AND contains(props, 'k')""".stripMargin,

    "q_grok" ->
      """SELECT event_id,
        |  regexp_extract(msg, '^(\w+) ([+-]?[0-9]+) ([+-]?[0-9]+(?:\.[0-9]+)?)$', 1) AS etype,
        |  regexp_extract(msg, '^(\w+) ([+-]?[0-9]+) ([+-]?[0-9]+(?:\.[0-9]+)?)$', 2) AS uid,
        |  regexp_extract(msg, '^(\w+) ([+-]?[0-9]+) ([+-]?[0-9]+(?:\.[0-9]+)?)$', 3) AS val
        |FROM (SELECT event_id,
        |        event_type || ' ' || user_id || ' ' || CAST(value AS VARCHAR) AS msg
        |      FROM events)""".stripMargin,

    "q_date" ->
      """SELECT event_id,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM events""".stripMargin,

    "q_json_convert" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_split_kv" ->
      """SELECT event_id, event_type AS type, CAST(user_id AS VARCHAR) AS uid,
        |  event_type AS p1, CAST(user_id AS VARCHAR) AS p2
        |FROM events""".stripMargin,

    "q_strings" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text, '\s+', '_', 'g'),
        |    'spark', 'SPARK'), 'spark', 'SPARK') AS text,
        |  upper(lang) AS lang
        |FROM documents""".stripMargin,

    "q_enrich" ->
      """SELECT event_id,
        |  event_type || '-' || CAST(user_id AS VARCHAR) AS combo,
        |  CASE event_type WHEN 'error' THEN 'E' WHEN 'purchase' THEN 'P'
        |    WHEN 'signup' THEN 'S' ELSE NULL END AS code,
        |  user_id AS uid
        |FROM events""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
  )
}
