package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.filters._

/** Gate-layer mutation audit, round 6: funnel modes, link metrics,
  * retention, stores, mixture/band/clean, and the remaining string/
  * conform kernels. Same contract as OracleMutationSpec rounds 1-5. */
class OracleMutation4Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")
  private def events: DataFrame = Tables.load(spark, dir, "events")

  private val steps = Seq($"event_type" === "view", $"event_type" === "click",
    $"event_type" === "purchase")

  // ---- funnels ----

  test("q_funnel: a shrunken window re-levels users") {
    assertCaught("q_funnel") {
      graft.operators.Funnel.windowFunnel(events, "user_id", "ts", steps,
        windowSec = 3600L)
    }
  }

  test("q_funnel_dedup: ignoring the strict-dedup flag is caught") {
    assertCaught("q_funnel_dedup") {
      graft.operators.Funnel.windowFunnel(events, "user_id", "ts", steps,
        windowSec = 86400L) // bug: strictDedup silently dropped
    }
  }

  test("q_funnel_increase: ignoring the strict-increase flag is caught " +
      "(gate ts truncated to the hour so ties exist)") {
    // The raw microsecond fixture has NO tied timestamps, so
    // strict_increase was output-identical to the plain funnel — the
    // gate now truncates ts to the hour, where same-hour steps tie.
    assertCaught("q_funnel_increase") {
      graft.operators.Funnel.windowFunnel(
        events.withColumn("ts", date_trunc("hour", $"ts")),
        "user_id", "ts", steps,
        windowSec = 86400L) // bug: strictIncrease silently dropped
    }
  }

  test("q_sequence_count: a reordered step pattern recounts the chains") {
    assertCaught("q_sequence_count") {
      graft.operators.Funnel.sequenceCount(events, "user_id", "ts",
        Seq($"event_type" === "purchase", $"event_type" === "click",
          $"event_type" === "view"))
    }
  }

  test("q_retention_flags: un-anchored follow-up flags are caught " +
      "(gate re-sliced to day one so the flags vary)") {
    // Over the full 30-day fixture every user had all three types —
    // flags were constant (1,1,1) and this bug class was invisible.
    assertCaught("q_retention_flags") {
      // bug: r2/r3 don't require the anchor (signup) to have fired
      events.filter($"ts" < "2024-01-02").groupBy($"user_id")
        .agg(max(when($"event_type" === "signup", 1).otherwise(0)).as("r1"),
          max(when($"event_type" === "view", 1).otherwise(0)).as("r2"),
          max(when($"event_type" === "purchase", 1).otherwise(0)).as("r3"))
    }
  }

  // ---- link metrics ----

  test("q_link_stats: a doubled batch window rebins the stats") {
    assertCaught("q_link_stats") {
      graft.operators.LinkStatsMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->value", batchWindowSec = 7200,
        tsColumn = "ts"))(events)
    }
  }

  test("q_link_uniq: counting rows instead of distinct users is caught") {
    assertCaught("q_link_uniq") {
      events.select(date_trunc("hour", $"ts").as("@timestamp"),
          $"event_type", $"user_id")
        .groupBy($"@timestamp", $"event_type")
        .agg(count($"user_id").as("uniq"))
    }
  }

  // ---- sinks / codec-adjacent ----

  test("q_ch_conform: nulling a failed cast instead of defaulting is caught") {
    assertCaught("q_ch_conform") {
      import graft.sinks.ClickHouseWriter.ChColumn
      val ev = events.withColumn("etype_num", col("event_type"))
      graft.sinks.ClickHouseWriter.conform(ev, Seq(
        ChColumn("event_id", "Int64"),
        ChColumn("event_type", "LowCardinality(String)"),
        ChColumn("user_id", "Nullable(Int64)"),
        ChColumn("value", "Float64"),
        ChColumn("etype_num", "Nullable(Int32)"), // bug: null, not default 0
        ChColumn("note", "String")))
    }
  }

  test("q_strings: a counted replace that stops one short is caught") {
    assertCaught("q_strings") {
      val st1 = FilterBox(GsubFilter(Seq(("text", """\s+""", "_")))).stage(docs)
      val st2 = FilterBox(ReplaceFilter("text", "spark", "SPARK", count = 1)).stage(st1)
      val st3 = FilterBox(CaseFilter(Seq("lang"), upper = true)).stage(st2)
      st3.select($"doc_id", $"text", $"lang")
    }
  }

  test("q_rolling_fp: a polynomial-base drift rehashes every document") {
    assertCaught("q_rolling_fp") {
      val chars = split($"text", "")
      docs.select($"doc_id",
        when(length($"text") > 0,
          aggregate(chars, lit(0L), (acc, ch) => (acc * 33L + ascii(ch)) % 1000000007L))
          .otherwise(lit(0L)).as("rhash"))
    }
  }

  // ---- corpus assembly ----

  test("q_mix_sample: a per-source weight drift re-draws that source") {
    assertCaught("q_mix_sample") {
      graft.ml.DatasetOps.sampleByWeights(docs, "source",
        Map("src0" -> 1.0, "src1" -> 0.35, "src2" -> 0.0),
        defaultWeight = 0.5,
        graft.ml.DatasetOps.portable01($"doc_id", seed = 7))
        .select($"doc_id", $"source")
    }
  }

  test("q_corpus_clean: a raised token floor drops borderline documents") {
    assertCaught("q_corpus_clean") {
      val good = docs
        .withColumn("n_tokens", graft.ml.TextAnalysis.tokenCount($"text"))
        .withColumn("distinct_ratio", graft.ml.TextAnalysis.distinctTokenRatio($"text"))
        .filter($"n_tokens" >= 25 && $"distinct_ratio" >= 0.5)
      val pairs = graft.ml.Dedup.minhashPairs(good, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9)
      graft.ml.Dedup.dropDuplicates(good, pairs, "doc_id")
        .select($"doc_id", $"n_tokens", $"distinct_ratio")
    }
  }

  test("q_quality_band: a lowered quantile cut admits worse documents") {
    assertCaught("q_quality_band") {
      graft.ml.TextAnalysis.qualityBand(docs, "text", "doc_id", p = 0.6)
    }
  }

  // ---- dedup clustering / stores ----

  test("q_dedup_best: scoring clusters by the wrong column elects " +
      "different representatives") {
    assertCaught("q_dedup_best") {
      graft.ml.Dedup.dropDuplicatesClusteredBest(
        docs, graft.ml.Dedup.minhashPairs(docs, "text", "doc_id",
          shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9),
        "doc_id", "doc_id").select("doc_id", "n_chars")
    }
  }

  test("q_host_graph_store: merging store partials by max instead of " +
      "sum undercounts every edge") {
    assertCaught("q_host_graph_store") {
      def links(d: DataFrame) = d.select(
        concat(lit("http://h"), ($"doc_id" % 13).cast("string"),
          lit(".example/p/"), $"doc_id".cast("string")).as("src_url"),
        concat(lit("https://h"), (($"doc_id" * 3 + 1) % 13).cast("string"),
          lit(".example/q")).as("dst_url"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-mut-hgs").toString + "/edges"
      graft.ml.LinkGraph.appendToHostGraphStore(
        links(docs.filter($"doc_id" < 250)), "src_url", "dst_url", store)
      graft.ml.LinkGraph.appendToHostGraphStore(
        links(docs.filter($"doc_id" >= 250)), "src_url", "dst_url", store)
      spark.read.parquet(store)
        .groupBy("src_host", "dst_host")
        .agg(max("n_links").as("n_links")) // bug: max, not sum
    }
  }
}
