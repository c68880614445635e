package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.filters._

/** Gate-layer mutation audit, round 5: the as-of, ANN-audit, link-graph,
  * corpus-diff, and gohangout-operator families. Same contract as
  * OracleMutationSpec / OracleMutation2Spec — one plausible seeded bug
  * per test, same output schema, the driver's canonical compare must
  * tell it from the shipped gate. */
class OracleMutation3Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")
  private def events: DataFrame = Tables.load(spark, dir, "events")

  // ---- as-of joins ----

  test("q_asof_forward: a backward-direction bug changes the matches") {
    assertCaught("q_asof_forward") {
      val purchases = events.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.leftAsOf(
        events.select($"event_id", $"user_id", $"ts"), purchases,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("value"), suffix = "_purchase")
        .select($"event_id", $"user_id", $"ts", $"ts_purchase", $"value_purchase")
    }
  }

  test("q_asof_nearest: collapsing nearest to backward-only loses " +
      "forward-nearer matches") {
    assertCaught("q_asof_nearest") {
      val purchases = events.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.leftAsOf(
        events.select($"event_id", $"user_id", $"ts"), purchases,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("value"), suffix = "_purchase")
        .select($"event_id", $"user_id", $"ts", $"ts_purchase", $"value_purchase")
    }
  }

  // ---- ANN audit ----

  test("q_ann_probes: probing fewer cells than configured is caught") {
    assertCaught("q_ann_probes") {
      val emb = Tables.load(spark, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 5)
      def stats(np: Int, label: Int) = graft.ml.Similarity.ivfProbeStats(
          emb, qs, "embedding", "vec_id", numCells = 16, nprobe = np)
        .select(lit(label).as("nprobe"), col("query_id"),
          col("n_cells"), col("n_candidates"))
      // bug: the nprobe=3 arm actually probes 2 cells
      stats(1, 1).unionByName(stats(2, 3))
    }
  }

  test("q_embed_topk: ranking by raw dot product (normalization dropped) " +
      "is caught") {
    assertCaught("q_embed_topk") {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val c = emb.select($"vec_id", $"embedding".as("cv"))
      val dot = aggregate(zip_with($"qv", $"cv", (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"sim".desc, $"vec_id")
      c.crossJoin(broadcast(q)).withColumn("sim", dot)
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select("query_id", "vec_id", "rank", "sim")
    }
  }

  // ---- dedup / decontamination ----

  test("q_hamming_drop: a tightened hamming radius keeps near-dups") {
    assertCaught("q_hamming_drop") {
      graft.ml.Dedup.dropDuplicatesHammingBy(docs, "text", "doc_id",
        graft.ml.Dedup.simhash32, totalBits = 32, k = 2, bands = 4)
        .select($"doc_id", $"source")
    }
  }

  test("q_passage_strip: a window longer than the planted passage strips " +
      "nothing") {
    assertCaught("q_passage_strip") {
      val shared = " the quick brown fox jumps over the lazy sleeping dog tonight"
      val multi = docs.select($"doc_id",
        concat($"text",
          when($"doc_id" % 5 === 0, lit(shared)).otherwise(lit("")))
          .as("text"))
      // bug: k = 12 > the 11-token shared passage — detection misses it
      graft.ml.Dedup.stripDuplicatedPassages(multi, "text", "doc_id",
          k = 12, minDocs = 2)
        .select($"doc_id", $"text")
    }
  }

  test("q_contamination_report: a longer contamination n-gram shrinks " +
      "the report") {
    assertCaught("q_contamination_report") {
      graft.ml.Dedup.contaminationReport(docs,
        docs.filter($"doc_id" < 10).withColumnRenamed("doc_id", "bid"),
        "text", "doc_id", "bid", n = 7)
    }
  }

  // ---- link graph ----

  test("q_outlinks: an extractor blind to single-quoted/uppercase hrefs " +
      "loses links") {
    assertCaught("q_outlinks") {
      val html = docs.select($"doc_id", concat(
        $"text",
        lit(" <a href=\"http://h"), ($"doc_id" % 13).cast("string"),
        lit(".example/p/"), $"doc_id".cast("string"), lit("\">x</a>"),
        lit(" <A HREF='HTTPS://H"), (($"doc_id" + 5) % 13).cast("string"),
        lit(".EXAMPLE/q'>y</A>")).as("html"))
      // bug: only lowercase double-quoted href= forms are extracted
      html.select($"doc_id",
          explode(regexp_extract_all($"html", lit("href=\"([^\"]+)\""), lit(1)))
            .as("dst_url"))
        .select($"doc_id", $"dst_url",
          graft.ml.LinkGraph.host($"dst_url").as("dst_host"))
    }
  }

  test("q_host_graph: keeping self-loop edges inflates the graph") {
    assertCaught("q_host_graph") {
      val links = docs.select(
        concat(lit("http://h"), ($"doc_id" % 13).cast("string"),
          lit(".example/p/"), $"doc_id".cast("string")).as("src_url"),
        concat(lit("https://h"), (($"doc_id" * 3 + 1) % 13).cast("string"),
          lit(".example/q")).as("dst_url"))
      links.select(graft.ml.LinkGraph.host($"src_url").as("src_host"),
          graft.ml.LinkGraph.host($"dst_url").as("dst_host"))
        .filter($"src_host".isNotNull && $"dst_host".isNotNull)
        .groupBy("src_host", "dst_host").agg(count(lit(1)).as("n_links"))
    }
  }

  // ---- corpus assembly ----

  test("q_corpus_diff: a presence-only diff misses changed documents") {
    assertCaught("q_corpus_diff") {
      val old = docs.filter($"doc_id" % 10 =!= 3)
        .withColumn("text", when($"doc_id" % 10 === 5,
          concat($"text", lit(" v2"))).otherwise($"text"))
      // bug: diff joins on id presence alone — stale-text rows read as
      // unchanged and vanish from the report
      val o = old.select($"doc_id".as("id"), lit(1).as("__o"))
      val n = docs.select($"doc_id".as("id"), lit(1).as("__n"))
      o.join(n, Seq("id"), "full_outer")
        .select($"id", when($"__o".isNull, "added")
          .when($"__n".isNull, "removed").otherwise("unchanged").as("status"))
        .filter($"status" =!= "unchanged")
    }
  }

  test("q_mix_apply: a keep-fraction seed drift re-draws the sample") {
    assertCaught("q_mix_apply") {
      val plan = graft.ml.DatasetOps.planMixture(docs, "source", "text",
        Map("src0" -> 3.0, "src1" -> 2.0), 1.0, 30000L)
      graft.ml.DatasetOps.applyMixture(docs, plan, "source",
          graft.ml.DatasetOps.portable01(col("doc_id"), seed = 4))
        .select("doc_id", "source")
    }
  }

  test("q_column_profile: a column silently dropped from the profile " +
      "is caught") {
    assertCaught("q_column_profile") {
      graft.ml.DatasetOps.profileColumns(docs,
        Seq("text", "lang", "source"))
    }
  }

  // ---- events operators ----

  test("q_sequence_match: a dropped middle step re-flags users " +
      "(gate re-sliced to day one so the flag is selective)") {
    // Over the full 30-day fixture EVERY user matched ANY 3-step
    // pattern (constant-true flag, pattern bugs invisible) — the gate
    // now evaluates the sparse day-one slice.
    assertCaught("q_sequence_match") {
      graft.operators.Funnel.sequenceMatch(
        events.filter($"ts" < "2024-01-02"), "user_id", "ts",
        Seq($"event_type" === "view", $"event_type" === "purchase"))
    }
  }

  // ---- gohangout operator surface ----

  test("q_split_kv: a wrong key/value separator nulls the parsed fields") {
    assertCaught("q_split_kv") {
      val ev = events
        .withColumn("kvline", concat(lit("type="), $"event_type", lit(" uid="), $"user_id"))
        .withColumn("psv", concat($"event_type", lit("|"), $"user_id"))
      val kv = FilterBox(KvFilter("kvline", " ", ":",
        includeKeys = Seq("type", "uid"))).stage(ev)
      val sp = FilterBox(SplitFilter("psv", "|", Seq("p1", "p2"))).stage(kv)
      sp.select($"event_id", $"type", $"uid", $"p1", $"p2")
    }
  }

  test("q_fail_tag: a renamed failure tag is caught") {
    assertCaught("q_fail_tag") {
      val ev = events.withColumn("message",
        when($"event_id" % 2 === 0, concat($"event_type", lit(" "), $"user_id"))
          .otherwise(concat(lit("!bad "), $"event_type")))
      FilterBox(GrokFilter("message", Seq("""^%{WORD:w} %{INT:n}$""")),
          failTag = Some("_grok_fail")).stage(ev)
        .select($"event_id", $"w", $"n", array_join($"tags", ",").as("tag"))
    }
  }

  test("q_translate_file: a dictionary missing an entry nulls its rows") {
    assertCaught("q_translate_file") {
      val dictFile = java.nio.file.Files.createTempFile("graft_mut_dict", ".yml")
      java.nio.file.Files.writeString(dictFile, "error: E\npurchase: P\n")
      FilterBox(TranslateFilter("event_type", "code", Map.empty,
        Some(dictFile.toString), refreshIntervalSec = 300)).stage(events)
        .select($"event_id", $"event_type", $"code")
    }
  }

  test("q_sprig: a truncation-length drift changes the rendered field") {
    assertCaught("q_sprig") {
      val ev = events
        .withColumn("maybe", when($"event_id" % 3 === 0, $"event_type"))
        .withColumn("is_even", $"event_id" % 2 === 0)
        .withColumn("phrase",
          concat($"event_type", lit(" "), $"event_type", lit(" end")))
      val chain = FilterBox(AddFilter(Map(
        "filled" -> "{{default \"none\" .maybe}}",
        "flag" -> "{{ternary \"even\" \"odd\" .is_even}}",
        "b64" -> "{{b64enc .event_type}}",
        "short" -> "{{trunc 4 .event_type}}", // bug: 3 → 4
        "usum" -> "{{add .user_id 7}}",
        "sj" -> "{{join \"|\" (splitList \" \" .phrase)}}",
        "uq" -> "{{join \"|\" (uniq (splitList \" \" .phrase))}}",
        "fw" -> "{{first (splitList \" \" .phrase)}}",
        "lw" -> "{{last (splitList \" \" .phrase)}}",
        "rx" -> "{{regexMatch \"^p\" .event_type}}",
        "rr" -> "{{regexReplaceAll \"[aeiou]\" .event_type \"_\"}}",
        "sha" -> "{{sha256sum .event_type}}"))).stage(ev)
      chain.select($"event_id", $"filled", $"flag", $"b64", $"short",
        $"usum", $"sj", $"uq", $"fw", $"lw", $"rx", $"rr", $"sha")
    }
  }
}
