package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Gate-layer mutation audit, round 4 (extends OracleMutationSpec's
  * program to the operator families it had not yet reached). Same
  * contract: each test seeds ONE plausible Spark-side bug into a
  * re-derivation of a shipped gate — same output schema, one kernel or
  * parameter defect — and asserts the driver's canonical compare
  * (columns sorted by name, rows sorted, exact rendered values) tells
  * them apart. A mutation that produces IDENTICAL output means the
  * fixture never exercises the mutated path and the gate could not
  * catch that regression class; three such vacuities were found while
  * authoring this round and fixed by re-planting the fixtures
  * (q_dedup_exact: 500/500 distinct texts made the rep policy
  * invisible; q_dedup_incremental: the halves shared no text so a
  * drop-nothing probe passed; q_geoip: no synthesized ip ever hit a
  * range boundary so inclusive-vs-exclusive bounds were untestable). */
class OracleMutation2Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")

  // ---- exact / fingerprint dedup ----

  test("q_dedup_exact: a max-id representative policy is caught") {
    // only catchable since the r15 fixture replant: the raw corpus is
    // 500/500 distinct texts, every group a singleton
    assertCaught("q_dedup_exact") {
      val d = docs.select("doc_id", "text")
      val all = d.unionByName(d.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 10000).as("doc_id"), $"text"))
      all.groupBy(md5($"text".cast("string")).as("content_hash"))
        .agg(max($"doc_id").as("rep_id"), count(lit(1)).as("cnt"))
    }
  }

  test("q_dedup_fingerprint: a max-id representative policy is caught") {
    assertCaught("q_dedup_fingerprint") {
      docs.groupBy(graft.ml.Dedup.fingerprintCol($"text").as("fingerprint"))
        .agg(max($"doc_id").as("rep_id"), count(lit(1)).as("cnt"))
    }
  }

  test("q_dedup_incremental: a seen-store probe that drops nothing is caught") {
    // only catchable since the r15 fixture replant: the halves shared no
    // text, so the shipped probe also dropped nothing
    assertCaught("q_dedup_incremental") {
      docs.filter($"doc_id" >= 250).select("doc_id", "text")
        .unionByName(docs.filter($"doc_id" < 250 && $"doc_id" % 10 === 0)
          .select(($"doc_id" + 10000).as("doc_id"), $"text"))
        .unionByName(docs.filter($"doc_id" < 250 && $"doc_id" % 50 === 0)
          .select(($"doc_id" + 20000).as("doc_id"),
            concat($"text", lit(" x")).as("text")))
    }
  }

  // ---- near-dup families ----

  test("q_dedup_minhash: a jaccard-threshold drift changes the pair set " +
      "(AUDIT FINDING: band count is fixture-invisible)") {
    // First-pass mutation bands 32→16 produced IDENTICAL pairs: every
    // candidate is verified with EXACT jaccard and the corpus's true
    // pairs all sit at ≥ 0.95 similarity, where both bandings have
    // ~100% recall — banding is a pure candidate-recall knob that only
    // pairs NEAR the 0.9 threshold could expose (recorded in SURVEY's
    // gate-layer audit; the banded join's shape is pinned by
    // PlanQualitySpec instead). The final threshold IS the semantic
    // knob the gate can see.
    assertCaught("q_dedup_minhash") {
      graft.ml.Dedup.minhashPairs(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.95)
    }
  }

  test("q_dedup_simhash: a max-id representative policy is caught " +
      "(AUDIT FINDING: the corpus is all-lowercase)") {
    // First-pass mutation lower(text) produced IDENTICAL output: the
    // sf0.01 corpus has ZERO uppercase characters, so case-folding bugs
    // are invisible to every natural-text gate (gates that need case
    // sensitivity plant their own variants — q_line_dedup, q_blocklist).
    // The rep policy IS exercised: 354 groups from 500 docs means real
    // multi-member groups.
    assertCaught("q_dedup_simhash") {
      docs.select($"doc_id", graft.ml.Dedup.simhash32($"text").as("simhash"))
        .groupBy("simhash")
        .agg(max($"doc_id").as("rep_id"), count(lit(1)).as("cnt"))
    }
  }

  test("q_ngram_jaccard: a shorter shingle order rescores every pair") {
    assertCaught("q_ngram_jaccard") {
      graft.ml.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        blockCol = "source", n = 2, threshold = 0.8)
    }
  }

  test("q_passage_dedup: an overlong window loses short shared passages " +
      "(AUDIT FINDING: k drift DOWN is invisible by construction)") {
    // First-pass mutation k 8→6 produced IDENTICAL spans: windows merge
    // to MAXIMAL shared spans, and every shared span in the corpus is
    // ≥ 8 tokens, so any k ≤ 8 reconstructs the same maximal spans —
    // shrinking k can only ADD sub-8-token discoveries, of which the
    // corpus has none. The catchable direction is k ABOVE a real span's
    // length: that span vanishes.
    assertCaught("q_passage_dedup") {
      graft.ml.Dedup.duplicatedPassages(docs, "text", "doc_id",
        k = 12, minDocs = 2)
    }
  }

  test("q_semantic_dedup: a similarity-threshold drift changes the kept set") {
    assertCaught("q_semantic_dedup") {
      graft.ml.Similarity.semanticDedup(Tables.load(spark, dir, "embeddings"),
        "embedding", "vec_id", numCells = 16, threshold = 0.5)
        .select($"vec_id")
    }
  }

  // ---- text kernels ----

  test("q_pii_scrub: a scrub that misses the IP pattern is caught") {
    assertCaught("q_pii_scrub") {
      val planted = docs.withColumn("text2", concat($"text",
        lit(" contact user"), $"doc_id", lit("@example.com at 10.2."),
        $"doc_id" % 256, lit(".7 or 555-123-4567")))
      val email = regexp_replace(planted("text2"),
        """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>")
      // bug: the IP stage is missing entirely
      planted.select($"doc_id",
        regexp_replace(email, """\b\d{3}[- ]\d{3,4}[- ]\d{4}\b""", "<PHONE>")
          .as("clean"))
    }
  }

  test("q_html_strip: a strip that forgets script/style blocks is caught") {
    assertCaught("q_html_strip") {
      val html = concat(
        lit("<html><head><style>p{color:red}</style></head><body><h1>T</h1><p>"),
        $"text",
        lit("</p><script>var x=1;</script>&amp; &lt;tail&gt;&nbsp;&quot;q&quot;" +
          "&amp;lt;keep&amp;gt;</body></html>"))
      // bug: tags removed but script/style CONTENT leaks into the text
      val noTags = regexp_replace(html, "<[^>]+>", " ")
      val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
      docs.select($"doc_id",
          trim(regexp_replace(decoded, "\\s+", " ")).as("clean"))
        .withColumn("n_clean", length($"clean"))
    }
  }

  test("q_text_normalize: skipping the NFC pass is caught") {
    assertCaught("q_text_normalize") {
      val pre = concat($"text", lit("e\u0301 A\u030A \u212B"))
      docs.select($"doc_id", length(pre).as("n_pre"), pre.as("norm"))
        .withColumn("n_post", length($"norm"))
    }
  }

  test("q_c4_lines: a stricter words-per-line floor re-flags documents") {
    assertCaught("q_c4_lines") {
      val multi = docs.select($"doc_id", concat(
        $"text", lit(".\nshort one\nthis line has six words total."),
        when($"doc_id" % 2 === 0,
          lit("\nanother full sentence with many words here."))
          .otherwise(lit("\nno punct line here at all"))).as("text"))
      graft.ml.TextAnalysis.c4LineFilter(multi, "text", minWordsPerLine = 7)
        .select("doc_id", "clean_text", "n_lines_kept", "keep")
    }
  }

  test("q_heavy_hitters: a raised count threshold shrinks the set") {
    assertCaught("q_heavy_hitters") {
      graft.ml.TextAnalysis.heavyHitters(docs, "text", n = 2, minCount = 25L)
    }
  }

  test("q_block_terms: a tightened hit budget flips keep flags") {
    assertCaught("q_block_terms") {
      val terms = Seq("slow", "merge").toDF("term")
      graft.ml.Blocklist.flagBlockedTerms(docs, "text", "doc_id", terms,
        maxHits = 1).select("doc_id", "bad_hits", "keep")
    }
  }

  // ---- events / joins ----

  test("q_geoip: an exclusive upper range bound un-matches boundary ips") {
    // only catchable since the r15 fixture replant: events 0..24 probe
    // exact ip_to values (no natural ip ever lands on a boundary)
    assertCaught("q_geoip") {
      val ev = Tables.load(spark, dir, "events")
        .withColumn("ipl0", ($"user_id".cast("long") * 9973L +
          $"event_id".cast("long") * 31L) % 4294967296L)
        .withColumn("ipl", when($"event_id" < 25,
            ((($"event_id".cast("long") + 1L) * 4294967296L) / 25L).cast("long") - 1L)
          .when($"event_id" >= 25 && $"event_id" < 50,
            ((($"event_id".cast("long") - 25L) * 4294967296L) / 25L).cast("long"))
          .otherwise($"ipl0"))
        .drop("ipl0")
        .withColumn("ip", graft.operators.GeoIp.longToIp($"ipl"))
      // bug: ranges end one address short (ip_to treated as exclusive)
      val ranges = Tables.load(spark, dir, "nation").select(
        (($"n_nationkey".cast("long") * 4294967296L) / 25L).cast("long").as("ip_from"),
        ((($"n_nationkey".cast("long") + 1L) * 4294967296L) / 25L - 2L).cast("long").as("ip_to"),
        $"n_name".as("country"))
      graft.operators.GeoIp.enrich(ev, ranges, "ip")
        .select($"event_id", $"ip", $"country")
    }
  }

  test("q_salted_join: a right side replicated for only half the salts " +
      "loses matches") {
    assertCaught("q_salted_join") {
      val li = Tables.load(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      val p = Tables.load(spark, dir, "part")
        .select($"p_partkey", $"p_brand", $"p_size")
      val lS = li.withColumn("__salt",
        pmod(xxhash64(li.columns.map(col): _*), lit(8L)).cast("int"))
      // bug: replicas exist only for salts 0..3 — left rows salted 4..7
      // silently lose their match
      val pS = p.withColumn("__salt", explode(sequence(lit(0), lit(3))))
        .withColumnRenamed("p_partkey", "l_partkey")
      lS.join(pS, Seq("l_partkey", "__salt"), "inner")
        .filter($"p_size" <= 5)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"p_brand")
    }
  }

  test("q_link_stats_pct_approx: a collapsed sketch accuracy moves the " +
      "quantiles (gate re-windowed daily so the sketch path is visible)") {
    // At the original hourly windows the (window × type) groups held
    // 1-7 events — below ANY accuracy, the GK sketch stays exact and an
    // accuracy regression was invisible; the gate now windows daily
    // (~70 events/group) so a collapsed accuracy visibly shifts ranks.
    assertCaught("q_link_stats_pct_approx") {
      graft.operators.LinkStatsMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->value", batchWindowSec = 86400,
        tsColumn = "ts", percentiles = Seq(0.5, 0.95, 0.99),
        percentilesApprox = true, approxAccuracy = 10))(
        Tables.load(spark, dir, "events"))
    }
  }

  // ---- corpus ops ----

  test("q_mix_plan: a default-weight drift re-rates every unlisted source") {
    assertCaught("q_mix_plan") {
      graft.ml.DatasetOps.planMixture(docs, "source", "text",
        Map("src0" -> 3.0, "src1" -> 2.0), defaultWeight = 0.5,
        totalBudget = 30000L)
    }
  }

  test("q_split_assign: a split-fraction drift moves the boundaries") {
    assertCaught("q_split_assign") {
      graft.ml.DatasetOps.assignSplits(docs,
        graft.ml.DatasetOps.portable01($"doc_id", seed = 1),
        Seq("train" -> 0.75, "val" -> 0.15, "test" -> 0.1))
        .select($"doc_id", $"split")
    }
  }

  test("q_url_dedup: skipping URL canonicalization fragments the groups") {
    assertCaught("q_url_dedup") {
      val ev = Tables.load(spark, dir, "events")
        .select($"event_id", concat(
          lit("HTTPS://Cdn.Example.COM:443/"), $"event_type",
          lit("/p?utm_source=t&id="), ($"user_id" % 7).cast("string"),
          lit("&x=1#s"), $"event_id".cast("string")).as("url"))
      // bug: group by the RAW url — case, port, tracking params and
      // fragments all fragment the canonical groups
      ev.select($"url".as("url_norm"), $"event_id".as("id"))
        .groupBy("url_norm")
        .agg(min($"id").as("keeper_id"), count(lit(1)).as("n_dups"))
    }
  }

  test("q_sorted_write: an unsorted export is caught by the file-range audit") {
    assertCaught("q_sorted_write") {
      val out = java.nio.file.Files
        .createTempDirectory("graft-mut-sorted").toString + "/out"
      // bug: round-robin repartition instead of a range shuffle + sort —
      // file key spans overlap and the disjointness column flips
      docs.select("doc_id", "text", "source")
        .repartition(4).write.mode("overwrite").parquet(out)
      val ops = graft.ml.DatasetOps
      val files = ops.auditFileRanges(spark, out, "doc_id")
        .select(lit("file").as("kind"), col("file_rank"), col("disjoint"),
          lit(null).cast("long").as("n_rows"),
          lit(null).cast("long").as("id_sum"))
      val content = spark.read.parquet(out)
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("id_sum"))
        .select(lit("content").as("kind"), lit(0).cast("int").as("file_rank"),
          lit(true).as("disjoint"), col("n_rows"), col("id_sum"))
      files.unionByName(content)
    }
  }

  test("q_cluster_balance: a tightened per-cluster quota re-cuts the sample") {
    assertCaught("q_cluster_balance") {
      val emb = Tables.load(spark, dir, "embeddings")
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".cast("long").as("cell_id"),
          $"embedding".as("centroid"))
      graft.ml.DatasetOps.balanceByCluster(
        emb.select("vec_id", "embedding"), "embedding", "vec_id",
        cents, perCluster = 35)
        .select("vec_id", "cluster_id")
    }
  }
}
