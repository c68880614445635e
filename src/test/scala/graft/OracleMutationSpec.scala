package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Review block 7 (r14 verdict task 4): mutation tests for the
  * verification layer itself. Every green gate rests on the premise
  * that a Spark-side regression would CHANGE the gate's output (the
  * DuckDB oracle is fixed and independently derived, so any observable
  * change hash-mismatches). The untested half of that premise is the
  * FIXTURE: a bug in a path the sf0.01 data never exercises is
  * invisible no matter how good the oracle is. Each test here seeds ONE
  * deliberate, plausible Spark-side bug into a re-derivation of an
  * audited gate and asserts the driver's canonical compare (columns
  * sorted by name, rows sorted, exact values) distinguishes it from the
  * shipped gate — proving both that the oracle would catch the
  * regression and that the fixture exercises the mutated path.
  *
  * The audited-gate selection (the 10 most complex oracle derivations,
  * by oracle SQL size and shared-machinery risk) and the line-by-line
  * independence audit live in SURVEY.md's review-block-7 section. */
class OracleMutationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  /** The driver's canonical form: columns sorted by name, rows sorted,
    * exact (string-rendered) values. Distinct doubles render distinctly
    * (Java shortest-round-trip), so string inequality == hash mismatch. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(c => col(s"`$c`")): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  private def assertCaught(gate: String)(mutated: => DataFrame): Unit = {
    val orig = canon(SparkEntry.queries(gate)(spark, dir))
    val mut = canon(mutated)
    assert(orig != mut,
      s"$gate: the seeded bug produced IDENTICAL output — the fixture " +
        "does not exercise the mutated path, so the oracle could never " +
        "catch this regression")
  }

  test("q_dsir: a portable01 seed drift in the keep threshold is caught") {
    assertCaught("q_dsir") {
      val docs = Tables.load(spark, dir, "documents")
      val (tc, rc) = graft.ml.Dsir.ngramCountsWithTarget(
        docs, "text", col("doc_id") < 50, 12)
      val m = graft.ml.Dsir.model(tc, rc, 12)
      val weighed = graft.ml.Dsir.weigh(docs, "text", "doc_id", m)
      weighed.select(col("doc_id"),
        col("n_feats").cast("long").as("n_feats"), col("sum_ratio"),
        graft.ml.Dsir.thresholdKeep(weighed, "doc_id", seed = 6).as("keep"))
    }
  }

  test("q_curate_rank: a drifted DSIR acceptance cap changes the kept set") {
    assertCaught("q_curate_rank") {
      val docs = Tables.load(spark, dir, "documents")
      val ruled = graft.ml.TextAnalysis.gopherRules(docs, "text",
        minStopHits = 1, drop = true)
      val model = graft.functions.QualityClfModel(
        graft.ml.QualityClassifier.syntheticWeights(12), 12,
        bigrams = true, bias = 0.0)
      val scored = graft.ml.QualityClassifier.score(ruled, "text", model)
        .filter(col("quality_logit") > 0.0)
      val (tc, rc) = graft.ml.Dsir.ngramCountsWithTarget(
        docs, "text", col("doc_id") < 50, 12)
      val m = graft.ml.Dsir.model(tc, rc, 12)
      val weighed = graft.ml.Dsir.weigh(scored, "text", "doc_id", m)
      val kept = weighed.filter(
        graft.ml.Dsir.thresholdKeep(weighed, "doc_id", cap = 1.9)) // bug
      val pairs = graft.ml.Dedup.minhashPairs(kept, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9)
      graft.ml.Dedup.dropDuplicates(kept, pairs, "doc_id")
        .select(col("doc_id"), col("quality_logit"),
          col("n_feats").cast("long").as("n_feats"), col("sum_ratio"))
    }
  }

  test("q_ann_recall: an LSH plane-count regression is caught " +
      "(AUDIT FINDING: nprobe is fixture-invisible)") {
    // First-pass mutation nprobe 3→1 produced IDENTICAL output: at
    // sf0.01 every query's exact top-5 lives in its own nearest cell,
    // so the recall gate cannot see an nprobe regression — recorded in
    // the SURVEY review-block-7 audit (the IVF candidate-set mechanics
    // are covered by q_ann_ivf's full ranking instead). The LSH arms'
    // bucketing IS fixture-sensitive; a plane-count bug must be caught.
    assertCaught("q_ann_recall") {
      val emb = Tables.load(spark, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 5)
      val exact = graft.ml.Similarity.bruteForceTopK(
          emb, qs, "embedding", "vec_id", k = 5)
        .select($"query_id", $"vec_id")
      def arm(name: String, approx: DataFrame) =
        exact.join(approx.select($"query_id", $"vec_id", lit(1).as("hit")),
            Seq("query_id", "vec_id"), "left")
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_exact"), count($"hit").as("n_hit"))
          .select(lit(name).as("method"), $"query_id", $"n_exact", $"n_hit")
      arm("ivf", graft.ml.Similarity.ivfTopK(
          emb, qs, "embedding", "vec_id", k = 5, numCells = 16, nprobe = 3))
        .unionByName(arm("lsh", graft.ml.Similarity.annTopK(
          emb, qs, "embedding", "vec_id", k = 5, numPlanes = 4, dim = 64))) // bug
        .unionByName(arm("lsh_mp", graft.ml.Similarity.annTopK(
          emb, qs, "embedding", "vec_id", k = 5, numPlanes = 6, dim = 64,
          probes = 6)))
    }
  }

  test("q_ann_pq: a collapsed rerank candidate pool is caught") {
    assertCaught("q_ann_pq") {
      val emb = Tables.load(spark, dir, "embeddings")
      graft.ml.Similarity.pqTopK(
        emb, emb.filter($"vec_id" < 5), "embedding", "vec_id", k = 5,
        m = 8, kc = 16, rerank = 5) // bug: rerank pool == k
    }
  }

  test("q_pagerank: a dropped iteration is caught by the integer lattice") {
    assertCaught("q_pagerank") {
      val docs = Tables.load(spark, dir, "documents")
      val r = docs.select((col("doc_id") % 13).as("r")).distinct()
      val edges = r.select(
          concat(lit("h"), col("r").cast("string")).as("src"),
          concat(lit("h"), ((col("r") * col("r") + 1) % 13).cast("string")).as("dst"))
        .union(r.select(
          concat(lit("h"), col("r").cast("string")).as("src"),
          concat(lit("h"), ((col("r") * 2 + 5) % 13).cast("string")).as("dst")))
      graft.ml.LinkGraph.pageRank(edges, "src", "dst", iterations = 4) // bug
    }
  }

  test("q_ngram_lm: a count-threshold drift in training is caught") {
    assertCaught("q_ngram_lm") {
      val docs = Tables.load(spark, dir, "documents")
      val model = graft.ml.NgramLm.train(docs.filter($"doc_id" < 10),
        "text", order = 3, minCount = 3) // bug: prunes grams the oracle keeps
      graft.ml.NgramLm.score(docs, model, "text", "doc_id",
          order = 3, alpha = 0.4)
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("matched_full"), col("backoff"), col("oov"), col("sum_prob"))
    }
  }

  test("q_langid: a halved profile depth is caught by the rank distances") {
    assertCaught("q_langid") {
      val docs = Tables.load(spark, dir, "documents")
      val profiles = graft.ml.LangId.trainProfiles(docs, "text", "lang",
        topK = 50) // bug
      graft.ml.LangId.classify(docs, "text", "doc_id", profiles, topK = 50)
    }
  }

  test("q_bpe_encode: a silently dropped merge rule is caught") {
    // SparkEntry.bpeGateMerges minus its LAST rule (e -> r) — the shape
    // of a truncated merge-table load
    val mutatedMerges: Seq[(String, String)] = Seq(
      "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
      "s" -> "c", "sc" -> "a", "sca" -> "n", "a" -> "g", "ag" -> "g",
      "r" -> "o", "ro" -> "w", "o" -> "r")
    assertCaught("q_bpe_encode") {
      val docs = Tables.load(spark, dir, "documents")
      val enc = graft.ml.Bpe.encode(docs, "text", mutatedMerges)
      enc.filter(size(col("bpe_tokens")) > 0)
        .select(col("doc_id"),
          size(col("bpe_tokens")).cast("long").as("n_tokens"),
          array_join(col("bpe_tokens"), "|").as("bpe"))
    }
  }

  test("q_funnel_strict: a shrunken window changes funnel levels") {
    assertCaught("q_funnel_strict") {
      graft.operators.Funnel.windowFunnel(
        Tables.load(spark, dir, "events"), "user_id", "ts",
        Seq($"event_type" === "view", $"event_type" === "click",
          $"event_type" === "purchase"),
        windowSec = 3600L, strictOrder = true) // bug: 1 h, not 24 h
    }
  }

  test("q_image_phash: a wrong variant-count column in the group stats is caught") {
    assertCaught("q_image_phash") {
      val mm = graft.ml.Multimodal
      val variants = mm.synthesizeImageVariants(
        Tables.load(spark, dir, "documents").select(col("doc_id")), "doc_id")
      val px = mm.decodeImagePixels(variants)
        .select(col("media_id"),
          col("px.width").as("width"), col("px.height").as("height"),
          col("px.px_sum").as("px_sum"),
          col("px.ahash_hi").as("ahash_hi"), col("px.ahash_lo").as("ahash_lo"),
          col("px.dhash_hi").as("dhash_hi"), col("px.dhash_lo").as("dhash_lo"))
        .withColumn("delta", expr("((media_id div 127) % 3) * 6"))
      val groups = px.groupBy("ahash_hi", "ahash_lo")
        .agg(count(lit(1)).as("n_group"),
          countDistinct(col("media_id")).as("n_variants")) // bug: id, not delta
      px.join(broadcast(groups), Seq("ahash_hi", "ahash_lo"))
        .select(col("media_id"), col("width"), col("height"), col("px_sum"),
          col("ahash_hi"), col("ahash_lo"), col("dhash_hi"), col("dhash_lo"),
          col("n_group"), col("n_variants"))
    }
  }

  test("q_text_profile: a quality-formula coefficient drift is caught") {
    assertCaught("q_text_profile") {
      // recompute quality with 0.45/0.35/0.2 instead of 0.5/0.3/0.2 —
      // the shape of a formula edit that forgot the oracle
      graft.ml.TextAnalysis.profile(
          Tables.load(spark, dir, "documents"), "text")
        .withColumn("quality",
          col("distinct_ratio") * 0.45 +
            (lit(1.0) - abs(col("mean_word_len") - 5.0) / 10.0) * 0.35 +
            col("stopword_ratio") * 0.2)
        .select("doc_id", "n_tokens", "n_regex_tokens", "mean_word_len",
          "stopword_ratio", "distinct_ratio", "quality", "lang_guess",
          "fingerprint")
    }
  }

  test("q_zorder: a lost interleave bit randomizes the layout visibly") {
    assertCaught("q_zorder") {
      graft.ml.DatasetOps.withZValue(
        Tables.load(spark, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey"), bits = 7, zName = "z") // bug
        .select(col("l_orderkey"), col("l_linenumber"), col("z"))
    }
  }

  test("q_asof_join: an accidental tolerance bound drops matches") {
    assertCaught("q_asof_join") {
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.leftAsOf(
        ev.select($"event_id", $"user_id", $"ts"), purchases,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("value"), suffix = "_purchase",
        toleranceSec = Some(3600L)) // bug: unasked-for bound
        .select($"event_id", $"user_id", $"ts", $"ts_purchase",
          $"value_purchase")
    }
  }

  test("q_sessionize: a halved gap splits sessions the oracle keeps whole") {
    assertCaught("q_sessionize") {
      graft.operators.Sessionize.summarize(
        Tables.load(spark, dir, "events"), "user_id", "ts", gapSec = 900L, // bug
        extraAggs = Seq(sum($"value".cast("decimal(18,4)")).cast("double")
          .as("sum_value")))
    }
  }

  test("q_link_uniq_sketch: a merge that loses a partial is caught") {
    assertCaught("q_link_uniq_sketch") {
      val cfg = graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->user_id", batchWindowSec = 3600,
        tsColumn = "ts")
      val ev = Tables.load(spark, dir, "events")
      val p1 = graft.operators.LinkUniqMetric.batchSketch(cfg)(
        ev.filter(pmod(col("event_id"), lit(2)) === 0))
      // bug: the second shard's partial never reaches the merge
      val merged = graft.operators.LinkUniqMetric.mergeSketches(cfg)(p1)
      val exact = graft.operators.LinkUniqMetric.batch(cfg)(ev)
        .withColumnRenamed("uniq", "exact_uniq")
      merged.join(exact, Seq("@timestamp", "event_type"))
        .select(col("@timestamp"), col("event_type"), col("exact_uniq"),
          col("uniq"))
    }
  }

  test("q_mix_temperature: a budget drift moves every target") {
    assertCaught("q_mix_temperature") {
      graft.ml.DatasetOps.temperatureMixture(
        Tables.load(spark, dir, "documents"), "source", "text",
        totalBudget = 19000L, alpha = 0.5) // bug
    }
  }

  test("q_simhash_hamming: a tightened hamming radius hides pairs") {
    assertCaught("q_simhash_hamming") {
      graft.ml.Dedup.simhashHammingPairs(Tables.load(spark, dir, "documents"),
        "text", "doc_id", k = 2, bands = 4) // bug
    }
  }

  test("q_retention: a shrunken cohort period rebins every offset") {
    assertCaught("q_retention") {
      graft.operators.Retention.cohorts(
        Tables.load(spark, dir, "events"), "user_id", "ts",
        $"event_type" === "signup", periodSec = 86400L, maxOffset = 8) // bug
    }
  }

  test("q_image_resize: a wrong target height changes every resample") {
    assertCaught("q_image_resize") {
      val mm = graft.ml.Multimodal
      val variants = mm.synthesizeImageVariants(
        Tables.load(spark, dir, "documents").select(col("doc_id")), "doc_id")
      val resized = mm.resizeImages(variants, 8, 5) // bug: 8×6 asked
      mm.decodeImagePixels(resized)
        .select(col("media_id"),
          col("px.width").as("width"), col("px.height").as("height"),
          col("px.px_sum").as("px_sum"),
          col("px.ahash_hi").as("ahash_hi"), col("px.ahash_lo").as("ahash_lo"))
    }
  }

  test("q_heavy_hitters_approx: a support-threshold drift changes the set") {
    assertCaught("q_heavy_hitters_approx") {
      graft.ml.TextAnalysis.heavyHittersApprox(
        Tables.load(spark, dir, "documents"), "text", n = 2,
        minFrac = 0.001) // bug
    }
  }

  test("q_bloom_decontam: a shorter shingle order removes different docs") {
    assertCaught("q_bloom_decontam") {
      val docs = Tables.load(spark, dir, "documents")
      graft.ml.DatasetOps.bloomDecontaminate(docs,
          docs.filter($"doc_id" < 10), "text", "doc_id", n = 4, // bug
          expectedItems = 1L << 16)
        .select($"doc_id", $"source")
    }
  }

  test("q_funnel_conversion: a shrunken window changes the level counts") {
    assertCaught("q_funnel_conversion") {
      graft.operators.Funnel.conversion(
        graft.operators.Funnel.windowFunnel(
          Tables.load(spark, dir, "events"), "user_id", "ts",
          Seq($"event_type" === "view", $"event_type" === "click",
            $"event_type" === "purchase"),
          windowSec = 3600L)) // bug
    }
  }

  test("q_doc_chunk: an overlap drift re-cuts every chunk boundary") {
    assertCaught("q_doc_chunk") {
      graft.ml.DatasetOps.chunkDocuments(
        Tables.load(spark, dir, "documents"), "text", "doc_id",
        maxTokens = 64, overlap = 8) // bug
    }
  }

  test("q_session_seq: a shrunken session gap re-cuts the sequences") {
    assertCaught("q_session_seq") {
      graft.operators.Sessionize
        .assign(Tables.load(spark, dir, "events"), "user_id", "ts", 600L) // bug
        .groupBy($"user_id", $"session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          array_join(sort_array(collect_list(struct($"ts", $"event_type")))
            .getField("event_type"), ",").as("seq"))
        .drop("session_seq")
    }
  }

  test("q_knn: a k drift changes every neighbor list") {
    assertCaught("q_knn") {
      graft.ml.Similarity.knnJoinBrute(
        Tables.load(spark, dir, "embeddings").filter($"vec_id" < 1000),
        "embedding", "vec_id", k = 2) // bug
    }
  }

  test("q_tfidf: a per-doc term budget drift is caught") {
    assertCaught("q_tfidf") {
      graft.ml.TextAnalysis.topTfidfTerms(
        Tables.load(spark, dir, "documents"), "text", "doc_id", k = 2) // bug
    }
  }

  test("q_vocab: a binding top-N truncation is caught " +
      "(AUDIT FINDING: both gate knobs are non-binding at sf0.01)") {
    // first-pass mutations were invisible TWICE: minCount 3→4 (the
    // corpus has no token with count 3 or 4 at all) and topN 50→49 (only
    // 31 tokens survive the floor, so neither 50 nor 49 cuts). The
    // gate's real subject is the count+rank lattice over all 31
    // surviving tokens — recorded in the SURVEY audit; the knobs' logic
    // (a filter and a limit) is covered by unit fixtures. A cut that
    // BINDS must still be caught:
    assertCaught("q_vocab") {
      graft.ml.TextAnalysis.vocabulary(
        Tables.load(spark, dir, "documents"), "text", minCount = 3,
        topN = 30) // bug: binds (31 tokens pass the floor)
    }
  }

  test("q_novelty: a shorter novelty n-gram rescores every doc") {
    assertCaught("q_novelty") {
      val docs = Tables.load(spark, dir, "documents")
      graft.ml.TextAnalysis.ngramNovelty(docs, docs.filter($"doc_id" < 10),
        "text", "doc_id", "text", n = 4) // bug
    }
  }

  test("q_inverted_index: a posting-cap drift truncates chains differently") {
    assertCaught("q_inverted_index") {
      graft.ml.TextAnalysis.invertedIndex(
        Tables.load(spark, dir, "documents"), "text", "doc_id",
        minDf = 5L, maxPostings = 2) // bug
    }
  }

  test("q_decontaminate: a shorter contamination n-gram drops different docs") {
    assertCaught("q_decontaminate") {
      val docs = Tables.load(spark, dir, "documents")
      graft.ml.Dedup.decontaminate(docs, docs.filter($"doc_id" < 10),
          "text", "doc_id", n = 4) // bug
        .select($"doc_id", $"source")
    }
  }

  test("q_seq_pack: a token-budget drift repacks every bin") {
    assertCaught("q_seq_pack") {
      graft.ml.DatasetOps.packSequences(
        Tables.load(spark, dir, "documents"), "text", "doc_id", "source",
        budget = 500) // bug
        .select($"doc_id", $"n_tokens", $"seq_start", $"bin", $"bin_offset",
          $"bins_spanned")
    }
  }

  test("q_quota_sample: a quota drift keeps a different sample " +
      "(gate re-pinned to a BINDING quota by this audit)") {
    // first-pass mutation 30→29 was invisible: every source group holds
    // 25 docs at sf0.01, so the old n = 30 never truncated anything and
    // the gate was vacuous for the quota logic. The gate now uses
    // n = 18 (binds on every group); this mutation must be caught.
    assertCaught("q_quota_sample") {
      graft.ml.DatasetOps.sampleQuota(
        Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", 17, "qs") // bug
    }
  }

  test("q_global_shuffle: a seed drift reorders the export") {
    assertCaught("q_global_shuffle") {
      graft.ml.DatasetOps.shuffleWithPosition(
        Tables.load(spark, dir, "documents").select("doc_id"), "doc_id",
        "sx") // bug
    }
  }

  test("q_cosine_dup: a similarity-threshold drift changes the pair set") {
    assertCaught("q_cosine_dup") {
      graft.ml.Similarity.cosineDupPairs(Tables.load(spark, dir, "embeddings"),
        "embedding", "vec_id", threshold = 0.45, numPlanes = 4, dim = 64) // bug
    }
  }

  test("q_grok: a pattern-atom drift (NUMBER→INT) nulls the captures") {
    assertCaught("q_grok") {
      val ev = Tables.load(spark, dir, "events")
        .withColumn("message", concat($"event_type", lit(" "), $"user_id",
          lit(" "), $"value".cast("string")))
      val grokked = graft.filters.FilterBox(graft.filters.GrokFilter("message",
        Seq("""^%{WORD:etype} %{INT:uid} %{INT:val}$"""))).stage(ev) // bug
      grokked.select($"event_id", $"etype", $"uid", $"val")
    }
  }

  test("q_date: a dropped layout loses first-match parsing") {
    assertCaught("q_date") {
      val ev = Tables.load(spark, dir, "events")
        .withColumn("t", date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
      val dated = graft.filters.FilterBox(graft.filters.DateFilter("t",
        Seq("02/Jan/2006:15:04:05"), target = "parsed")).stage(ev) // bug
      dated.select($"event_id", $"parsed")
    }
  }

  test("q_link_metric: a halved window rebins every count") {
    assertCaught("q_link_metric") {
      graft.operators.LinkMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->user_id", batchWindowSec = 1800, // bug
        tsColumn = "ts"))(Tables.load(spark, dir, "events"))
    }
  }

  test("q_asof_tolerance: a tolerance drift changes the match set") {
    assertCaught("q_asof_tolerance") {
      val ev = Tables.load(spark, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.leftAsOf(
        ev.select($"event_id", $"user_id", $"ts"), purchases,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("value"), suffix = "_purchase",
        toleranceSec = Some(3600L)) // bug: 7200 asked
        .select($"event_id", $"user_id", $"ts", $"ts_purchase",
          $"value_purchase")
    }
  }

  test("q_line_dedup: a raised document floor lets boilerplate survive") {
    assertCaught("q_line_dedup") {
      val docs = Tables.load(spark, dir, "documents").select($"doc_id",
        concat_ws("\n",
          when($"doc_id" % 2 === 0, lit("Cookie Notice: We Use Cookies"))
            .otherwise(lit("COOKIE NOTICE: WE USE COOKIES")),
          concat(lit("Section "), ($"doc_id" % 3).cast("string")),
          $"text",
          concat(lit("footer id "), $"doc_id".cast("string"))).as("text"))
      graft.ml.Dedup.removeBoilerplateLines(docs, "text", "doc_id",
        minDocs = 300) // bug: the 250-doc cookie variants now survive
    }
  }

  test("q_condition_dsl: a flipped atom changes the kept rows") {
    assertCaught("q_condition_dsl") {
      val ev = Tables.load(spark, dir, "events")
      val dsl = """(EQ(event_type,"error") || HasPrefix(event_type,"sign"))""" +
        """ && !EQ($.props.k,1) && Contains(props,"k")""" // bug: k,0 asked
      ev.filter(graft.conditions.ConditionFilter.compile(dsl, ev))
        .select("event_id", "event_type", "value", "user_id")
    }
  }

  test("q_quality_rules: a stop-hit threshold drift flips keep flags") {
    assertCaught("q_quality_rules") {
      graft.ml.TextAnalysis.gopherRules(
        Tables.load(spark, dir, "documents"), "text", minStopHits = 2) // bug
        .select("doc_id", "n_words", "stop_hits", "rule_word_count",
          "rule_mean_word_len", "rule_symbol_ratio", "rule_alpha",
          "rule_bullet", "rule_ellipsis", "rule_stopwords",
          "rule_no_brace", "rule_no_lorem", "keep")
    }
  }
}
