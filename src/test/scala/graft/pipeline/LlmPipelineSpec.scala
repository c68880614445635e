package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The LLM-data operator family driven the way the reference is driven —
  * by config. One YAML chain runs profile → URL dedup → exact dedup →
  * decontamination → mixing → split assignment → sequence packing through
  * `graft.Main`, reading and writing parquet; every stage's effect is
  * asserted on the output. (KitchenSinkSpec is the per-event-filter twin.) */
class LlmPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("corpus assembly pipeline runs end-to-end through graft.Main") {
    val in = tmp("llm-in")
    val bench = tmp("llm-bench")
    val out = tmp("llm-out")

    Seq(
      // (id, source, url, text)
      (0L, "web", "http://A.com", "alpha beta gamma delta epsilon zeta"),
      (1L, "web", "http://a.com/", "one two three four five six seven"), // same canonical URL as 0
      (2L, "web", "http://b.com", "alpha beta gamma delta epsilon zeta"), // exact text dup of 0
      (3L, "books", "http://c.com", "the quick brown fox jumps over the lazy dog today"), // contaminated
      (4L, "books", "http://d.com", "pack my box with five dozen liquor jugs"),
      (5L, "code", "http://e.com", "def main(): pass"), // mixed out (weight 0)
      (6L, "web", "http://f.com", "sphinx of black quartz judge my vow"),
    ).toDF("id", "source", "url", "text").write.mode("overwrite").parquet(in)

    Seq("quick brown fox jumps over").toDF("text")
      .write.mode("overwrite").parquet(bench)

    val yaml =
      s"""inputs:
         |  - Parquet:
         |      path: $in
         |filters:
         |  - TextProfile: {src: text}
         |  - UrlDedup: {src: url, id_field: id}
         |  - Dedup: {src: text, id_field: id, method: exact}
         |  - Decontaminate:
         |      src: text
         |      id_field: id
         |      ngram: 5
         |      benchmark: {input: Parquet, path: $bench}
         |  - Mix:
         |      group_field: source
         |      weights: {code: 0.0}
         |      default_weight: 1.0
         |  - AssignSplits:
         |      splits: [{train: 0.9}, {holdout: 0.1}]
         |  - PackSequences: {src: text, id_field: id, group_field: source, budget: 8}
         |outputs:
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("llm-pipeline", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))

    graft.Main.run(spark, cfg.toString)

    // owned cache lifecycle: the corpus stages' persisted memos
    // (joinBackOnce drop sets, shingle tables) must be drained once the
    // pipeline's sinks finish — a --watch session looping corpora must
    // not accumulate MEMORY_AND_DISK blocks run over run
    assert(spark.sharedState.cacheManager.isEmpty,
      "corpus pipeline left frames in the cache manager after runBatch")
    assert(graft.core.CacheRegistry.size == 0)

    val result = spark.read.parquet(out)
    val byId = result.collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap

    // 1 gone (URL dup of 0), 2 gone (exact dup of 0), 3 gone (benchmark
    // 5-gram), 5 gone (code weight 0) — survivors 0, 4, 6
    assert(byId.keySet == Set(0L, 4L, 6L))

    // TextProfile ran: quality columns present and sane
    assert(result.columns.contains("quality") && result.columns.contains("lang_guess"))

    // AssignSplits: label column with only configured values
    val splits = result.select("split").as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "holdout")))

    // PackSequences at budget 8, per source, ordered by id:
    //   web: id 0 (6 tokens) then id 6 (7 tokens, starts at offset 6 →
    //   straddles contexts 0 and 1); books: id 4 alone (9 tokens → 2 bins)
    def packed(id: Long, c: String) = byId(id).getLong(byId(id).fieldIndex(c))
    assert(packed(0L, "n_tokens") == 6 && packed(0L, "seq_start") == 0 &&
      packed(0L, "bin") == 0 && packed(0L, "bins_spanned") == 1)
    assert(packed(6L, "seq_start") == 6 && packed(6L, "bin") == 0 &&
      packed(6L, "bin_offset") == 6 && packed(6L, "bins_spanned") == 2)
    assert(packed(4L, "seq_start") == 0 && packed(4L, "n_tokens") == 8 &&
      packed(4L, "bins_spanned") == 1)
  }

  test("budget-driven curation chain: dedup, budget mix, splits, sorted tee") {
    val in = tmp("bm-in")
    val tee = tmp("bm-tee")
    val out = tmp("bm-out")
    // web: 60 docs x 5 tokens = 300 tokens; books: 20 docs x 5 = 100
    (0L until 80L).map { i =>
      val src = if (i < 60) "web" else "books"
      (i, src, s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e")
    }.toDF("id", "source", "text").write.mode("overwrite").parquet(in)

    val yaml =
      s"""inputs:
         |  - Parquet:
         |      path: $in
         |filters:
         |  - Dedup: {src: text, id_field: id, method: exact}
         |  - BudgetMix:
         |      group_field: source
         |      src: text
         |      budget: 200
         |      weights: {books: 1.0, web: 1.0}
         |      id_field: id
         |  - AssignSplits:
         |      splits: [{train: 0.9}, {holdout: 0.1}]
         |  - RangeSortedExport: {key_field: id, path: $tee, files: 2}
         |outputs:
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("bm-pipeline", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)

    val result = spark.read.parquet(out)
    // budget 200 over equal weights: 100 tokens per source — books
    // (exactly 100) clamps to keep-all, web keeps ~1/3 of its 60 docs
    val bySrc = result.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("books") == 20L, s"books under-kept: $bySrc")
    assert(bySrc("web") < 40L && bySrc("web") > 5L, s"web rate off: $bySrc")
    assert(result.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "holdout")))
    // the tee exported the same post-mix rows, range-sorted + disjoint
    assert(spark.read.parquet(tee).count() == result.count())
    val audit = graft.ml.DatasetOps.auditFileRanges(spark, tee, "id")
      .as[(Int, Long, Boolean)].collect()
    assert(audit.length == 2 && audit.forall(_._3))
  }

  test("WARC-headed crawl curation: Warc input → Convert → StripHtml → Dedup") {
    // the CommonCrawl ingestion story end-to-end: a .warc.gz of HTML
    // pages enters as binary payloads, is cast to text, markup-stripped,
    // then exact-deduped — record 1 is byte-distinct from record 0 but
    // text-identical once tags go, so only the strip makes them collide
    val dir = tmp("warc-chain")
    val out = tmp("warc-chain-out")
    val pages = Seq(
      ("http://x.example/0", "<html><body><p>alpha beta gamma</p></body></html>"),
      ("http://x.example/1", "<html><body><div>alpha beta gamma</div></body></html>"),
      ("http://x.example/2",
        "<html><script>var x=1;</script><body>unique page &amp; two</body></html>"))
    val bytes = pages.map { case (u, h) =>
      graft.sources.WarcReader.gzipMember(
        graft.sources.WarcReader.responseRecord(u, "2026-01-01T00:00:00Z",
          s"<urn:uuid:${u.hashCode}>", h.getBytes("UTF-8"),
          httpContentType = "text/html"))
    }.reduce(_ ++ _)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "crawl.warc.gz"), bytes)

    val yaml =
      s"""inputs:
         |  - Warc:
         |      path: $dir/*.warc.gz
         |filters:
         |  - Convert:
         |      fields:
         |        payload: {to: string}
         |  - StripHtml: {src: payload, target: text}
         |  - Dedup: {src: text, id_field: record_index, method: exact}
         |outputs:
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("warc-pipeline", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)

    val rows = spark.read.parquet(out)
      .select("target_uri", "text").as[(String, String)].collect().toMap
    // keep-first: record 0 survives, its markup-variant 1 is dropped
    assert(rows.keySet == Set("http://x.example/0", "http://x.example/2"), rows)
    assert(rows("http://x.example/0") == "alpha beta gamma")
    // script block gone, entity decoded
    assert(rows("http://x.example/2") == "unique page & two")
  }

  test("Dedup dispatches minhash and hamming methods") {
    // 1 is a punctuation-level near-dup of 0 (jaccard ~0.82 — minhash
    // territory; one changed token flips >3 of 64 simhash bits, so the
    // kernel semantics of hamming-k are covered by MlSpec, not here);
    // 3 is an exact copy (hamming distance 0) to exercise the hamming
    // dispatch path without re-proving the kernel
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again!"),
      (2L, "completely unrelated content about distributed query engines"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
    ).toDF("id", "text")

    val minhash = Planner.corpusStage("Dedup", Map(
      "method" -> "minhash", "threshold" -> 0.7))(df)
    assert(minhash.select("id").as[Long].collect().toSet == Set(0L, 2L))

    val hamming = Planner.corpusStage("Dedup", Map("method" -> "hamming", "k" -> 3))(df)
    assert(hamming.select("id").as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("multi-input corpus (UNION ALL) runs the dedup chain without per-branch re-derivation") {
    // two inputs → UNION ALL → dedup → decontaminate: the exact shape
    // that triggered the PushdownLeftSemiOrAntiJoin branch explosion
    // (see Dedup.joinBackOnce). Asserts semantics across the union AND
    // the plan-level guard.
    val inA = tmp("llm-a"); val inB = tmp("llm-b"); val bench = tmp("llm-bm")
    val out = tmp("llm-u-out")
    Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "one two three four five six")).toDF("id", "text")
      .write.mode("overwrite").parquet(inA)
    Seq((10L, "alpha beta gamma delta epsilon"), // cross-input exact dup of 0
      (11L, "the quick brown fox jumps over everything")) // contaminated
      .toDF("id", "text").write.mode("overwrite").parquet(inB)
    Seq("quick brown fox jumps over").toDF("text")
      .write.mode("overwrite").parquet(bench)
    val yaml =
      s"""inputs:
         |  - Parquet: {path: $inA}
         |  - Parquet: {path: $inB}
         |filters:
         |  - Dedup: {src: text, id_field: id, method: exact}
         |  - Decontaminate:
         |      src: text
         |      id_field: id
         |      ngram: 5
         |      benchmark: {input: Parquet, path: $bench}
         |outputs:
         |  - Parquet: {path: $out}
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("llm-union", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)
    // 10 drops as an exact dup ACROSS inputs; 11 drops as contaminated
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSet
      == Set(0L, 1L))
  }

  test("SemanticDedup dispatches embedding-space dedup with the cell-size cap") {
    val rnd = new scala.util.Random(29)
    val base = (0L until 20L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // a positively-scaled copy sits at cosine exactly 1 with id 3
    val df = (base :+ ((100L, base(3)._2.map(_ * 2.0f))))
      .toDF("id", "embedding")
    val kept = Planner.corpusStage("SemanticDedup", Map(
      "src" -> "embedding", "num_cells" -> 4, "threshold" -> 0.999,
      "max_cell_size" -> 8, "dim" -> 16))(df)
    assert(kept.select("id").as[Long].collect().toSet == (0L until 20L).toSet)
  }

  test("Dedup dispatches the clustered-representative policy") {
    // same near-dup fixture as the minhash dispatch test; clustered keeps
    // the connected-component min id (policy semantics proven in MlSpec —
    // this covers the YAML dispatch and option plumbing)
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again!"),
      (2L, "completely unrelated content about distributed query engines"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
    ).toDF("id", "text")
    val kept = Planner.corpusStage("Dedup", Map(
      "method" -> "clustered", "pairs" -> "minhash", "threshold" -> 0.7))(df)
    assert(kept.select("id").as[Long].collect().toSet == Set(0L, 2L))
    val keptHam = Planner.corpusStage("Dedup", Map(
      "method" -> "clustered", "pairs" -> "hamming", "k" -> 3))(df)
    assert(keptHam.select("id").as[Long].collect().toSet == Set(0L, 1L, 2L))
    val e = intercept[RuntimeException] {
      Planner.corpusStage("Dedup", Map(
        "method" -> "clustered", "pairs" -> "nope"))(df).count()
    }
    assert(e.getMessage.contains("minhash|hamming"))
  }

  test("PassageDedup strips duplicated passages, keep-first; spans mode emits the table") {
    val df = Seq(
      (0L, "licensed under apache two zero unique alpha"),
      (1L, "other content licensed under apache two zero"),
      (2L, "totally different text with no shared windows here"),
    ).toDF("id", "text")
    val stripped = Planner.corpusStage("PassageDedup", Map(
      "k" -> 4, "min_docs" -> 2))(df)
      .orderBy("id").select("text").as[String].collect()
    // doc 0 (min id) keeps the passage; doc 1 loses tokens 2..6
    assert(stripped(0) == "licensed under apache two zero unique alpha")
    assert(stripped(1) == "other content")
    assert(stripped(2) == "totally different text with no shared windows here")
    val spans = Planner.corpusStage("PassageDedup", Map(
      "k" -> 4, "min_docs" -> 2, "mode" -> "spans"))(df)
    assert(spans.columns.toSeq == Seq("doc_id", "span_start", "span_end"))
    // spans mode reports BOTH holders of the duplicated window range
    assert(spans.select("doc_id").as[Long].collect().toSet == Set(0L, 1L))
  }

  test("LineDedup cuts boilerplate lines appearing across min_docs documents") {
    val df = Seq(
      (0L, "keep me\nSUBSCRIBE NOW\nunique zero"),
      (1L, "subscribe now\nunique one"),
      (2L, "unique two"),
    ).toDF("id", "text")
    val cleaned = Planner.corpusStage("LineDedup", Map("min_docs" -> 2))(df)
      .orderBy("id").select("text").as[String].collect()
    // normalized (trim+lower) "subscribe now" hits 2 docs → cut from both,
    // surviving lines keep their spelling and order
    assert(cleaned(0) == "keep me\nunique zero")
    assert(cleaned(1) == "unique one")
    assert(cleaned(2) == "unique two")
  }

  test("rewrite stages run YAML-chained through graft.Main") {
    val in = tmp("llm-rw-in"); val out = tmp("llm-rw-out")
    Seq(
      (0L, "visit our sponsor\nlicensed under apache two zero unique alpha"),
      (1L, "visit our sponsor\nother content licensed under apache two zero"),
      (2L, "visit our sponsor\ncompletely unrelated body text"),
      (3L, "completely unrelated body text"), // near-dup of 2 post-LineDedup
    ).toDF("id", "text").write.mode("overwrite").parquet(in)
    val yaml =
      s"""inputs:
         |  - Parquet: {path: $in}
         |filters:
         |  - LineDedup: {src: text, id_field: id, min_docs: 3}
         |  - Dedup: {src: text, id_field: id, method: clustered}
         |  - PassageDedup: {src: text, id_field: id, k: 4, min_docs: 2}
         |outputs:
         |  - Parquet: {path: $out}
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("llm-rewrite", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)
    val result = spark.read.parquet(out).orderBy("id")
      .select("id", "text").as[(Long, String)].collect()
    // LineDedup cuts "visit our sponsor" (3 docs); clustered dedup drops 3
    // (exact dup of 2 once the boilerplate line is gone — pair (2,3),
    // rep 2); PassageDedup then strips the apache passage from doc 1
    assert(result.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(result(1)._2 == "other content")
    assert(result(2)._2 == "completely unrelated body text")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("Dedup incremental dispatches cross-run dedup against a seen store") {
    val store = tmp("llm-seen") + "/fps"
    val day1 = Seq((0L, "alpha beta gamma"), (1L, "one two three"),
      (2L, "alpha beta gamma")) // within-increment exact dup of 0
      .toDF("id", "text")
    val stage = Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "store" -> store, "update_store" -> true))
    // first run: no store yet — within-increment keep-first only, so 0
    // and 1 survive. The store update is a POST-COMMIT hook (it must not
    // run before the run's sinks succeed, or a failed run's retry would
    // drop its own increment) — drained here the way runBatch drains it.
    assert(stage(day1).select("id").as[Long].collect().toSet == Set(0L, 1L))
    assert(graft.core.PostCommit.size == 1)
    graft.core.PostCommit.drain()
    // second run, new stage instance: repeats of day1 drop, new doc stays
    val day2 = Seq((10L, "one two three"), (11L, "fresh new content"))
      .toDF("id", "text")
    val stage2 = Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "store" -> store, "update_store" -> true))
    assert(stage2(day2).select("id").as[Long].collect().toSet == Set(11L))
    graft.core.PostCommit.drain()
    // store carries day1 + day2 distinct fingerprints
    assert(spark.read.parquet(store).count() == 3)
    // a run whose sinks FAIL clears its hook instead of running it — the
    // store must not grow (retry-safety, see Planner.runBatch)
    val stage3 = Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "store" -> store, "update_store" -> true))
    stage3(Seq((20L, "doomed run content")).toDF("id", "text")): Unit
    graft.core.PostCommit.clear()
    graft.core.PostCommit.drain()
    assert(spark.read.parquet(store).count() == 3)
  }

  test("Dedup incremental near dispatches simhash-store cross-run near-dedup") {
    val store = tmp("llm-seen-near") + "/sims"
    val day1 = Seq((0L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val mk = () => Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "near" -> true, "store" -> store,
      "update_store" -> true))
    assert(mk()(day1).select("id").as[Long].collect().toSet == Set(0L))
    graft.core.PostCommit.drain() // what runBatch does after its sinks
    val day2 = Seq(
      (10L, "again and again the lazy dog jumps over the quick brown fox"), // token shuffle of 0
      (11L, "entirely novel text with fresh vocabulary throughout"))
      .toDF("id", "text")
    assert(mk()(day2).select("id").as[Long].collect().toSet == Set(11L))
    graft.core.PostCommit.drain()
  }

  test("compact_files rewrites the store once appends exceed the threshold") {
    val store = tmp("llm-compact") + "/fps"
    def run(id: Long, txt: String): Unit = {
      val stage = Planner.corpusStage("Dedup", Map(
        "method" -> "incremental", "store" -> store, "update_store" -> true,
        "compact_files" -> 2))
      stage(Seq((id, txt)).toDF("id", "text")).count(): Unit
      graft.core.PostCommit.drain()
    }
    run(0L, "doc a"); run(1L, "doc b"); run(2L, "doc c"); run(3L, "doc d")
    // the post-update hook compacted once the data-file count crossed the
    // threshold: compaction's renamed files are the observable
    assert(graft.ml.Dedup.storeDataFiles(spark, store)
      .exists(_.getName.startsWith("compact-")), "no compaction ran")
    assert(spark.read.parquet(store).count() == 4)
    // the compacted store still dedups through the stage
    val stage = Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "store" -> store))
    assert(stage(Seq((9L, "doc b"), (10L, "doc z")).toDF("id", "text"))
      .select("id").as[Long].collect().toSet == Set(10L))
  }

  test("Dedup incremental near appends with the CONFIGURED banding") {
    // a default-bands append against a bands:16 pipeline would write an
    // 8-band sidecar every query rejects — silent explode fallback on
    // every future run
    val store = tmp("llm-seen-near16") + "/sims"
    val mk = () => Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "near" -> true, "store" -> store,
      "update_store" -> true, "bands" -> 16))
    val day1 = Seq((0L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    assert(mk()(day1).count() == 1)
    graft.core.PostCommit.drain()
    val meta = scala.io.Source.fromFile(s"$store/_banded/_meta.json").mkString
    assert(meta.contains("\"bands\":16"), meta)
    val day2 = Seq(
      (10L, "again and again the lazy dog jumps over the quick brown fox"),
      (11L, "entirely novel text with fresh vocabulary throughout"))
      .toDF("id", "text")
    val q = mk()(day2)
    // the bands=16 query ACCEPTS the sidecar (pre-banded path, no explode).
    // Marker = the band partition filter: FileScan Locations truncate at
    // ~100 chars, so the "_banded" path substring is tmp-prefix-fragile.
    assert(q.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(band"))
    assert(q.select("id").as[Long].collect().toSet == Set(11L))
    graft.core.PostCommit.drain()
  }

  test("a stage that throws AFTER incremental dedup registered its hook cannot poison the next run") {
    // the failure mode: Dedup(incremental) registers its store-update as a
    // post-commit hook, then a LATER stage's plan build throws (here: a
    // Dedup on a column that doesn't exist → AnalysisException). If the
    // hook survived on the thread, the NEXT successful runBatch would
    // drain it after its own sinks — appending the FAILED run's
    // fingerprints to the seen store, so the failed increment's retry
    // anti-joins itself away. runBatch's try now wraps the stage build.
    val inBad = tmp("llm-poison-bad"); val inGood = tmp("llm-poison-good")
    val outGood = tmp("llm-poison-out")
    val store = tmp("llm-poison-store") + "/fps"
    Seq((0L, "doomed text one"), (1L, "doomed text two"))
      .toDF("id", "text").write.mode("overwrite").parquet(inBad)
    Seq((10L, "healthy text one"), (11L, "healthy text two"))
      .toDF("id", "text").write.mode("overwrite").parquet(inGood)
    val badYaml =
      s"""inputs:
         |  - Parquet: {path: $inBad}
         |filters:
         |  - Dedup: {method: incremental, store: $store, update_store: true}
         |  - Dedup: {src: no_such_column, method: exact}
         |outputs:
         |  - Parquet: {path: ${tmp("llm-poison-sink")}}
         |""".stripMargin
    intercept[Exception] { Planner.fromYaml(badYaml).runBatch(spark) }
    // the failed build's hook is gone and its memos are drained
    assert(graft.core.PostCommit.size == 0)
    assert(graft.core.CacheRegistry.size == 0)
    val goodYaml =
      s"""inputs:
         |  - Parquet: {path: $inGood}
         |filters:
         |  - Dedup: {method: incremental, store: $store, update_store: true}
         |outputs:
         |  - Parquet: {path: $outGood}
         |""".stripMargin
    Planner.fromYaml(goodYaml).runBatch(spark): Unit
    // store holds ONLY the successful run's fingerprints — had the failed
    // run's hook leaked, count would be 4 and "doomed"'s retry would lose
    assert(spark.read.parquet(store).count() == 2)
  }

  test("incremental dedup through graft.Main: store updates after sinks, runs chain") {
    val in1 = tmp("llm-inc1"); val in2 = tmp("llm-inc2")
    val out1 = tmp("llm-inc-out1"); val out2 = tmp("llm-inc-out2")
    val store = tmp("llm-inc-store") + "/fps"
    Seq((0L, "alpha beta gamma"), (1L, "one two three"))
      .toDF("id", "text").write.mode("overwrite").parquet(in1)
    Seq((10L, "alpha beta gamma"), (11L, "fresh new content"))
      .toDF("id", "text").write.mode("overwrite").parquet(in2)
    def yaml(in: String, out: String) =
      s"""inputs:
         |  - Parquet: {path: $in}
         |filters:
         |  - Dedup: {method: incremental, store: $store, update_store: true}
         |outputs:
         |  - Parquet: {path: $out}
         |""".stripMargin
    val cfg1 = java.nio.file.Files.createTempFile("llm-inc1", ".yml")
    java.nio.file.Files.write(cfg1, yaml(in1, out1).getBytes("UTF-8"))
    graft.Main.run(spark, cfg1.toString)
    // runBatch drained the post-commit hook: store holds day1's fps
    assert(spark.read.parquet(store).count() == 2)
    assert(graft.core.PostCommit.size == 0)
    val cfg2 = java.nio.file.Files.createTempFile("llm-inc2", ".yml")
    java.nio.file.Files.write(cfg2, yaml(in2, out2).getBytes("UTF-8"))
    graft.Main.run(spark, cfg2.toString)
    // day2's repeat of day1 dropped; only the fresh doc written
    assert(spark.read.parquet(out2).select("id").as[Long].collect().toSet == Set(11L))
    assert(spark.read.parquet(store).count() == 3)
  }

  test("SemanticDedup kmeans option trains centroids before the cell join") {
    val rnd = new scala.util.Random(41)
    val base = (0L until 20L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    // positively-scaled copy: cosine exactly 1 with id 7 → must drop
    val df = (base :+ ((100L, base(7)._2.map(_ * 2.0f))))
      .toDF("id", "embedding")
    val kept = Planner.corpusStage("SemanticDedup", Map(
      "src" -> "embedding", "num_cells" -> 4, "threshold" -> 0.999,
      "kmeans" -> true, "kmeans_iters" -> 3, "dim" -> 16))(df)
    assert(kept.select("id").as[Long].collect().toSet == (0L until 20L).toSet)
    // mid-pipeline corpora have SPARSE ids (an upstream dedup dropped
    // rows) — the kmeans path must not depend on ids dense in [0, k)
    val sparse = df.withColumn("id", col("id") * 37 + 1000)
    val keptSparse = Planner.corpusStage("SemanticDedup", Map(
      "src" -> "embedding", "num_cells" -> 4, "threshold" -> 0.999,
      "kmeans" -> true, "kmeans_iters" -> 3, "dim" -> 16))(sparse)
    assert(keptSparse.select("id").as[Long].collect().toSet ==
      (0L until 20L).map(_ * 37 + 1000).toSet)
  }

  test("UrlDedup summary mode exposes the aggregate view") {
    val df = Seq(
      (0L, "https://x.com/a?utm_source=feed"),
      (1L, "https://X.com:443/a"),
      (2L, "https://y.com/b"),
    ).toDF("id", "url")
    val summary = Planner.corpusStage("UrlDedup",
      Map("src" -> "url", "mode" -> "summary"))(df)
      .orderBy("url_norm").collect()
    assert(summary.length == 2)
    assert(summary.head.getString(0) == "https://x.com/a" &&
      summary.head.getLong(1) == 0L && summary.head.getLong(2) == 2L)
  }

  test("Chunk dispatches overlapping context-window splitting") {
    val df = Seq(
      (0L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (1L, "tiny doc"))
      .toDF("id", "text")
    val out = Planner.filterStage("Chunk",
      Map("src" -> "text", "id_field" -> "id",
        "max_tokens" -> 4, "overlap" -> 1))(df)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect()
    // doc 0: 10 tokens, stride 3 → chunks at 1-4, 4-7, 7-10 → 3 chunks
    assert(out.count(_._1 == 0L) == 3)
    assert(out.filter(_._1 == 0L).map(_._3).toSeq ==
      Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq("tiny doc"))
  }

  test("corpus stages reject per-event box options") {
    val df = Seq((0L, "a")).toDF("id", "text")
    val e = intercept[RuntimeException] {
      Planner.filterStage("Dedup", Map("if" -> Seq("EQ(id,0)")))(df)
    }
    assert(e.getMessage.contains("corpus-level"))
  }

  test("Normalize stage composes decomposed text in place; ColumnProfile profiles") {
    val df = Seq((1L, "cafe\u0301"), (2L, "plain")).toDF("id", "text")
    val out = Planner.corpusStage("Normalize", Map.empty[String, Any])(df)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "caf\u00e9" && out(1).getString(1) == "plain")
    // to a separate target column, NFKC
    val kc = Planner.corpusStage("Normalize",
      Map("form" -> "nfkc", "target" -> "norm"))(Seq((1L, "\uFB01")).toDF("id", "text"))
      .head()
    assert(kc.getString(kc.fieldIndex("norm")) == "fi")
    val stripped = Planner.corpusStage("StripHtml", Map.empty[String, Any])(
      Seq((9L, "<p>hi</p>")).toDF("id", "text")).head()
    assert(stripped.getString(stripped.fieldIndex("text")) == "hi")
    val prof = Planner.corpusStage("ColumnProfile",
      Map("columns" -> Seq("text")))(df).head()
    assert(prof.getString(0) == "text" && prof.getLong(1) == 2L)
    intercept[RuntimeException] {
      Planner.corpusStage("ColumnProfile", Map.empty[String, Any])(df)
    }
  }

  test("QualityRules stage dispatches Gopher/C4 rules with flag and drop modes") {
    val good = (1 to 60).map(i => s"word$i")
      .mkString("the fox and that dog have fun with it ", " ", "")
    val df = Seq((0L, good), (1L, "the shortest way of things"),
      (2L, good + " { brace }")).toDF("id", "text")
    val flagged = Planner.corpusStage("QualityRules",
      Map("src" -> "text", "min_stop_hits" -> 2))(df)
    assert(flagged.filter(col("keep")).select("id").as[Long].collect().toSeq == Seq(0L))
    assert(flagged.columns.contains("rule_no_brace"))
    val dropped = Planner.corpusStage("QualityRules",
      Map("src" -> "text", "mode" -> "drop", "min_words" -> 3))(df)
    // min_words relaxed: only the brace doc falls
    assert(dropped.columns.toSeq == Seq("id", "text"))
    assert(dropped.select("id").as[Long].collect().toSet == Set(0L, 1L))
    intercept[RuntimeException] {
      Planner.corpusStage("QualityRules", Map("src" -> "text", "mode" -> "bogus"))(df)
    }
  }

  test("EncodingArtifacts stage flags and drops broken-decode rows") {
    val df = Seq(
      (0L, "clean ascii text"),
      (1L, "caf\u00C3\u00A9 mojibake"),
      (2L, "lost \uFFFD byte"),
      (3L, "ctrl x\u0001y"),
      (4L, null: String)).toDF("id", "text")
    val flagged = Planner.corpusStage("EncodingArtifacts",
      Map("src" -> "text"))(df)
    assert(flagged.columns.toSeq ==
      Seq("id", "text", "n_replacement", "n_mojibake", "n_ctrl"))
    val m = flagged.select("id", "n_mojibake").as[(Long, Option[Long])]
      .collect().toMap
    assert(m(1L).contains(1L) && m(0L).contains(0L) && m(4L).isEmpty)
    val dropped = Planner.corpusStage("EncodingArtifacts",
      Map("src" -> "text", "mode" -> "drop"))(df)
    // any artifact drops the row; the NULL-text row carries none and stays
    assert(dropped.columns.toSeq == Seq("id", "text"))
    assert(dropped.select("id").as[Long].collect().toSet == Set(0L, 4L))
    val lenient = Planner.corpusStage("EncodingArtifacts",
      Map("src" -> "text", "mode" -> "drop", "max_mojibake" -> 1))(df)
    assert(lenient.select("id").as[Long].collect().toSet == Set(0L, 1L, 4L))
    intercept[RuntimeException] {
      Planner.corpusStage("EncodingArtifacts",
        Map("src" -> "text", "mode" -> "bogus"))(df)
    }
  }

  test("DupLines stage flags and drops line-repetitive docs") {
    val df = Seq(
      (0L, "a\nb\nc\nd"),
      (1L, "spam\nspam\nspam\nok"),   // dup_line_frac 0.75
      (2L, ""),                           // zero lines: NULL fracs, kept
      (3L, "x\nx\ny\nz\nw\nv\nu\nt\ns\nr")) // 2/10 = 0.2 dup lines
      .toDF("id", "text")
    val flagged = Planner.corpusStage("DupLines", Map("src" -> "text"))(df)
    assert(flagged.columns.toSeq == Seq("id", "text",
      "n_lines", "n_dup_lines", "dup_line_frac", "dup_char_frac"))
    val m = flagged.select("id", "n_dup_lines").as[(Long, Long)].collect().toMap
    assert(m(1L) == 3L && m(0L) == 0L && m(3L) == 2L)
    val dropped = Planner.corpusStage("DupLines",
      Map("src" -> "text", "mode" -> "drop"))(df)
    // Gopher defaults: dup_line_frac <= 0.30 AND dup_char_frac <= 0.20;
    // doc 1 fails both; doc 3 passes lines (0.2) but its dup chars are
    // 2/10 = 0.2 <= 0.20, so it stays; the zero-line doc stays
    assert(dropped.columns.toSeq == Seq("id", "text"))
    assert(dropped.select("id").as[Long].collect().toSet == Set(0L, 2L, 3L))
    intercept[RuntimeException] {
      Planner.corpusStage("DupLines", Map("src" -> "text", "mode" -> "x"))(df)
    }
  }

  test("Outlinks/HostGraph/PageRank stages chain the link-graph family") {
    val pages = Seq(
      (0L, "http://a.example/0",
        """<a href="http://b.example/x">b</a> <a href="http://c.example/y">c</a>"""),
      (1L, "http://b.example/1", """<a href="http://c.example/z">c</a>"""),
      (2L, "http://c.example/2", """<a href="http://a.example/w">a</a>"""))
      .toDF("id", "url", "html")
    val links = Planner.corpusStage("Outlinks", Map("src" -> "html"))(pages)
      .join(pages.select(col("id"), col("url").as("src_url")), "id")
    val hosts = Planner.corpusStage("HostGraph",
      Map("src" -> "src_url", "dst" -> "dst_url"))(links)
    assert(hosts.count() == 4)
    val ranks = Planner.corpusStage("PageRank",
      Map("src" -> "src_host", "dst" -> "dst_host", "iterations" -> 2))(hosts)
    val byNode = ranks.as[(String, Long)].collect().toMap
    assert(byNode.keySet == Set("a.example", "b.example", "c.example"))
    // c receives from both a and b: highest in-mass after two rounds
    assert(byNode("c.example") > byNode("b.example"))
  }

  test("Media stages route the multimodal ops by config") {
    val mm = graft.ml.Multimodal
    val media = mm.synthesizeImageVariants(Seq(0L, 127L).toDF("doc_id"), "doc_id")
    val px = Planner.corpusStage("MediaDecode", Map("method" -> "pixels"))(media)
    assert(px.select(col("px.ahash_hi")).distinct().count() == 1L)
    val resized = Planner.corpusStage("MediaResize",
      Map("width" -> 8, "height" -> 6))(media)
    assert(Planner.corpusStage("MediaDecode", Map("method" -> "pixels"))(resized)
      .select(col("px.width")).distinct().head().getInt(0) == 8)
    val wavs = mm.synthesizeWavs(Seq(3L).toDF("doc_id"), "doc_id")
    val pcm = Planner.corpusStage("MediaDecode", Map("method" -> "pcm"))(
      Planner.corpusStage("MediaResample", Map("rate" -> 16000))(wavs))
    assert(pcm.select(col("pcm.n_samples")).head().getLong(0) > 103L)
    val clips = mm.synthesizeMp4sSampled(Seq(9L).toDF("doc_id"), "doc_id")
    assert(Planner.corpusStage("MediaFrames", Map("n" -> 3))(clips).count() == 3L)
    val meta = Planner.corpusStage("MediaDecode", Map.empty[String, Any])(wavs)
    assert(meta.select(col("meta.format")).head().getString(0) == "wav")
    intercept[RuntimeException] {
      Planner.corpusStage("MediaDecode", Map("method" -> "nope"))(media)
    }
  }

  test("SemanticDedup store mode: cross-run drop + post-commit banking") {
    val store = tmp("semstore") + "/vecs"
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val stage = Planner.corpusStage("SemanticDedup", Map(
      "src" -> "embedding", "id_field" -> "vec_id", "store" -> store,
      "threshold" -> 0.4, "probes" -> 2))
    // run 1: empty store, everything survives; banking is DEFERRED
    val run1 = stage(emb.filter(col("vec_id") < 250))
    assert(run1.count() == 250L)
    assert(graft.core.PostCommit.size == 1)
    graft.core.PostCommit.drain() // the sink succeeded
    // run 2: near-stored rows drop, survivors bank on drain
    val run2 = stage(emb.filter(col("vec_id") >= 250))
    val kept = run2.count()
    assert(kept < 250L && kept > 0L)
    graft.core.PostCommit.drain()
    // run 3: replaying run 2's input drops EVERYTHING (all banked now)
    val run3 = stage(emb.filter(col("vec_id") >= 250))
    assert(run3.count() == 0L)
    graft.core.PostCommit.clear()
  }

  test("SemanticSearch dispatches ANN top-k with IVF as the default arm") {
    val rnd = new scala.util.Random(31)
    val df = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("id", "embedding")
    // panel from the corpus itself via condition DSL; default method=ivf
    val out = Planner.corpusStage("SemanticSearch", Map(
      "src" -> "embedding", "id_field" -> "id", "k" -> 3,
      "num_cells" -> 4, "nprobe" -> 4,
      "query_where" -> "EQ(id,0) || EQ(id,1)"))(df)
    assert(out.columns.toSeq == Seq("query_id", "vec_id", "rank", "sim"))
    val rows = out.as[(Long, Long, Int, Double)].collect()
    assert(rows.map(_._1).toSet == Set(0L, 1L))
    assert(rows.count(_._1 == 0L) == 3 && rows.count(_._1 == 1L) == 3)
    // nprobe == num_cells makes IVF exhaustive: each query's own vector
    // must rank first at sim ~ 1
    assert(rows.filter(r => r._1 == r._2).forall(r => r._3 == 1 && r._4 > 0.999))
    // explicit arms still dispatch
    val brute = Planner.corpusStage("SemanticSearch", Map(
      "src" -> "embedding", "id_field" -> "id", "k" -> 3,
      "method" -> "brute", "query_where" -> "EQ(id,0) || EQ(id,1)"))(df)
    assert(brute.count() == 6)
    intercept[RuntimeException] {
      Planner.corpusStage("SemanticSearch", Map(
        "method" -> "faiss", "query_where" -> "EQ(id,0) || EQ(id,1)"))(df).count()
    }
  }

  test("Vocabulary and Novelty stages dispatch the text-analysis ops") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat")).toDF("id", "text")
    val vocab = Planner.corpusStage("Vocabulary",
      Map("src" -> "text", "min_count" -> 2, "top_n" -> 2))(docs)
      .as[(String, Long, Int)].collect().toSeq
    assert(vocab == Seq(("the", 3L, 1), ("sat", 2L, 2)))

    val ref = tmp("novelty-ref")
    Seq("the cat sat on the mat today").toDF("text")
      .write.mode("overwrite").parquet(ref)
    val nov = Planner.corpusStage("Novelty", Map(
      "src" -> "text", "id_field" -> "id", "ngram" -> 3,
      "reference" -> Map("input" -> "Parquet", "path" -> ref)))(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(nov(0L) == 0.0)   // every 3-gram of doc 0 is in the reference
    assert(nov(1L) == 1.0)   // none of doc 1's are
    intercept[RuntimeException] {
      Planner.corpusStage("Novelty", Map("src" -> "text"))(docs)
    }
  }

  test("PerplexityScore stage trains from a reference spec or loads a saved model") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "zzz qqq vvv")).toDF("id", "text")
    val ref = tmp("lm-ref")
    Seq.fill(5)("the cat sat on the mat").toDF("text")
      .write.mode("overwrite").parquet(ref)

    val scored = Planner.corpusStage("PerplexityScore", Map(
      "src" -> "text", "id_field" -> "id", "order" -> 3, "min_count" -> 2,
      "reference" -> Map("input" -> "Parquet", "path" -> ref)))(docs)
      .orderBy("id").collect()
    assert(scored(0).getLong(4) == 0)                    // no OOV in doc 0
    assert(scored(1).getLong(4) == 3)                    // all OOV in doc 1
    assert(scored(0).getDouble(7) < scored(1).getDouble(7))  // ppl ordering

    // model round-trip: persist the trained counts, score via model_path
    val mp = tmp("lm-model")
    graft.ml.NgramLm.train(spark.read.parquet(ref), "text", 3, minCount = 2)
      .write.mode("overwrite").parquet(mp)
    val viaModel = Planner.corpusStage("PerplexityScore", Map(
      "src" -> "text", "id_field" -> "id", "model_path" -> mp))(docs)
      .orderBy("id").collect()
    assert(viaModel.map(_.getDouble(5)).toSeq ==
      scored.map(_.getDouble(5)).toSeq)

    intercept[RuntimeException] {
      Planner.corpusStage("PerplexityScore", Map("src" -> "text"))(docs)
    }
  }

  test("Vocabulary store option: emit covers the increment, append is post-commit") {
    val store = tmp("vocab-yaml") + "/v"
    val run1 = Seq((0L, "alpha beta alpha")).toDF("id", "text")
    val stage = Planner.corpusStage("Vocabulary", Map(
      "src" -> "text", "min_count" -> 1, "top_n" -> 10, "store" -> store))
    // emitted vocabulary INCLUDES the not-yet-appended increment…
    val v1 = stage(run1).as[(String, Long, Int)].collect()
    assert(v1.map(t => t._1 -> t._2).toMap == Map("alpha" -> 2L, "beta" -> 1L))
    // …but the store only advances when the run's sinks commit
    assert(graft.ml.Dedup.storeDataFiles(spark, store).isEmpty)
    graft.core.PostCommit.drain()
    assert(graft.ml.TextAnalysis.readVocabStore(spark, store)
      .as[(String, Long)].collect().toMap == Map("alpha" -> 2L, "beta" -> 1L))
    // run 2 merges store + its own increment
    val v2 = stage(Seq((1L, "alpha")).toDF("id", "text"))
      .as[(String, Long, Int)].collect()
    graft.core.PostCommit.drain()
    assert(v2.map(t => t._1 -> t._2).toMap == Map("alpha" -> 3L, "beta" -> 1L))
  }

  test("LangId stage trains from a labeled reference or loads saved profiles") {
    val ref = tmp("langid-ref")
    Seq(
      ("en", "the cat and the dog run through the field with the fox and they play together"),
      ("de", "die katze und der hund laufen durch das feld mit dem fuchs und sie spielen zusammen"))
      .toDF("lang", "text").write.mode("overwrite").parquet(ref)
    val docs = Seq((0L, "the dog and the cat in the field"),
      (1L, "der hund und die katze mit dem fuchs")).toDF("id", "text")
    val out = Planner.corpusStage("LangId", Map(
      "src" -> "text", "id_field" -> "id",
      "reference" -> Map[String, Any]("input" -> "Parquet", "path" -> ref)))(docs)
      .select("id", "lang_guess").as[(Long, String)].collect().toMap
    assert(out == Map(0L -> "en", 1L -> "de"))

    // saved-profiles path serves identically
    val profDir = tmp("langid-prof")
    graft.ml.LangId.trainProfiles(
      spark.read.parquet(ref), "text", "lang").write.mode("overwrite").parquet(profDir)
    val out2 = Planner.corpusStage("LangId", Map(
      "src" -> "text", "id_field" -> "id", "profiles_path" -> profDir))(docs)
      .select("id", "lang_guess").as[(Long, String)].collect().toMap
    assert(out2 == out)
    intercept[RuntimeException] {
      Planner.corpusStage("LangId", Map("src" -> "text"))(docs)
    }
  }

  test("HostGraph store option: emit covers the increment, append is post-commit") {
    val store = tmp("hg-yaml") + "/edges"
    val stage = Planner.corpusStage("HostGraph", Map(
      "src" -> "src_url", "dst" -> "dst_url", "store" -> store))
    val crawl1 = Seq(("http://a.example/1", "http://b.example/x"))
      .toDF("src_url", "dst_url")
    // emitted graph INCLUDES the not-yet-appended increment…
    val g1 = stage(crawl1).as[(String, String, Long)].collect().toSet
    assert(g1 == Set(("a.example", "b.example", 1L)))
    // …but the store only advances when the run's sinks commit
    assert(graft.ml.Dedup.storeDataFiles(spark, store).isEmpty)
    graft.core.PostCommit.drain()
    // run 2 merges store + its own increment
    val crawl2 = Seq(("http://a.example/2", "http://b.example/y"),
      ("http://b.example/1", "http://c.example/z")).toDF("src_url", "dst_url")
    val g2 = stage(crawl2).as[(String, String, Long)].collect().toSet
    graft.core.PostCommit.drain()
    assert(g2 == Set(("a.example", "b.example", 2L),
      ("b.example", "c.example", 1L)))
    assert(graft.ml.LinkGraph.readHostGraphStore(spark, store)
      .as[(String, String, Long)].collect().toSet == g2)
  }

  test("SaltedJoin stage enriches against a right input spec") {
    val dim = tmp("salted-dim")
    Seq((0L, "zero"), (1L, "one")).toDF("k", "name")
      .write.mode("overwrite").parquet(dim)
    val facts = Seq((0L, 10L), (0L, 11L), (1L, 12L), (2L, 13L))
      .toDF("k", "row_id")
    val out = Planner.filterStage("SaltedJoin", Map(
      "key" -> "k", "salt" -> 4, "join_type" -> "left",
      "right" -> Map("input" -> "Parquet", "path" -> dim)))(facts)
      .orderBy("row_id").select("k", "row_id", "name")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(out == Seq((0L, 10L, Some("zero")), (0L, 11L, Some("zero")),
      (1L, 12L, Some("one")), (2L, 13L, None)))
    intercept[RuntimeException] {
      Planner.filterStage("SaltedJoin", Map("key" -> "k"))(facts)
    }
  }

  test("Decontaminate method=report dispatches the contamination audit") {
    val bench = tmp("contam-bench")
    Seq((9L, "alpha beta gamma delta epsilon"))
      .toDF("id", "text").write.mode("overwrite").parquet(bench)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "nothing shared here at all today")).toDF("id", "text")
    val rep = Planner.corpusStage("Decontaminate", Map(
      "src" -> "text", "id_field" -> "id", "method" -> "report",
      "benchmark" -> Map("input" -> "Parquet", "path" -> bench)))(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rep == Seq((0L, 9L, 1L)))
  }

  test("CorpusDiff stage diffs against an `old` input spec") {
    val oldPath = tmp("diff-old")
    Seq((0L, "same"), (1L, "stale"), (2L, "gone")).toDF("id", "text")
      .write.mode("overwrite").parquet(oldPath)
    val neu = Seq((0L, "same"), (1L, "fresh"), (3L, "born"))
      .toDF("id", "text")
    val out = Planner.corpusStage("CorpusDiff", Map(
      "id_field" -> "id", "src" -> "text",
      "old" -> Map("input" -> "Parquet", "path" -> oldPath)))(neu)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 2L -> "removed", 3L -> "added"))
    intercept[RuntimeException] {
      Planner.corpusStage("CorpusDiff", Map("src" -> "text"))(neu)
    }
  }

  test("InvertedIndex and KnnJoin stages dispatch with their knobs") {
    val docs = Seq((0L, "a b"), (1L, "a c")).toDF("id", "text")
    val idx = Planner.corpusStage("InvertedIndex", Map(
      "id_field" -> "id", "src" -> "text", "min_df" -> 2))(docs)
      .as[(String, Long, Int, Long)].collect().toSet
    assert(idx == Set(("a", 2L, 1, 0L), ("a", 2L, 2, 1L)))

    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("id", "embedding")
    val knn = Planner.corpusStage("KnnJoin", Map(
      "id_field" -> "id", "method" -> "brute", "k" -> 1))(vecs)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    assert(knn(0L) == 1L && knn(1L) == 0L) // mutual nearest
    assert(knn(2L) == 1L) // v1 has the only non-zero cosine with v2
    // ivf + kmeans path dispatches (trained centroids, then the celled
    // join); the tiny corpus clamps cells to corpus size
    val knnIvf = Planner.corpusStage("KnnJoin", Map(
      "id_field" -> "id", "method" -> "ivf", "k" -> 1,
      "num_cells" -> 2, "nprobe" -> 2, "kmeans" -> true))(vecs)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    assert(knnIvf(0L) == 1L && knnIvf(1L) == 0L)
    intercept[RuntimeException] {
      Planner.corpusStage("KnnJoin", Map("method" -> "faiss"))(vecs)
    }
  }

  test("BudgetMix plans and applies a token-budget mixture") {
    val docs = Seq(
      (0L, "web", "a b c d e"), (1L, "web", "f g h i j"),
      (2L, "books", (1 to 40).map(i => s"t$i").mkString(" ")))
      .toDF("id", "source", "text")
    val plan = Planner.corpusStage("BudgetMix", Map(
      "group_field" -> "source", "src" -> "text", "budget" -> 40,
      "weights" -> Map("web" -> 3.0), "emit" -> "plan"))(docs)
    assert(plan.filter($"group" === "web").select("rate")
      .as[Double].head() == 1.0)
    val applied = Planner.corpusStage("BudgetMix", Map(
      "group_field" -> "source", "src" -> "text", "budget" -> 40,
      "weights" -> Map("web" -> 3.0), "id_field" -> "id"))(docs)
    // web rate clamps at 1 -> both web docs survive; books rate 0.25
    assert(applied.filter($"source" === "web").count() == 2L)
    intercept[RuntimeException] {
      Planner.corpusStage("BudgetMix", Map("group_field" -> "source"))(docs)
    }
    intercept[RuntimeException] {
      Planner.corpusStage("BudgetMix", Map("group_field" -> "source",
        "budget" -> 40, "emit" -> "nope"))(docs)
    }
  }

  test("ZOrderExport tees a z-clustered export") {
    val out = tmp("zorder-export")
    val grid = (for (a <- 0L until 16L; b <- 0L until 16L)
      yield (a, b)).toDF("a", "b")
    val passed = Planner.corpusStage("ZOrderExport", Map(
      "by" -> Seq("a", "b"), "path" -> out, "files" -> 4))(grid)
    assert(passed.count() == 256L) // pass-through
    val rects = graft.ml.DatasetOps.auditFileRectangles(spark, out,
        Seq("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rects.length == 4 && rects.map(_._5).sum == 256L)
    rects.foreach { case (amin, amax, bmin, bmax, _) =>
      assert(amax - amin <= 8 && bmax - bmin <= 8)
    }
    intercept[RuntimeException] {
      Planner.corpusStage("ZOrderExport", Map("path" -> out))(grid)
    }
  }

  test("model-based curation chain: QualityClassifier → Dsir through graft.Main") {
    // the round-13 trained-selection pair composed by config: a labeled
    // reference trains the quality ranker, a target-domain sample drives
    // DSIR — survivors are high-quality AND target-like
    val in = tmp("mb-in")
    val labeled = tmp("mb-labeled")
    val tgt = tmp("mb-target")
    val out = tmp("mb-out")
    val good = Vector("research", "method", "analysis", "model", "data",
      "result", "experiment", "theory", "approach", "evidence")
    val bad = Vector("click", "buy", "now", "cheap", "free", "offer")
    def doc(words: Vector[String], i: Int): String =
      (0 until 10).map(j => words((i * 3 + j * 7) % words.size)).mkString(" ")
    // pool: ids 0..99 — even = good/target-like, odd = spam
    (0L until 100L).map(i =>
      (i, if (i % 2 == 0) doc(good, i.toInt) else doc(bad, i.toInt)))
      .toDF("id", "text").write.mode("overwrite").parquet(in)
    (200 until 320).map(i =>
      (i.toLong, if (i % 2 == 0) doc(good, i) else doc(bad, i),
        if (i % 2 == 0) 1 else 0))
      .toDF("id", "text", "label").write.mode("overwrite").parquet(labeled)
    (400 until 430).map(i => (i.toLong, doc(good, i)))
      .toDF("id", "text").write.mode("overwrite").parquet(tgt)

    val yaml =
      s"""inputs:
         |  - Parquet:
         |      path: $in
         |filters:
         |  - QualityClassifier:
         |      src: text
         |      reference: {input: Parquet, path: $labeled, label_field: label}
         |      log_buckets: 10
         |      epochs: 20
         |      lr: 1.0
         |      keep_above: "0.0"
         |  - Dsir:
         |      src: text
         |      id_field: id
         |      target: {input: Parquet, path: $tgt}
         |      log_buckets: 10
         |      method: threshold
         |      cap: 1.0
         |outputs:
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("mb-pipeline", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)

    val kept = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(kept.nonEmpty, "model-based chain kept nothing")
    // the classifier should have removed every spam doc before DSIR ran
    assert(kept.forall(_ % 2 == 0), s"spam survived the classifier: $kept")
    // evidence columns dropped by default; quality_logit stays (a score,
    // not DSIR scratch)
    val cols = spark.read.parquet(out).columns.toSet
    assert(cols.contains("quality_logit") && !cols.contains("sum_ratio"), cols)
  }

  test("full curation chain with feature store: rules → clf → dsir → dedup, re-run idempotent") {
    // the q_curate_rank composition driven entirely by config, with the
    // round-14 feature store in the loop: run 1 featurizes the labeled
    // reference into the store and trains from it; run 2 appends NOTHING
    // (anti-join idempotence) and — because store-trained weights are
    // bit-deterministic — keeps exactly the same documents
    val in = tmp("fc-in")
    val labeled = tmp("fc-labeled")
    val tgt = tmp("fc-target")
    val store = tmp("fc-store") + "/feats"
    val out = tmp("fc-out")
    val good = Vector("research", "method", "analysis", "model", "data",
      "result", "experiment", "theory", "approach", "evidence")
    val bad = Vector("click", "buy", "now", "cheap", "free", "offer")
    def doc(words: Vector[String], i: Int): String =
      "the " + (0 until 9).map(j => words((i * 3 + j * 7) % words.size))
        .mkString(" ") // "the" satisfies rule_stopwords at min_stop_hits 1
    // pool: even = good, odd = spam; 50/51 are an exact-dup pair (near-
    // dedup must cut 51); 52 fails the rules (brace)
    val pool = (0L until 50L).map(i =>
      (i, if (i % 2 == 0) doc(good, i.toInt) else doc(bad, i.toInt))) ++
      Seq((50L, doc(good, 2)), (51L, doc(good, 2)),
        (52L, doc(good, 4) + " {brace}"))
    pool.toDF("id", "text").write.mode("overwrite").parquet(in)
    (200 until 320).map(i =>
      (i.toLong, if (i % 2 == 0) doc(good, i) else doc(bad, i),
        if (i % 2 == 0) 1 else 0))
      .toDF("id", "text", "label").write.mode("overwrite").parquet(labeled)
    (400 until 430).map(i => (i.toLong, doc(good, i)))
      .toDF("id", "text").write.mode("overwrite").parquet(tgt)

    val yaml =
      s"""inputs:
         |  - Parquet:
         |      path: $in
         |filters:
         |  - QualityRules: {src: text, mode: drop, min_words: 6, min_stop_hits: 1}
         |  - QualityClassifier:
         |      src: text
         |      feature_store_path: $store
         |      reference: {input: Parquet, path: $labeled, label_field: label, id_field: id}
         |      log_buckets: 10
         |      epochs: 20
         |      lr: 1.0
         |      keep_above: "0.0"
         |  - Dsir:
         |      src: text
         |      id_field: id
         |      target: {input: Parquet, path: $tgt}
         |      log_buckets: 10
         |      method: threshold
         |      cap: 1.0
         |  - Dedup: {src: text, id_field: id, method: minhash}
         |outputs:
         |  - Parquet:
         |      path: $out
         |""".stripMargin
    val cfg = java.nio.file.Files.createTempFile("fc-pipeline", ".yml")
    java.nio.file.Files.write(cfg, yaml.getBytes("UTF-8"))
    graft.Main.run(spark, cfg.toString)

    val kept1 = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(kept1.nonEmpty, "curation chain kept nothing")
    assert(kept1.forall(_ % 2 == 0), s"spam survived the classifier: $kept1")
    assert(!kept1.contains(52L), "rule-failing doc survived QualityRules")
    // the exact-dup pair: near-dedup keeps the smaller id only
    assert(!(kept1.contains(50L) && kept1.contains(51L)),
      s"both members of the dup pair survived: $kept1")
    // run 1 featurized the full labeled reference into the store
    assert(spark.read.parquet(s"$store/rows").count() == 120L)

    // run 2: same config — the store append is a no-op and the
    // bit-deterministic re-train keeps the SAME set
    graft.Main.run(spark, cfg.toString)
    assert(spark.read.parquet(s"$store/rows").count() == 120L,
      "re-run appended duplicate feature rows")
    val kept2 = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(kept2 == kept1, s"re-run changed the kept set: $kept1 vs $kept2")

    // BIT-PARITY with full-batch training (r14 verdict task 6): the
    // config-driven train→store→score loop must produce logits IDENTICAL
    // to QualityClassifier.train over the same labeled rows — the
    // decimal(38,18) gradient lattice makes store-trained weights
    // bit-equal, so every surviving doc's quality_logit replays exactly
    val fullBatch = graft.ml.QualityClassifier.train(
      spark.read.parquet(labeled), "text", "label", logBuckets = 10,
      bigrams = true, epochs = 20, lr = 1.0)
    val expect = graft.ml.QualityClassifier.score(
        spark.read.parquet(in), "text", fullBatch)
      .select(col("id").as("eid"), col("quality_logit").as("expect_logit"))
    val got = spark.read.parquet(out).select(col("id"), col("quality_logit"))
    val joined = got.join(expect, col("id") === col("eid"))
    assert(joined.count() == got.count(), "pipeline kept an id the " +
      "full-batch scorer cannot see")
    val diverged = joined
      .filter(col("quality_logit") =!= col("expect_logit")).count()
    assert(diverged == 0L,
      s"$diverged store-trained logits diverge from full-batch training")
  }

  test("RangeSortedExport tees a sorted, range-partitioned export") {
    val out = tmp("range-export")
    val docs = (0L until 200L).map(i => (i, s"d$i")).toDF("id", "text")
    val passed = Planner.corpusStage("RangeSortedExport", Map(
      "id_field" -> "id", "path" -> out, "files" -> 3))(docs)
    assert(passed.count() == 200L) // pass-through, cardinality intact
    val audit = graft.ml.DatasetOps.auditFileRanges(spark, out, "id")
      .as[(Int, Long, Boolean)].collect()
    assert(audit.length == 3 && audit.forall(_._3))
    assert(spark.read.parquet(out).count() == 200L)
    intercept[RuntimeException] {
      Planner.corpusStage("RangeSortedExport", Map("path" -> out))(docs)
    }
  }
}
