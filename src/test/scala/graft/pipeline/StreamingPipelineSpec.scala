package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming: MemoryStream lines → planner filter chain →
  * foreachBatch sink routing (mirrors the reference's itest.sh count-based
  * golden assertions over a full pipeline). */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("yaml pipeline processes a stream through foreachBatch to parquet") {
    val yaml =
      """inputs:
        |  - Text: {path: unused}
        |filters:
        |  - Grok:
        |      src: message
        |      match: ['^%{WORD:verb} %{INT:code}$']
        |  - Convert:
        |      fields:
        |        code: {to: int}
        |  - Add:
        |      fields: {pipeline: streaming}
        |outputs:
        |  - Parquet: {path: /tmp/graft_stream_out}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)

    val mem = MemoryStream[String](spark)
    val src = mem.toDF()
      .select(col("value").as("message"), current_timestamp().as("@timestamp"))
    val transformed = pipeline.transform(src)
    assert(transformed.isStreaming)

    val q = Planner.startForeachBatch(pipeline, transformed,
      checkpoint = Some("/tmp/graft_stream_ckpt_" + System.nanoTime()))
    try {
      mem.addData("GET 200", "POST 404", "GET 500")
      q.processAllAvailable()
      val out = spark.read.parquet("/tmp/graft_stream_out")
      assert(out.count() == 3)
      val row = out.filter(col("code") === 404).collect().head
      assert(row.getString(row.fieldIndex("verb")) == "POST")
      assert(row.getString(row.fieldIndex("pipeline")) == "streaming")
    } finally q.stop()
  }

  test("streamingSplit keeps row-wise corpus stages on the stream side") {
    // Mix is a pure codegen filter — forcing it per-batch would drag a
    // downstream watermarked metric stage into foreachBatch too, turning
    // its windowed aggregation into fragmented per-trigger partials
    val stages = Seq(
      "Mix" -> Map[String, Any]("group_field" -> "src"),
      "LinkMetric" -> Map[String, Any]("fieldsLink" -> "a->b"),
      "Dedup" -> Map[String, Any]("method" -> "exact"))
    val (stream, perBatch) = Planner.streamingSplit(stages)
    assert(stream.map(_._1) == Seq("Mix", "LinkMetric"))
    assert(perBatch.map(_._1) == Seq("Dedup"))

    // as-of enrichment demotes to the foreachBatch tail; BOTH Sessionize
    // forms stream natively (session_window / keyed-state assign)
    val analytic = Seq(
      "Sessionize" -> Map[String, Any]("key" -> "u", "summary" -> true),
      "Sessionize" -> Map[String, Any]("key" -> "u"),
      "AsOfJoin" -> Map[String, Any]("keys" -> Seq("u")))
    val (s2, b2) = Planner.streamingSplit(analytic)
    assert(s2.map(_._1) == Seq("Sessionize", "Sessionize"))
    assert(b2.map(_._1) == Seq("AsOfJoin"))

    // the curation-on-ingest chain is all row-wise: streams natively up
    // to the first cardinality-global stage (dedup needs the corpus)
    val curation = Seq(
      "StripHtml" -> Map[String, Any]("src" -> "text"),
      "LineFilter" -> Map[String, Any]("src" -> "text", "mode" -> "drop"),
      "QualityRules" -> Map[String, Any]("src" -> "text", "mode" -> "drop"),
      "Outlinks" -> Map[String, Any]("src" -> "text"),
      "Dedup" -> Map[String, Any]("method" -> "exact"))
    val (s3, b3) = Planner.streamingSplit(curation)
    assert(s3.map(_._1) ==
      Seq("StripHtml", "LineFilter", "QualityRules", "Outlinks"))
    assert(b3.map(_._1) == Seq("Dedup"))

    // EncodingArtifacts is a pure per-row regexp count (flag or drop) —
    // it must score ON the stream, not buffer into the tail
    val enc = Seq(
      "EncodingArtifacts" -> Map[String, Any]("src" -> "text", "mode" -> "drop"),
      "DupLines" -> Map[String, Any]("src" -> "text", "mode" -> "drop"),
      "ScriptProfile" -> Map[String, Any]("src" -> "text", "mode" -> "drop"),
      "Dedup" -> Map[String, Any]("method" -> "exact"))
    val (s4, b4) = Planner.streamingSplit(enc)
    assert(s4.map(_._1) == Seq("EncodingArtifacts", "DupLines", "ScriptProfile"))
    assert(b4.map(_._1) == Seq("Dedup"))
  }

  test("ScriptProfile scores and drops live on the stream, " +
      "stream/batch bit-parity") {
    // flag mode: per-class counts + dominant_foreign must replay
    // bit-identically over an unbounded frame; drop mode: a
    // mostly-cyrillic doc drops in-flight when latin is expected
    val yaml =
      """inputs:
        |  - Text: {path: unused}
        |filters:
        |  - ScriptProfile: {src: text}
        |outputs:
        |  - Stdout: {}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    assert(Planner.streamingSplit(pipeline.stages)._2.isEmpty)
    val pool = Seq(
      (0L, "plain english text"),
      (1L, "english with Привет"), // + cyrillic
      (2L, "你好世界 你好"),             // cjk only
      (3L, ""))
    val cols = Seq("doc_id", "n_latin", "n_cyrillic", "n_cjk",
      "dominant_foreign")
    val mem = MemoryStream[(Long, String)](spark)
    val transformed = pipeline.transform(mem.toDF().toDF("doc_id", "text"))
    assert(transformed.isStreaming)
    val q = transformed.writeStream.format("memory")
      .queryName("script_live").start()
    try {
      mem.addData(pool: _*)
      q.processAllAvailable()
      val streamed = spark.table("script_live")
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
      val batched = pipeline.transform(pool.toDF("doc_id", "text"))
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
      assert(streamed == batched, s"diverged: $streamed vs $batched")
      val byId = spark.table("script_live").select(cols.map(col): _*)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(byId(1L).getLong(2) == 6L, "cyrillic uncounted")
      assert(byId(1L).getString(4) == "cyrillic")
      assert(byId(0L).getString(4) == "none")
      // zero-exchange micro-batch: scoring rides ingest at scan speed
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("Exchange"), s"script scoring shuffles:\n$exec")
    } finally q.stop()

    val dropYaml = yaml.replace("{src: text}",
      "{src: text, mode: drop, expect: latin, min_frac: 0.5}")
    val dropPipe = Planner.fromYaml(dropYaml)
    val mem2 = MemoryStream[(Long, String)](spark)
    val q2 = dropPipe.transform(mem2.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("script_drop").start()
    try {
      mem2.addData(pool: _*)
      q2.processAllAvailable()
      val kept = spark.table("script_drop")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // 2 is cjk-only (latin frac 0 < 0.5) → dropped; 1 is latin-
      // dominant → kept; 3 has zero letters → KEPT (no evidence)
      assert(kept == Set(0L, 1L, 3L), s"drop-mode stream kept $kept")
      assert(spark.table("script_drop").columns.toSeq ==
        Seq("doc_id", "text"))
    } finally q2.stop()
  }

  test("curation-on-ingest runs live on the stream: strip, line filter, rules") {
    // the whitelist isn't just routing — the stages must actually execute
    // on an unbounded frame (no eager action, no window sneaking in)
    val yaml =
      s"""inputs:
        |  - Text: {path: unused}
        |filters:
        |  - StripHtml: {src: text}
        |  - LineFilter: {src: text, mode: drop, min_lines: 1}
        |  - QualityRules: {src: text, mode: drop, min_words: 5, min_stop_hits: 1}
        |outputs:
        |  - Stdout: {}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val (streamStages, perBatch) = Planner.streamingSplit(pipeline.stages)
    assert(perBatch.isEmpty, "pure curation chain must stay on the stream side")

    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("id", "text")
    val transformed = pipeline.transform(src)
    assert(transformed.isStreaming)
    val q = transformed.writeStream.format("memory")
      .queryName("curation_live").start()
    try {
      mem.addData(
        (0L, "<p>the quick brown fox jumps over the lazy dog today.</p>"),
        (1L, "<p>too short.</p>"),                      // line filter kills all lines
        (2L, "zz yy xx ww vv uu tt ss rr qq pp oo."))   // no stop words
      q.processAllAvailable()
      val got = spark.table("curation_live").select("id").collect().map(_.getLong(0))
      assert(got.toSeq == Seq(0L), got.mkString(","))
    } finally q.stop()
  }

  test("streaming curation parity: rules → clf → dsir-keep scores ON the " +
      "stream, zero-exchange micro-batch") {
    // the q_curate_rank scoring prefix as a streaming stage (r14 verdict
    // task 7): model and count frames resolve at PLAN time from saved
    // paths, then the whole prefix is a narrow map — curation-on-ingest
    // must score on the stream itself, not buffer into foreachBatch
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-curate").toString
    val good = Vector("research", "method", "analysis", "model", "data",
      "result", "experiment", "theory", "approach", "evidence",
      "click", "buy", "cheap", "offer")
    def doc(i: Long): String =
      "the " + (0 until 9).map(j => good(((i * 3 + j * 7) % good.size).toInt))
        .mkString(" ")
    val pool = (0L until 60L).map(i =>
      (i, if (i == 59L) doc(i) + " {brace}" else doc(i))) // 59 fails rules
    val batchDf = pool.toDF("doc_id", "text")
    val model = graft.functions.QualityClfModel(
      graft.ml.QualityClassifier.syntheticWeights(10), 10,
      bigrams = true, bias = 0.0)
    graft.ml.QualityClassifier.save(spark, model, s"$dir/model")
    graft.ml.Dsir.ngramCounts(batchDf.filter(col("doc_id") < 20), "text", 10)
      .write.parquet(s"$dir/tgt")
    graft.ml.Dsir.ngramCounts(batchDf, "text", 10).write.parquet(s"$dir/raw")

    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - QualityRules: {src: text, mode: drop, min_words: 5, min_stop_hits: 1}
         |  - QualityClassifier:
         |      src: text
         |      model_path: $dir/model
         |      keep_above: "-100.0"
         |  - Dsir:
         |      src: text
         |      id_field: doc_id
         |      target_counts_path: $dir/tgt
         |      raw_counts_path: $dir/raw
         |      log_buckets: 10
         |      method: threshold
         |      keep_evidence: true
         |outputs:
         |  - Stdout: {}
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val (_, perBatch) = Planner.streamingSplit(pipeline.stages)
    assert(perBatch.isEmpty,
      s"curation prefix forced into the foreachBatch tail: $perBatch")
    // a NON-stream-capable Dsir config (global top-k) still splits to
    // the tail — streamability is config-dependent, not a blanket pass
    val topk = Planner.fromYaml(yaml.replace("method: threshold",
      "method: topk\n      k: 10"))
    assert(Planner.streamingSplit(topk.stages)._2.map(_._1) == Seq("Dsir"))

    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val transformed = pipeline.transform(src)
    assert(transformed.isStreaming,
      "curation prefix must build on the unbounded frame")
    val q = transformed.writeStream.format("memory")
      .queryName("curate_parity").start()
    try {
      mem.addData(pool: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getDouble(1), r.getDouble(2))
      val streamed = spark.table("curate_parity")
        .select("doc_id", "quality_logit", "sum_ratio").collect()
        .map(key).toSet
      // BIT-PARITY: the same YAML stages over the same rows as a batch
      // frame — logits and DSIR evidence replay exactly
      val batched = pipeline.transform(batchDf)
        .select("doc_id", "quality_logit", "sum_ratio").collect()
        .map(key).toSet
      assert(streamed.nonEmpty, "streaming curation kept nothing")
      assert(!streamed.exists(_._1 == 59L), "rule-failing doc survived")
      assert(streamed == batched,
        s"stream/batch curation diverged: ${streamed.diff(batched)} vs ${
          batched.diff(streamed)}")
      // ZERO-EXCHANGE: the committed micro-batch plan is a narrow map
      // end to end — at 100 TB/day ingest the prefix scores at receive
      // speed with no shuffle before the sink
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("Exchange"),
        s"streaming curation prefix shuffles:\n$exec")
      assert(!exec.contains("Join"),
        s"streaming curation prefix joins:\n$exec")
    } finally q.stop()
  }

  test("incremental dedup streams: the seen store advances per committed micro-batch") {
    // continuous ingestion with cross-batch dedup — the corpus stage runs
    // per micro-batch inside foreachBatch (streamingSplit routes it
    // there; a streaming frame can't express its eager counts/windows),
    // and the store append rides the per-batch PostCommit drain, so a
    // batch's fingerprints are seen by every LATER batch but never by
    // itself (retry-safe, same contract as the batch runner).
    val base = java.nio.file.Files
      .createTempDirectory("graft-stream-inc").toString
    val store = s"$base/fps"
    val outDir = s"$base/out"
    val yaml =
      s"""inputs:
        |  - Text: {path: unused}
        |filters:
        |  - Dedup: {method: incremental, store: $store, update_store: true,
        |            src: message, id_field: id}
        |outputs:
        |  - Parquet: {path: $outDir, mode: append}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val (streamStages, perBatch) = Planner.streamingSplit(pipeline.stages)
    assert(streamStages.isEmpty && perBatch.size == 1,
      "corpus stage must land in the per-batch tail")
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("id", "message")
    val q = Planner.startForeachBatch(pipeline, src,
      checkpoint = Some(s"$base/ckpt"), perBatchStages = perBatch)
    try {
      mem.addData((0L, "alpha content"), (1L, "beta content"),
        (2L, "alpha content")) // within-batch dup of 0
      q.processAllAvailable()
      assert(spark.read.parquet(store).count() == 2)
      mem.addData((10L, "alpha content"), // cross-batch repeat of 0
        (11L, "fresh gamma content"))
      q.processAllAvailable()
      assert(spark.read.parquet(store).count() == 3)
      val out = spark.read.parquet(outDir)
        .select("id").as[Long].collect().toSet
      assert(out == Set(0L, 1L, 11L))
    } finally q.stop()
  }

  test("streaming pipeline routes micro-batches into the ClickHouse JDBC sink") {
    val url = "jdbc:derby:memory:chstream;create=true"
    val setup = java.sql.DriverManager.getConnection(url)
    try setup.createStatement().executeUpdate(
      "CREATE TABLE stream_out (message VARCHAR(64), n BIGINT)")
    finally setup.close()

    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - Convert:
         |      fields:
         |        n: {to: int}
         |outputs:
         |  - ClickHouse:
         |      table: stream_out
         |      hosts: ['$url']
         |      columns: ['message String', 'n Int64']
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val mem = MemoryStream[(String, String)](spark)
    val src = mem.toDF().toDF("message", "n")
    val q = Planner.startForeachBatch(pipeline, pipeline.transform(src),
      checkpoint = Some("/tmp/graft_ch_ckpt_" + System.nanoTime()))
    try {
      mem.addData(("a", "1"), ("b", "2"))
      q.processAllAvailable()
      mem.addData(("c", "3"))
      q.processAllAvailable()
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement()
          .executeQuery("SELECT message, n FROM stream_out ORDER BY n")
        val rows = Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getString(1), r.getLong(2))).toList
        assert(rows == List(("a", 1L), ("b", 2L), ("c", 3L)))
      } finally conn.close()
    } finally q.stop()
  }

  test("Translate dictionary_path re-resolves across streaming micro-batches") {
    val dictFile = java.nio.file.Files.createTempFile("graft_sdict", ".yml")
    java.nio.file.Files.writeString(dictFile, "error: E\n")
    val outDir = "/tmp/graft_translate_stream_" + System.nanoTime()
    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - Translate:
         |      source: message
         |      target: code
         |      dictionary_path: $dictFile
         |      refresh_interval: 0
         |outputs:
         |  - Parquet: {path: $outDir, mode: append}
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val mem = MemoryStream[String](spark)
    val src = mem.toDF().select(col("value").as("message"))
    val q = Planner.startForeachBatch(pipeline, pipeline.transform(src),
      checkpoint = Some("/tmp/graft_sdict_ckpt_" + System.nanoTime()))
    try {
      mem.addData("error")
      q.processAllAvailable()
      // the dict changes BETWEEN micro-batches; the running query (one
      // compiled plan) must pick up the new mapping on the next batch
      java.nio.file.Files.writeString(dictFile, "error: E2\n")
      mem.addData("error")
      q.processAllAvailable()
      val codes = spark.read.parquet(outDir)
        .select("code").as[String].collect().toSeq.sorted
      assert(codes == Seq("E", "E2"))
    } finally q.stop()
  }

  test("streaming LinkStatsMetric in update mode re-emits running totals (accumulateMode=cumulative)") {
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
    val src = mem.toDF().toDF("@timestamp", "event_type", "value")
    val out = graft.operators.LinkStatsMetric.streaming(
      graft.operators.LinkMetric.Config("event_type->value", 60, reserveWindowSec = 120))(src)
    val q = out.writeStream.format("memory").queryName("lsm_update")
      .outputMode("update").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((ts("2024-01-01 00:00:10"), "a", 10.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:00:20"), "a", 30.0))
      q.processAllAvailable()
      val sums = spark.sql("select * from lsm_update").collect()
        .map(r => r.getDouble(r.fieldIndex("sum"))).sorted.toSeq
      assert(sums == Seq(10.0, 40.0)) // updated totals re-emitted per batch
    } finally q.stop()
  }

  test("windowed aggregation state survives a checkpointed restart") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ckpt = "/tmp/graft_restart_ckpt_" + System.nanoTime()
    val outDir = "/tmp/graft_restart_out_" + System.nanoTime()
    val cfg = graft.operators.LinkMetric.Config("event_type", 60, reserveWindowSec = 120)

    val mem1 = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q1 = graft.operators.LinkMetric.streaming(cfg)(mem1.toDF().toDF("@timestamp", "event_type"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    mem1.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint with a fresh source; watermark
    // advances past the first window so its count (2) finally emits
    val mem2 = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q2 = graft.operators.LinkMetric.streaming(cfg)(mem2.toDF().toDF("@timestamp", "event_type"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mem2.addData((ts("2024-01-01 01:00:00"), "b"))
      q2.processAllAvailable()
      mem2.addData((ts("2024-01-01 02:00:00"), "b"))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir).collect()
      assert(rows.exists(r => r.getString(r.fieldIndex("event_type")) == "a" &&
        r.getLong(r.fieldIndex("count")) == 2L),
        s"state lost across restart: ${rows.mkString(";")}")
    } finally q2.stop()
  }

  test("drop_original_event=false unions metric events with originals (batch)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"))
      .toDF("@timestamp", "event_type")
    val stage = Planner.filterStage("LinkMetric", Map(
      "fieldsLink" -> "event_type", "batchWindow" -> 60L,
      "drop_original_event" -> false))
    val out = stage(df)
    assert(out.count() == 3) // 2 originals + 1 metric event
    val metric = out.filter(col("count").isNotNull).collect()
    assert(metric.length == 1 && metric.head.getLong(metric.head.fieldIndex("count")) == 2L)
  }

  test("drop_original_event=false on a STREAMING run re-enters metric events (foreachBatch fan-out)") {
    // reference: filter/link_metric.go:248-274 + topology/filter.go:35-37 —
    // synthetic metric events re-enter the pipeline mid-chain while the
    // originals keep flowing. Streaming mapping: streamingSplit puts the
    // metric stage (and everything after) inside foreachBatch, where each
    // micro-batch is a plain DataFrame and the batch UNION ALL applies.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val outDir = "/tmp/graft_reentry_out_" + System.nanoTime()
    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - Add:
         |      fields: {stage_pre: ran}
         |  - LinkMetric:
         |      fieldsLink: event_type
         |      batchWindow: 60
         |      drop_original_event: false
         |  - Add:
         |      fields: {stage_post: ran}
         |outputs:
         |  - Parquet: {path: $outDir, mode: append}
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val (pre, perBatch) = Planner.streamingSplit(pipeline.stages)
    assert(pre.map(_._1) == Seq("Add") && perBatch.map(_._1) == Seq("LinkMetric", "Add"))

    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val src: org.apache.spark.sql.DataFrame = mem.toDF().toDF("@timestamp", "event_type")
    // same wiring as Planner.runStreaming, with a MemoryStream as the input
    val streamed = pre.foldLeft(src) { case (d, (n, c)) => Planner.filterStage(n, c)(d) }
    assert(streamed.isStreaming)
    val q = Planner.startForeachBatch(pipeline, streamed,
      checkpoint = Some("/tmp/graft_reentry_ckpt_" + System.nanoTime()), perBatch)
    try {
      mem.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      assert(out.count() == 3) // 2 originals + 1 metric event, ONE streaming run
      val originals = out.filter(col("count").isNull).collect()
      val metrics = out.filter(col("count").isNotNull).collect()
      assert(originals.length == 2 && metrics.length == 1)
      assert(metrics.head.getLong(metrics.head.fieldIndex("count")) == 2L)
      // the post-metric filter saw BOTH originals and the re-entered metric
      assert(out.filter(col("stage_post") === "ran").count() == 3)
      // a second micro-batch keeps emitting per-cadence metrics
      mem.addData((ts("2024-01-01 00:01:10"), "b"))
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 5)
    } finally q.stop()
  }

  test("two-tier reduce: downstream streaming instance merges upstream partial counts exactly") {
    // the reference's count-golden integration topology
    // (test/itest.sh:100-140): tier-1 instances each emit PARTIAL
    // LinkMetric counts for the windows they saw; a tier-2 instance with
    // `reduce: true` consumes those metric events and emits the exact
    // window totals. Here the process pipe is a parquet directory: two
    // tier-1 streaming pipelines (separate queries = separate "processes")
    // append their partials, tier-2 streams the directory back through
    // LinkMetric reduce and must land on byte-exact totals.
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = "/tmp/graft_tier1_out_" + System.nanoTime()
    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - LinkMetric: {fieldsLink: event_type, batchWindow: 60, reserveWindow: 120}
         |outputs:
         |  - Parquet: {path: $dir, mode: append}
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    def runTier1(data: Seq[(java.sql.Timestamp, String)]): Unit = {
      val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
      val src = mem.toDF().toDF("@timestamp", "event_type")
      val q = Planner.startForeachBatch(pipeline, pipeline.transform(src),
        checkpoint = Some("/tmp/graft_tier1_ckpt_" + System.nanoTime()))
      try {
        mem.addData(data: _*)
        q.processAllAvailable()
        // advance the watermark past the data window so the append-mode
        // aggregation finalizes and emits the partial
        mem.addData((ts("2024-01-01 02:00:00"), "zz"))
        q.processAllAvailable()
      } finally q.stop()
    }
    // two upstream instances see different slices of the SAME window
    runTier1(Seq((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"),
      (ts("2024-01-01 00:00:30"), "b")))
    runTier1(Seq((ts("2024-01-01 00:00:40"), "a"), (ts("2024-01-01 00:00:50"), "a"),
      (ts("2024-01-01 00:00:55"), "a")))
    // what's on disk is partials, not totals: two (window, "a") rows
    val partials = spark.read.parquet(dir)
    assert(partials.filter(col("event_type") === "a").count() == 2)

    val src2 = spark.readStream.schema(partials.schema).parquet(dir)
    val stage2 = Planner.filterStage("LinkMetric", Map(
      "fieldsLink" -> "event_type", "batchWindow" -> 60L, "reduce" -> true))
    val q2 = stage2(src2).writeStream.format("memory").queryName("tier2_reduce")
      .outputMode("update").start()
    try {
      q2.processAllAvailable()
      val totals = spark.sql("select * from tier2_reduce")
        .filter(col("`@timestamp`") === lit(ts("2024-01-01 00:00:00")))
        .collect()
        .map(r => r.getString(r.fieldIndex("event_type")) ->
          r.getLong(r.fieldIndex("count"))).toMap
      assert(totals == Map("a" -> 5L, "b" -> 1L),
        s"tier-2 reduce totals wrong: $totals")
    } finally q2.stop()
  }

  test("two-tier reduce over the TCP network path (live socket)") {
    // the reference's process-pipe topology (test/itest.sh:100-140) in its
    // NETWORK form: tier-1 instances ship their partial LinkMetric counts
    // as JSON lines over a TCP output to a tier-2 instance listening on
    // `graft-tcp` with `reduce: true` — same count-golden totals as the
    // parquet-pipe twin above, but through a real socket (serialize →
    // dial → accept → buffer → micro-batch → parse → merge).
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val port = { val s = new java.net.ServerSocket(0)
      val p = s.getLocalPort; s.close(); p }
    // tier-2 starts FIRST: the driver-side listener must be accepting
    // before tier-1's sink dials out
    val metricSchema = new org.apache.spark.sql.types.StructType()
      .add("@timestamp", org.apache.spark.sql.types.TimestampType)
      .add("event_type", org.apache.spark.sql.types.StringType)
      .add("count", org.apache.spark.sql.types.LongType)
    val src2 = spark.readStream.format("graft-tcp").option("port", port).load()
      .select(from_json(col("message"), metricSchema).as("m"))
      .select(col("m.`@timestamp`").as("@timestamp"),
        col("m.event_type").as("event_type"), col("m.count").as("count"))
    val stage2 = Planner.filterStage("LinkMetric", Map(
      "fieldsLink" -> "event_type", "batchWindow" -> 60L, "reduce" -> true))
    val q2 = stage2(src2).writeStream.format("memory")
      .queryName("tier2_tcp_reduce").outputMode("update").start()
    try {
      val yaml =
        s"""inputs:
           |  - Text: {path: unused}
           |filters:
           |  - LinkMetric: {fieldsLink: event_type, batchWindow: 60, reserveWindow: 120}
           |outputs:
           |  - TCP: {address: "127.0.0.1:$port"}
           |""".stripMargin
      val pipeline = Planner.fromYaml(yaml)
      def runTier1(data: Seq[(java.sql.Timestamp, String)]): Unit = {
        val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
        val src = mem.toDF().toDF("@timestamp", "event_type")
        val q = Planner.startForeachBatch(pipeline, pipeline.transform(src),
          checkpoint = Some("/tmp/graft_tier1tcp_ckpt_" + System.nanoTime()))
        try {
          mem.addData(data: _*)
          q.processAllAvailable()
          mem.addData((ts("2024-01-01 02:00:00"), "zz")) // watermark push
          q.processAllAvailable()
        } finally q.stop()
      }
      runTier1(Seq((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"),
        (ts("2024-01-01 00:00:30"), "b")))
      runTier1(Seq((ts("2024-01-01 00:00:40"), "a"), (ts("2024-01-01 00:00:50"), "a"),
        (ts("2024-01-01 00:00:55"), "a")))
      // socket delivery is asynchronous (accept thread → BoundedLog →
      // next micro-batch): poll to the golden totals instead of assuming
      // one processAllAvailable sees everything
      var totals = Map.empty[String, Long]
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (totals != Map("a" -> 5L, "b" -> 1L) && System.nanoTime() < deadline) {
        q2.processAllAvailable()
        totals = spark.sql("select * from tier2_tcp_reduce")
          .filter(col("`@timestamp`") === lit(ts("2024-01-01 00:00:00")))
          .collect()
          .map(r => r.getString(r.fieldIndex("event_type")) ->
            r.getLong(r.fieldIndex("count"))).toMap
        if (totals != Map("a" -> 5L, "b" -> 1L)) Thread.sleep(200)
      }
      assert(totals == Map("a" -> 5L, "b" -> 1L),
        s"tier-2 totals over the TCP path wrong: $totals")
    } finally q2.stop()
  }

  test("two-tier reduce merges partial STATS exactly (LinkStatsMetric)") {
    // stats twin of the count-golden test: tier-1 instances emit partial
    // count/sum/min/max/mean; tier-2 `reduce: true` must merge them to
    // the exact whole-window stats (mean re-derived from merged
    // count/sum, not averaged averages — the classic partial-merge bug)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = "/tmp/graft_tier1s_out_" + System.nanoTime()
    val yaml =
      s"""inputs:
         |  - Text: {path: unused}
         |filters:
         |  - LinkStatsMetric: {fieldsLink: 'event_type->value', batchWindow: 60, reserveWindow: 120}
         |outputs:
         |  - Parquet: {path: $dir, mode: append}
         |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    def runTier1(data: Seq[(java.sql.Timestamp, String, Double)]): Unit = {
      val mem = MemoryStream[(java.sql.Timestamp, String, Double)](spark)
      val src = mem.toDF().toDF("@timestamp", "event_type", "value")
      val q = Planner.startForeachBatch(pipeline, pipeline.transform(src),
        checkpoint = Some("/tmp/graft_tier1s_ckpt_" + System.nanoTime()))
      try {
        mem.addData(data: _*)
        q.processAllAvailable()
        mem.addData((ts("2024-01-01 02:00:00"), "zz", 0.0))
        q.processAllAvailable()
      } finally q.stop()
    }
    // instance A: values 10, 30 → count 2, sum 40, mean 20
    runTier1(Seq((ts("2024-01-01 00:00:10"), "a", 10.0),
      (ts("2024-01-01 00:00:20"), "a", 30.0)))
    // instance B: value 80 → count 1, sum 80, mean 80
    runTier1(Seq((ts("2024-01-01 00:00:40"), "a", 80.0)))

    val partials = spark.read.parquet(dir)
    assert(partials.filter(col("event_type") === "a").count() == 2)

    val src2 = spark.readStream.schema(partials.schema).parquet(dir)
    val stage2 = Planner.filterStage("LinkStatsMetric", Map(
      "fieldsLink" -> "event_type->value", "batchWindow" -> 60L, "reduce" -> true))
    val q2 = stage2(src2).writeStream.format("memory").queryName("tier2s_reduce")
      .outputMode("update").start()
    try {
      q2.processAllAvailable()
      val r = spark.sql("select * from tier2s_reduce")
        .filter(col("event_type") === "a").collect().head
      def d(c: String) = r.getDouble(r.fieldIndex(c))
      assert(r.getLong(r.fieldIndex("count")) == 3L)
      assert(d("sum") == 120.0 && d("min") == 10.0 && d("max") == 80.0)
      // exact global mean 40.0 — averaging the two partial means (20, 80)
      // would give 50 and fail here
      assert(d("mean") == 40.0)
    } finally q2.stop()
  }

  test("config scrub redacts secret-ish keys") {
    val scrubbed = PipelineConfig.scrub(Map(
      "bootstrap.servers" -> "k:9092",
      "sasl.password" -> "hunter2",
      "nested" -> Map("api_token" -> "abc", "topic" -> "t")))
    assert(scrubbed("sasl.password") == "***")
    assert(scrubbed("bootstrap.servers") == "k:9092")
    assert(scrubbed("nested").asInstanceOf[Map[String, Any]]("api_token") == "***")
    assert(scrubbed("nested").asInstanceOf[Map[String, Any]]("topic") == "t")
  }

  test("streaming LinkMetric via planner emits windowed counts in append mode") {
    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val src = mem.toDF().toDF("@timestamp", "event_type")
    val stage = Planner.filterStage("LinkMetric", Map(
      "fieldsLink" -> "event_type", "batchWindow" -> 60L, "reserveWindow" -> 120L))
    val out = stage(src)
    val q = out.writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((ts("2024-01-01 00:00:10"), "a"), (ts("2024-01-01 00:00:20"), "a"))
      q.processAllAvailable()
      // advance watermark far past the first window so it closes
      mem.addData((ts("2024-01-01 01:00:00"), "b"))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 02:00:00"), "b"))
      q.processAllAvailable()
      val rows = spark.sql("select * from lm_stream").collect()
      assert(rows.exists(r => r.getString(r.fieldIndex("event_type")) == "a" &&
        r.getLong(r.fieldIndex("count")) == 2L))
    } finally q.stop()
  }

  test("Sessionize stage: summary streams with watermark eviction; assign streams with keyed state") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val src = mem.toDF.toDF("uid", "t")
    val stage = Planner.filterStage("Sessionize", Map(
      "key" -> "uid", "timestamp" -> "t", "gap" -> 60L, "summary" -> true))
    val q = stage(src).writeStream.outputMode("append")
      .format("memory").queryName("sess_yaml").start()
    try {
      mem.addData((7L, ts("2024-01-01 00:00:10")), (7L, ts("2024-01-01 00:00:40")))
      q.processAllAvailable()
      mem.addData((7L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      mem.addData((7L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      val rows = spark.sql("select * from sess_yaml").collect()
      assert(rows.exists(r => r.getLong(r.fieldIndex("uid")) == 7L &&
        r.getLong(r.fieldIndex("n_events")) == 2L), rows.mkString("; "))
    } finally q.stop()

    // assign on a stream dispatches to the keyed-state form: per-event
    // session ids confirmed as the watermark passes, ACROSS batches
    val mem2 = MemoryStream[(Long, java.sql.Timestamp)]
    val assigned = Planner.filterStage("Sessionize", Map(
      "key" -> "uid", "timestamp" -> "t", "gap" -> 60L, "target" -> "sid"))(
      mem2.toDF.toDF("uid", "t"))
    assert(assigned.isStreaming)
    // schema parity with batch: configured names, key keeps its input
    // type, `target` honored (only the payload drop differs, documented)
    assert(assigned.columns.toSeq == Seq("uid", "t", "sid"))
    assert(assigned.schema("uid").dataType ==
      org.apache.spark.sql.types.LongType)
    val q2 = assigned.writeStream.outputMode("append")
      .format("memory").queryName("sess_assign_yaml").start()
    try {
      // session 1 spans two micro-batches; the gap to 02:00 starts
      // session 2 — a per-batch window could never see that
      mem2.addData((9L, ts("2024-01-01 00:00:10")))
      q2.processAllAvailable()
      mem2.addData((9L, ts("2024-01-01 00:00:40")))
      q2.processAllAvailable()
      mem2.addData((9L, ts("2024-01-01 02:00:00")))
      q2.processAllAvailable()
      mem2.addData((9L, ts("2024-01-01 03:00:00")))
      q2.processAllAvailable()
      val out = spark.table("sess_assign_yaml")
        .select("t", "sid").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(out == Map(
        "2024-01-01 00:00:10.0" -> 1L,
        "2024-01-01 00:00:40.0" -> 1L,
        "2024-01-01 02:00:00.0" -> 2L))
    } finally q2.stop()
  }

  test("EncodingArtifacts + DupLines score ON the stream: stream/batch " +
      "bit-parity, zero-exchange micro-batch") {
    // the two r15 stages claimed streaming-native narrow maps — pin it
    // like the curation prefix (r15 verdict task 7): a MemoryStream
    // round-trip must produce BIT-identical counts/fractions to the
    // same YAML over a batch frame, and the committed micro-batch plan
    // must be Exchange- and Join-free
    val yaml =
      """inputs:
        |  - Text: {path: unused}
        |filters:
        |  - EncodingArtifacts: {src: text}
        |  - DupLines: {src: text}
        |outputs:
        |  - Stdout: {}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    assert(Planner.streamingSplit(pipeline.stages)._2.isEmpty,
      "flag-mode scoring stages must stay on the stream side")
    val pool = Seq(
      (0L, "alpha beta\ngamma delta\nepsilon"),           // clean, no dups
      (1L, "repeat me\nrepeat me\nrepeat me\nunique"),    // 3 dup lines
      (2L, "bad \uFFFD decode \uFFFD here"),             // 2 replacement chars
      (3L, "caf\u00C3\u00A9 d\u00C3\u00A8ja"),         // 2 mojibake pairs
      (4L, "ctrl\u0001char\u0002line\nctrl\u0001char\u0002line"), // 4 C0 + dup
      (5L, ""))                                           // zero lines → NULL fracs
    val outCols = Seq("doc_id", "n_replacement", "n_mojibake", "n_ctrl",
      "n_lines", "n_dup_lines", "dup_line_frac", "dup_char_frac")

    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val transformed = pipeline.transform(src)
    assert(transformed.isStreaming,
      "scoring stages must build on the unbounded frame")
    val q = transformed.writeStream.format("memory")
      .queryName("enc_dl_parity").start()
    try {
      mem.addData(pool: _*)
      q.processAllAvailable()
      val streamed = spark.table("enc_dl_parity")
        .select(outCols.map(col): _*).collect().map(_.toSeq).toSet
      // BIT-PARITY: the same YAML stages over the same rows as a batch
      // frame — counts and the correctly-rounded divide fractions replay
      val batched = pipeline.transform(pool.toDF("doc_id", "text"))
        .select(outCols.map(col): _*).collect().map(_.toSeq).toSet
      assert(streamed.size == pool.size, s"lost rows: $streamed")
      assert(streamed == batched,
        s"stream/batch diverged: ${streamed.diff(batched)} vs ${
          batched.diff(streamed)}")
      // spot-check the planted signal actually varied (no vacuous parity)
      val byId = spark.table("enc_dl_parity")
        .select(outCols.map(col): _*).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(byId(2L).getLong(1) == 2L, "replacement chars uncounted")
      assert(byId(3L).getLong(2) == 2L, "mojibake pairs uncounted")
      assert(byId(4L).getLong(3) == 4L, "C0 controls uncounted")
      assert(byId(1L).getLong(5) == 3L, "dup lines uncounted")
      assert(byId(5L).isNullAt(6), "zero-line doc must carry NULL fracs")
      // ZERO-EXCHANGE: scoring at 100 TB/day ingest runs at receive
      // speed — the committed micro-batch plan is a narrow map
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(!exec.contains("Exchange"), s"scoring stages shuffle:\n$exec")
      assert(!exec.contains("Join"), s"scoring stages join:\n$exec")
    } finally q.stop()
  }

  test("EncodingArtifacts + DupLines drop modes filter live on the stream") {
    // drop mode on an unbounded frame: artifact docs and repetition-heavy
    // docs drop in-flight; the zero-line doc is KEPT (NULL fracs carry no
    // repetition evidence — the null-keep contract, pinned on a stream)
    val yaml =
      """inputs:
        |  - Text: {path: unused}
        |filters:
        |  - EncodingArtifacts: {src: text, mode: drop}
        |  - DupLines: {src: text, mode: drop}
        |outputs:
        |  - Stdout: {}
        |""".stripMargin
    val pipeline = Planner.fromYaml(yaml)
    val mem = MemoryStream[(Long, String)](spark)
    val transformed = pipeline.transform(mem.toDF().toDF("doc_id", "text"))
    val q = transformed.writeStream.format("memory")
      .queryName("enc_dl_drop").start()
    try {
      mem.addData(
        (0L, "alpha beta\ngamma delta\nepsilon"),        // survives both
        (1L, "dup\ndup\ndup\ndup"),                       // dup_line_frac 1.0
        (2L, "broken � text"),                       // replacement char
        (3L, ""))                                         // zero lines → kept
      q.processAllAvailable()
      val kept = spark.table("enc_dl_drop")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(0L, 3L), s"drop-mode stream kept $kept")
      // drop mode preserves the input schema on the stream too
      assert(spark.table("enc_dl_drop").columns.toSeq == Seq("doc_id", "text"))
    } finally q.stop()
  }

  test("AsOfJoin stage rejects streaming input with a pointer to the temporal store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val src = mem.toDF.toDF("uid", "t")
    val stage = Planner.filterStage("AsOfJoin", Map(
      "right" -> Map[String, Any]("input" -> "Parquet", "path" -> "/nonexistent"),
      "keys" -> Seq("uid"), "timestamp" -> "t"))
    val err = intercept[RuntimeException](stage(src))
    assert(err.getMessage.contains("foreachBatch"))
  }
}
