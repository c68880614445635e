package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: null text, empty frames, unicode — the
  * shapes a 100 TB corpus WILL contain somewhere. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  lazy val messy = Seq(
    (1L, "normal words here repeated words here"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "     "),
    (5L, "中文 文本 処理 emoji 🙂 mixed ascii"),
  ).toDF("doc_id", "text")

  test("minhash pairs: null/empty/whitespace docs don't crash or pair") {
    val pairs = Dedup.minhashPairs(messy, "text", "doc_id", threshold = 0.5)
    val ids = pairs.select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(!ids.contains(2L)) // null text never pairs
  }

  test("simhash groups handle null and unicode") {
    val out = Dedup.simhashGroups(messy, "text", "doc_id")
    assert(out.agg(sum("cnt")).as[Long].head() == 5L) // every doc lands somewhere
  }

  test("simhash hamming pairs run on messy input") {
    Dedup.simhashHammingPairs(messy, "text", "doc_id").count() // no crash
  }

  test("exact dedup keeps ALL null-text rows (nulls are not duplicates of each other)") {
    // md5(null) is null and the window grouped every null-text row into
    // one partition, silently keeping one — diverging from the hamming
    // and seen-store paths whose null contracts keep them all (r14 fix)
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("same")), (4L, Some("same"))).toDF("doc_id", "text")
    val kept = Dedup.dropDuplicatesExact(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), s"got $kept")
  }

  test("empty input frames flow through every dedup operator") {
    val empty = messy.limit(0)
    assert(Dedup.minhashPairs(empty, "text", "doc_id").count() == 0)
    assert(Dedup.exact(empty, "text", "doc_id").count() == 0)
    assert(Dedup.simhashGroups(empty, "text", "doc_id").count() == 0)
    assert(Dedup.ngramJaccardPairs(empty.withColumn("blk", lit("x")),
      "text", "doc_id", "blk").count() == 0)
    assert(Dedup.clusters(
      Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")).count() == 0)
  }

  test("script profile: null text reads as zero counts, dominant 'none'") {
    // the public API must hold the same NULL contract as the Planner
    // ScriptProfile stage (r16 ADVICE): a NULL doc is an empty doc, not
    // a NULL/-1 count row with a misleading dominant label
    val out = TextAnalysis.scriptProfile(messy, "text", "doc_id")
    assert(out.count() == 5)
    val nullRow = out.filter(col("doc_id") === 2L).collect().head
    Seq("n_latin", "n_cjk", "n_cyrillic", "n_arabic").foreach { c =>
      assert(!nullRow.isNullAt(nullRow.fieldIndex(c)), c)
      assert(nullRow.getLong(nullRow.fieldIndex(c)) == 0L, c)
    }
    assert(nullRow.getString(nullRow.fieldIndex("dominant_foreign")) == "none")
  }

  test("text profile survives null and empty docs") {
    val out = TextAnalysis.profile(messy, "text")
    assert(out.count() == 5)
    val unicodeRow = out.filter(col("doc_id") === 5L).collect().head
    assert(unicodeRow.getInt(unicodeRow.fieldIndex("n_tokens")) == 7)
  }

  test("round-3 operators survive messy and empty input") {
    val empty = messy.limit(0)
    // decontaminate: empty contamination set keeps everything (incl. null)
    assert(Dedup.decontaminate(messy, empty, "text", "doc_id").count() == 5)
    // null/empty docs share the degenerate clipped shingle with each
    // other but must not crash; a null-text contamination row is inert
    Dedup.decontaminate(messy, messy.filter($"doc_id" === 2L), "text", "doc_id").count()
    assert(Dedup.decontaminate(empty, messy, "text", "doc_id").count() == 0)
    // simhash64 hamming + fingerprint on messy input
    Dedup.simhashHammingPairs64(messy, "text", "doc_id").count()
    // tf-idf: null text contributes no tokens, empty corpus yields empty
    val tfidf = TextAnalysis.topTfidfTerms(messy, "text", "doc_id", k = 2)
    assert(!tfidf.select("id").as[Long].collect().contains(2L))
    assert(TextAnalysis.topTfidfTerms(empty, "text", "doc_id").count() == 0)
    // repetition: every doc keeps a row; null/empty score 0
    val rep = TextAnalysis.repetitionStats(messy, "text", "doc_id")
    assert(rep.count() == 5)
    val nullRow = rep.filter(col("doc_id") === 2L).collect().head
    assert(nullRow.getDouble(1) == 0.0 && nullRow.getDouble(2) == 0.0)
    // PII scrub passes null through
    val scrubbed = messy.select(TextAnalysis.scrubPii($"text")).collect()
    assert(scrubbed(1).isNullAt(0))
  }

  test("stripHtml: blocks vanish with content, tags become spaces, entities decode once") {
    val rows = Seq(
      "<p>Hello <b>world</b></p>",
      "<script>alert('x')</script>keep<style>a{}</style>",
      "A &amp; B &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
      "&amp;lt;double&amp;gt;",            // double-encoded: decodes ONCE
      "<SCRIPT TYPE='x'>UPPER.case()</ScRiPt>done",
      "no markup at all",
      "")
      .toDF("text").select(TextAnalysis.stripHtml(col("text")).as("c"))
      .as[String].collect()
    assert(rows(0) == "Hello world")
    assert(rows(1) == "keep")
    assert(rows(2) == "A & B <c> \"d\" 'e' f")
    assert(rows(3) == "&lt;double&gt;")
    assert(rows(4) == "done")
    assert(rows(5) == "no markup at all")
    assert(rows(6) == "")
    // null propagates, never throws
    val n = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.stripHtml(col("text"))).collect()
    assert(n(0).isNullAt(0))
  }
}
