package graft.ml

import graft.SparkSpec

class VocabularyNoveltySpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary counts, filters by minCount, ranks count-desc then token") {
    val docs = Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "THE dog ran"),     // lowercased: 'the' counts 3
      (3L, "zebra")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(docs, "text", minCount = 2, topN = 10)
      .as[(String, Long, Int)].collect().toSeq
    // the:3, then cat:2/ran:2 tied -> lexicographic
    assert(out == Seq(("the", 3L, 1), ("cat", 2L, 2), ("ran", 2L, 3)))
  }

  test("vocabulary topN cuts after ranking") {
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(docs, "text", minCount = 1, topN = 2)
      .as[(String, Long, Int)].collect().toSeq
    assert(out == Seq(("a", 3L, 1), ("b", 2L, 2)))
  }

  test("ngramNovelty: seen fraction, unseen docs, and short docs") {
    val ref = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "alpha beta gamma delta"),        // both 3-grams seen -> 0.0
      (1L, "one two three four"),            // nothing seen -> 1.0
      (2L, "alpha beta gamma nine ten"),     // 1 of 3 grams seen -> 2/3
      (3L, "too short")).toDF("doc_id", "text") // < n tokens -> no grams
    val out = TextAnalysis.ngramNovelty(docs, ref, "text", "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == ((2L, 0.0)))
    assert(out(1L) == ((2L, 1.0)))
    assert(out(2L) == ((3L, 2.0 / 3.0)))
    assert(out(3L) == ((0L, 1.0))) // emitted, novelty defaults high
    assert(out.size == 4)          // every doc present, even gram-free ones
  }

  test("unicode mode splits NBSP-joined tokens; default keeps the \\s+ contract") {
    val nbsp = " "
    val docs = Seq((0L, s"alpha${nbsp}beta alpha")).toDF("doc_id", "text")
    // default: "alpha beta" is ONE token (oracle-reproducible \s+)
    val plain = TextAnalysis.vocabulary(docs, "text", minCount = 1, topN = 10)
      .as[(String, Long, Int)].collect().map(_._1).toSet
    assert(plain == Set(s"alpha${nbsp}beta", "alpha"))
    // unicode: NBSP splits like a blank — the multilingual-corpus mode
    val uni = TextAnalysis.vocabulary(docs, "text", minCount = 1, topN = 10,
        unicode = true)
      .as[(String, Long, Int)].collect().map(t => t._1 -> t._2).toMap
    assert(uni == Map("alpha" -> 2L, "beta" -> 1L))
  }

  test("vocab store: increments merge by sum; compaction folds partials") {
    val store = java.nio.file.Files
      .createTempDirectory("vocab-store").toString + "/v"
    val run1 = Seq((0L, "alpha beta alpha")).toDF("doc_id", "text")
    val run2 = Seq((1L, "alpha gamma")).toDF("doc_id", "text")
    assert(TextAnalysis.appendToVocabStore(run1, "text", store) == 2L)
    assert(TextAnalysis.appendToVocabStore(run2, "text", store) == 2L)
    def merged = TextAnalysis.readVocabStore(spark, store)
      .as[(String, Long)].collect().toMap
    assert(merged == Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L))
    // compaction folds the partial files but never the counts
    val before = graft.ml.Dedup.storeDataFiles(spark, store).size
    TextAnalysis.compactVocabStore(spark, store, targetFiles = 1)
    assert(graft.ml.Dedup.storeDataFiles(spark, store).size < before)
    assert(merged == Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 1L))
    // a replayed append DOUBLE-COUNTS (counts merge, unlike the
    // anti-joined seen stores) — the documented reason the YAML stage
    // defers appends to the PostCommit hook
    TextAnalysis.appendToVocabStore(run2, "text", store)
    assert(merged("alpha") == 4L)
    // ranked view over store + a not-yet-appended increment
    val v = TextAnalysis.vocabularyFromStore(spark, store, 1L, 10,
        increment = Some(Seq((2L, "beta")).toDF("doc_id", "text")))
      .as[(String, Long, Int)].collect().toSeq
    assert(v.head == (("alpha", 4L, 1)))
    val vCounts = v.map(t => t._1 -> t._2).toMap
    assert(vCounts("beta") == 2L)
    // absent store reads empty, ranks only the increment
    val fresh = TextAnalysis.vocabularyFromStore(spark, store + "-none", 1L,
        10, increment = Some(run1)).as[(String, Long, Int)].collect()
    assert(fresh.map(t => t._1 -> t._2).toMap == Map("alpha" -> 2L, "beta" -> 1L))
  }

  test("ngramNovelty dedups grams within a doc before scoring") {
    val ref = Seq((0L, "x y z")).toDF("doc_id", "text")
    // 'x y z' appears twice but counts once among the doc's DISTINCT grams
    val docs = Seq((1L, "x y z x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, ref, "text", "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().head
    // distinct grams: "x y z", "y z x", "z x y" -> 1 seen of 3
    assert(out == ((1L, 3L, 2.0 / 3.0)))
  }
}
