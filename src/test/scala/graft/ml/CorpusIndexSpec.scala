package graft.ml

import graft.SparkSpec

class CorpusIndexSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff classifies added / removed / changed") {
    val old = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("doc_id", "text")
    val neu = Seq((0L, "alpha"), (1L, "beta CHANGED"), (3L, "delta"))
      .toDF("doc_id", "text")
    val out = DatasetOps.corpusDiff(old, neu, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 2L -> "removed", 3L -> "added"))
  }

  test("corpusDiff includeUnchanged emits the full audit") {
    val old = Seq((0L, "same")).toDF("doc_id", "text")
    val neu = Seq((0L, "same"), (1L, "new")).toDF("doc_id", "text")
    val out = DatasetOps.corpusDiff(old, neu, "doc_id", "text",
        includeUnchanged = true)
      .as[(Long, String)].collect().toMap
    assert(out == Map(0L -> "unchanged", 1L -> "added"))
  }

  test("corpusDiff of identical corpora is empty") {
    val docs = Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text")
    assert(DatasetOps.corpusDiff(docs, docs, "doc_id", "text").count() == 0L)
  }

  test("invertedIndex: df over all postings, rank bounded, minDf filter") {
    val docs = Seq(
      (10L, "the cat"),
      (11L, "the dog"),
      (12L, "the the cat"),  // repeated token counts once per doc
      (13L, "bird")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "text", "doc_id",
        minDf = 2L, maxPostings = 2)
      .as[(String, Long, Int, Long)].collect().toSet
    // 'the' df=3 but postings cut to rank<=2; 'cat' df=2; 'dog','bird' df<2
    assert(out == Set(
      ("the", 3L, 1, 10L), ("the", 3L, 2, 11L),
      ("cat", 2L, 1, 10L), ("cat", 2L, 2, 12L)))
  }

  test("invertedIndex: case folding and the bounded stop-word contract") {
    val docs = (0L until 50L).map(i => (i, s"Common word$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, "text", "doc_id",
      minDf = 1L, maxPostings = 5)
    val common = out.filter($"token" === "common")
      .as[(String, Long, Int, Long)].collect()
    // df still counts all 50 docs; the posting list stops at 5
    assert(common.length == 5)
    assert(common.forall(_._2 == 50L))
    assert(common.map(_._4).toSeq.sorted == (0L until 5L))
    intercept[IllegalArgumentException] {
      TextAnalysis.invertedIndex(docs, "text", "doc_id", 1L, 0)
    }
  }
}
