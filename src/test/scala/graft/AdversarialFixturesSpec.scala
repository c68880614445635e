package graft

import org.apache.spark.sql.functions._

/** Hostile-input sweep over the ENTIRE driver query table (FIXTURES.md
  * §adversarial): the sf0.001 tables plus rows the generator never
  * emits — empty docs, single-token docs, unicode-whitespace-only text,
  * null text, duplicate ids, zero and null embedding vectors, malformed
  * event props. Every `SparkEntry.queries` entry must still EXECUTE
  * (no analysis error, no runtime throw, no NaN-driven crash) — value
  * agreement stays the DuckDB gate's job on the pristine tables; this
  * spec guards the operators' null/degenerate paths, which five rounds
  * of clean fixtures never exercised. */
class AdversarialFixturesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_hostile").toString
    val src = "/root/testdata/sf0.001"
    // unchanged TPC-H side: byte-copy the parquet files
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$d/$t.parquet"))

    val docs = core.Tables.load(spark, src, "documents")
    val hostileDocs = Seq(
      (900001L, "", "en", "hostile", 0L),                         // empty
      (900002L, "tok", "en", "hostile", 3L),                      // one token
      (900003L, "\u00a0\u2003\t \n\u200b", "en", "hostile", 6L), // unicode ws
      (900004L, null.asInstanceOf[String], "en", "hostile", 0L),  // null text
      (900005L, "duplicate id first body", "en", "hostile", 23L), // dup id ↓
      (900005L, "duplicate id second body", "en", "hostile", 24L),
      (900006L, ("spam " * 2000).trim, "en", "hostile", 9999L))   // degenerate repeat
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(hostileDocs).write.parquet(s"$d/documents.parquet")

    val emb = core.Tables.load(spark, src, "embeddings")
    val hostileEmb = Seq(
      (910001L, Array.fill(64)(0.0f), 0),                  // zero vector
      (910002L, null.asInstanceOf[Array[Float]], 0),       // null vector
      (910003L, Array.fill(64)(1.0f), 1),                  // dup id ↓
      (910003L, Array.fill(64)(-1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    emb.unionByName(hostileEmb).write.parquet(s"$d/embeddings.parquet")

    // events round-trips through the nanos-long shape Tables.load expects
    val ev = core.Tables.load(spark, src, "events")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
    val hostileEv = Seq(
      (920001L, 0L, 7L, null.asInstanceOf[String], 0.0, "{"),       // broken json
      (920002L, 1L, 7L, "", Double.NaN, ""),                        // empty + NaN
      (920003L, 2L, 7L, "click", 1.0, null.asInstanceOf[String]))   // null props
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.unionByName(hostileEv).write.parquet(s"$d/events.parquet")
    d
  }

  for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"$name survives hostile fixtures") {
      val n = q(spark, dir).count()
      assert(n >= 0L) // executed end-to-end without throwing
    }

  test("dedup transforms on hostile fixtures keep output within the input id set") {
    import org.apache.spark.sql.functions._
    val docs = core.Tables.load(spark, dir, "documents")
    val docIds = docs.select("doc_id").as[Long].collect().toSet
    val nDocs = docs.count()
    for ((label, out) <- Seq(
      "hamming drop" -> ml.Dedup.dropDuplicatesHamming64(docs, "text", "doc_id"),
      "exact drop" -> ml.Dedup.dropDuplicatesExact(docs, "text", "doc_id"),
      "line dedup" -> ml.Dedup.removeBoilerplateLines(docs, "text", "doc_id"))) {
      val ids = out.select(col("doc_id").cast("long")).as[Long].collect()
      assert(ids.toSet.subsetOf(docIds), s"$label emitted ids outside the input")
      assert(ids.length <= nDocs, s"$label grew the corpus")
    }
    // a row-preserving transform must keep exact cardinality even over
    // null/empty/unicode-ws text
    assert(ml.TextAnalysis.profile(docs, "text").count() == nDocs)
    val emb = core.Tables.load(spark, dir, "embeddings")
    val vecIds = emb.select("vec_id").as[Long].collect().toSet
    val sem = ml.Similarity.semanticDedup(emb, "embedding", "vec_id")
      .select("vec_id").as[Long].collect()
    assert(sem.toSet.subsetOf(vecIds) && sem.length <= emb.count())
  }
}
