package graft

import org.apache.spark.sql.functions._

/** Mutation tests for the self-checking q_compression_ratio gate (r14
  * verdict task 3): the gate has no DuckDB oracle (no deflate), so its
  * Spark-side invariants are the ONLY regression guard — prove each one
  * actually fires on a seeded perturbation, and that the real gate
  * output passes clean. */
class CompressionGateSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, java.lang.Double)]) =
    rows.toDF("doc_id", "text", "compression_ratio")

  private val good = Seq[(Long, String, java.lang.Double)](
    (1L, "the quick brown fox jumps over the lazy dog", 0.62),
    (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", 0.11),
    (3L, null, null),
    (4L, "mixed entropy text with some repetition repetition", 0.55))

  test("the real gate output passes its own invariants at sf0.001") {
    val out = SparkEntry.queries("q_compression_ratio")(
      spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq == Seq("doc_id", "compression_ratio"))
    assert(out.count() > 0)
  }

  test("a clean synthetic frame passes") {
    val out = SparkEntry.checkCompressionGate(frame(good), expectedRows = 4L)
    assert(out.count() == 4L)
  }

  test("mutation: dropped rows fail the count pin") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.checkCompressionGate(frame(good.take(3)), expectedRows = 4L)
    }
    assert(e.getMessage.contains("expected 4"))
  }

  test("mutation: a non-null text scoring null fails") {
    val mutated = frame(good)
      .withColumn("compression_ratio",
        when(col("doc_id") === 1L, lit(null)).otherwise(col("compression_ratio")))
    val e = intercept[IllegalArgumentException] {
      SparkEntry.checkCompressionGate(mutated, expectedRows = 4L)
    }
    assert(e.getMessage.contains("scored null"))
  }

  test("mutation: zero / negative / over-band ratios fail the length-aware band") {
    // doc 2's text is 42 bytes → bound = 1 + 16/42 ≈ 1.38
    for (bad <- Seq(0.0, -0.3, 1.5)) {
      val mutated = frame(good).withColumn("compression_ratio",
        when(col("doc_id") === 2L, lit(bad)).otherwise(col("compression_ratio")))
      val e = intercept[IllegalArgumentException] {
        SparkEntry.checkCompressionGate(mutated, expectedRows = 4L)
      }
      assert(e.getMessage.contains("outside"), s"bad=$bad")
    }
  }

  test("tiny inputs may legitimately exceed 1.0 (deflate header dominates)") {
    // the hostile-fixture regression: a 3-byte doc deflates to ~11 bytes
    // (ratio ~3.7) and must PASS the length-aware per-row band, while
    // the corpus mean stays anchored by the normal-length majority
    val filler = (10L until 20L).map(i =>
      (i, s"normal length document number $i with plain words",
        java.lang.Double.valueOf(0.5)))
    val tiny = frame(good ++ filler :+
      ((5L, "tok", java.lang.Double.valueOf(11.0 / 3.0))))
    assert(SparkEntry.checkCompressionGate(tiny, expectedRows = 15L)
      .count() == 15L)
  }

  test("mutation: a kernel that stops compressing (all ratios ~1.0) fails the mean band") {
    // per-row band can't see this (1.0 is individually legal — an
    // incompressible doc); the corpus mean can
    val mutated = frame(good).withColumn("compression_ratio",
      when(col("text").isNotNull, lit(1.0)).otherwise(lit(null)))
    val e = intercept[IllegalArgumentException] {
      SparkEntry.checkCompressionGate(mutated, expectedRows = 4L)
    }
    assert(e.getMessage.contains("mean"))
  }
}
