package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("nfc composes combining sequences and singletons") {
    // e + COMBINING ACUTE -> é; A + COMBINING RING -> Å; ANGSTROM SIGN -> Å
    val out = Seq("é", "Å", "Å", "plain ascii")
      .toDF("s").select(NormalizeFns.nfc($"s").as("n")).as[String].collect()
    assert(out(0) == "é" && out(1) == "Å" && out(2) == "Å")
    assert(out(3) == "plain ascii")
  }

  test("nfd decomposes; nfkc folds compatibility forms; nfkd does both") {
    val row = Seq(("é", "ﬁ Ａ ①")).toDF("a", "b")
      .select(NormalizeFns.nfd($"a").as("d"), NormalizeFns.nfkc($"b").as("kc"),
        NormalizeFns.nfkd($"b").as("kd"))
      .head()
    assert(row.getString(0) == "é")
    // LATIN SMALL LIGATURE FI -> fi, FULLWIDTH A -> A, CIRCLED DIGIT ONE -> 1
    assert(row.getString(1) == "fi A 1")
    assert(row.getString(2) == "fi A 1")
  }

  test("null propagates; invalid form rejected at construction") {
    val out = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(NormalizeFns.nfc($"s")).collect()
    assert(out(0).isNullAt(0) && out(1).getString(0) == "x")
    intercept[IllegalArgumentException] {
      UnicodeNormalizeExpr(org.apache.spark.sql.graftbridge.Bridge.expression(lit("x")), "NFX")
    }
  }

  test("already-normalized input takes the zero-copy fast path") {
    import org.apache.spark.unsafe.types.UTF8String
    val in = UTF8String.fromString("pure ascii stays itself")
    assert(NormalizeFns.normalizeKernel(in, "NFC") eq in)
    val composed = UTF8String.fromString("café")
    assert(NormalizeFns.normalizeKernel(composed, "NFC") eq composed)
  }

  test("unicode_normalize is callable from SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    // NB: Spark's chr() is ASCII-only (n % 256), so embed the combining
    // acute directly in the SQL text
    val got = spark.sql("SELECT unicode_normalize('é', 'NFC') AS n")
      .as[String].head()
    assert(got == "é")
    // arity and form errors surface as analysis-time failures, not per-row
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NOPE')").collect()
    }
  }
}
