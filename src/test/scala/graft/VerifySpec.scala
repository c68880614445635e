package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The gate-loss guard: a Verify run must leave, for EVERY declared
  * query, either an output directory or an errors.json entry — never a
  * silent omission (r8/r9 shipped 16 analysis-broken gates invisibly
  * because failures only went to stderr). */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  test("runQueries dumps good queries and records broken ones in errors.json") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "good_query" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }),
      "analysis_broken" -> ((s, _) =>
        s.range(3).selectExpr("id div timestamp_micros(id)")), // DATATYPE_MISMATCH
      "runtime_broken" -> ((_, _) => sys.error("boom at plan build")))
    val errors = Verify.runQueries(spark, "/unused", out, queries)

    assert(new java.io.File(s"$out/good_query").isDirectory)
    assert(!new java.io.File(s"$out/analysis_broken").exists ||
      !new java.io.File(s"$out/analysis_broken/_SUCCESS").exists)
    assert(errors.keySet == Set("analysis_broken", "runtime_broken"))
    assert(errors("runtime_broken").contains("boom"))

    // errors.json exists, is valid JSON-shaped, and names exactly the broken set
    val errFile = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/errors.json")), "UTF-8")
    assert(errFile.startsWith("{") && errFile.endsWith("}"))
    assert(errFile.contains("\"analysis_broken\"") && errFile.contains("\"runtime_broken\""))
    assert(!errFile.contains("good_query"))
  }

  test("runQueries writes an EMPTY errors.json when all queries pass") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-spec2").toString
    val errors = Verify.runQueries(spark, "/unused", out,
      Map("only" -> ((s, _) => { import s.implicits._; Seq("a").toDF("v") })))
    assert(errors.isEmpty)
    val errFile = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/errors.json")), "UTF-8")
    assert(errFile == "{}")
  }

  test("every declared query has an oracle, and vice versa") {
    // the driver compares oracle_sql keys against dump dirs — a queries
    // entry without an oracle silently downgrades to a rows-only check,
    // and an oracle without a query FAILs on a missing dir. Keep the two
    // maps in lockstep so neither drift mode can start. Exceptions are
    // EXPLICIT: each rows-only gate here must document at its queries
    // entry why no SQL oracle can exist, and its values must be
    // spec-pinned elsewhere.
    val rowsOnly = Set(
      "q_compression_ratio") // DuckDB has no deflate; CompressFnsSpec pins values
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- rowsOnly == SparkEntry.oracleSql.keySet)
    assert((SparkEntry.oracleSql.keySet & rowsOnly).isEmpty,
      "a rows-only gate grew an oracle — remove it from the allowlist")
  }
}
