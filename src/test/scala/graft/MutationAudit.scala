package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared contract of the gate-layer mutation audit (OracleMutationSpec
  * and rounds 4-8): render a frame in the driver's canonical compare
  * form and assert a seeded single-bug re-derivation of a shipped gate
  * is distinguishable from it. */
trait MutationAudit { self: SparkSpec =>

  protected val dir = "/root/testdata/sf0.01"

  /** The driver's canonical form: columns sorted by name, rows sorted,
    * exact (string-rendered) values. Distinct doubles render distinctly
    * (Java shortest-round-trip), so string inequality == hash mismatch. */
  protected def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(c => col(s"`$c`")): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  protected def assertCaught(gate: String)(mutated: => DataFrame): Unit = {
    val orig = canon(SparkEntry.queries(gate)(spark, dir))
    val mut = canon(mutated)
    assert(orig != mut,
      s"$gate: the seeded bug produced IDENTICAL output — the fixture " +
        "does not exercise the mutated path, so the oracle could never " +
        "catch this regression")
  }
}
