package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Gate-layer mutation audit, round 10: the r17 additions. Same contract
  * as rounds 1-9 (seed one plausible bug, assert the driver-canonical
  * compare differs). Fixture variance was DuckDB-probed before authoring
  * (the r15 discipline): at sf0.01 the degree fixture has 58 in-nodes
  * with degrees 1..100 and a FRACTIONALLY interpolating p99 (89.17
  * cont vs 100 disc), so both seeded bugs below move published values. */
class OracleMutation9Spec extends SparkSpec with MutationAudit {

  /** The q_graph_degrees fixture, verbatim. */
  private def degreeEdges: DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val src = concat(lit("h"), (col("doc_id") % 37).cast("string"))
    docs.select(src.as("src"),
        concat(lit("h"), ((col("doc_id") % 11) * (col("doc_id") % 13))
          .cast("string")).as("dst"))
      .union(docs.filter(col("doc_id") % 5 === 0)
        .select(src.as("src"), lit("hub").as("dst")))
  }

  private def mutatedStats(edges: DataFrame,
      p99: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      hubDenom: String): DataFrame = {
    def side(name: String, key: String): DataFrame =
      edges.groupBy(col(key).as("node")).agg(count(lit(1)).as("deg"))
        .agg(count(lit(1)).as("n_nodes"), sum("deg").as("n_edges"),
          max("deg").as("max_degree"),
          percentile(col("deg"), lit(0.5)).as("p50_degree"),
          percentile(col("deg"), lit(0.9)).as("p90_degree"),
          p99(col("deg")).as("p99_degree"))
        .select(lit(name).as("side"), col("n_nodes"), col("n_edges"),
          col("max_degree"), col("p50_degree"), col("p90_degree"),
          col("p99_degree"),
          (col("max_degree") / col(hubDenom)).cast("double").as("hub_share"))
    side("out", "src").unionByName(side("in", "dst"))
  }

  test("q_graph_degrees: a discrete-for-continuous percentile estimator " +
      "moves the interpolating p99") {
    // percentile_approx with accuracy >> group size IS quantile_disc
    // (the recorded r15 fact) — the classic "approx is close enough"
    // swap reads 100 where the exact lerp reads 89.17
    assertCaught("q_graph_degrees") {
      mutatedStats(degreeEdges,
        d => percentile_approx(d, lit(0.99), lit(1000000)).cast("double"),
        hubDenom = "n_edges")
    }
  }

  test("q_graph_degrees: deduplicating edges before counting collapses " +
      "every multiplicity") {
    // the fixture is multiplicity-rich by construction (residue classes
    // repeat): a 'distinct edges first' bug flattens degrees toward 1
    assertCaught("q_graph_degrees") {
      mutatedStats(degreeEdges.distinct(),
        d => percentile(d, lit(0.99)), hubDenom = "n_edges")
    }
  }

  test("q_graph_degrees: hub_share over n_nodes instead of n_edges") {
    assertCaught("q_graph_degrees") {
      mutatedStats(degreeEdges,
        d => percentile(d, lit(0.99)), hubDenom = "n_nodes")
    }
  }
}
