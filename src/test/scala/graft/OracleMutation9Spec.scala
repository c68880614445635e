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

  /** The q_minhash_calibration fixture's pair frame, verbatim. */
  private def calibrationPairs: DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = split(col("text"), """\s+""")
    val start = (floor(size(toks) * (col("doc_id") % 5) / 10) + 1).cast("int")
    docs.select(col("text").as("text_a"),
      array_join(slice(toks, start, size(toks)), " ").as("text_b"))
  }

  private def mutatedCalibration(permOffset: Int,
      band: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      subtractInter: Boolean): DataFrame = {
    def hs(c: org.apache.spark.sql.Column) =
      array_distinct(transform(graft.ml.Dedup.shingles(c, 3),
        s => conv(substring(md5(s), 25, 8), 16, 10).cast("long")))
    val hashed = calibrationPairs
      .select(hs(col("text_a")).as("hsA"), hs(col("text_b")).as("hsB"))
      .filter(size(col("hsA")) > 0 && size(col("hsB")) > 0)
      .repartition()
    def sig(h: String) = array((0 until 16).map { k0 =>
      val k = k0 + permOffset
      array_min(transform(col(h),
        v => (v * lit(1000003L + 2L * k) + lit(12289L * k + 1L)) %
          lit(4294967296L)))
    }: _*)
    val inter = size(array_intersect(col("hsA"), col("hsB"))).cast("long")
    val uni =
      if (subtractInter)
        size(col("hsA")) + size(col("hsB")) -
          size(array_intersect(col("hsA"), col("hsB")))
      else size(col("hsA")) + size(col("hsB"))
    hashed
      .select(col("hsA"), col("hsB"), sig("hsA").as("sigA"), sig("hsB").as("sigB"))
      .select(
        aggregate(zip_with(col("sigA"), col("sigB"),
            (a, b) => when(a === b, 1).otherwise(0)), lit(0), _ + _)
          .cast("long").as("matches"),
        band(lit(10) * inter / uni).cast("long").as("jacc_band"))
      .groupBy("matches", "jacc_band").agg(count(lit(1)).as("n_pairs"))
  }

  test("q_minhash_calibration: an off-by-one permutation family shifts " +
      "the match counts") {
    // the estimator column is only meaningful if the signatures are THE
    // ones minhashPairs/minhashBandStats use — perms k=1..16 instead of
    // 0..15 is the classic indexing slip
    assertCaught("q_minhash_calibration") {
      mutatedCalibration(permOffset = 1, band = floor, subtractInter = true)
    }
  }

  test("q_minhash_calibration: rounding the decile band instead of " +
      "flooring moves fractional pairs") {
    assertCaught("q_minhash_calibration") {
      mutatedCalibration(permOffset = 0, band = round(_, 0),
        subtractInter = true)
    }
  }

  test("q_minhash_calibration: union without subtracting the " +
      "intersection deflates every band") {
    assertCaught("q_minhash_calibration") {
      mutatedCalibration(permOffset = 0, band = floor, subtractInter = false)
    }
  }
}
