package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl link-graph analysis: outlink extraction → host-level graph →
  * fixed-point PageRank. This is the artifact large crawl pipelines
  * actually publish and consume (CommonCrawl's host webgraph + rank
  * feeds crawl-frontier prioritization and quality priors for
  * training-data curation).
  *
  * Determinism as a design constraint: PageRank here runs in SCALED
  * INTEGER arithmetic (rank × 10^scaleDigits as LONG, floor division),
  * not doubles. Floating-point PageRank accumulates different
  * last-bit sums under different partition counts / reduce orders —
  * the same corpus ranks differently on a 10-node vs 1000-node
  * cluster. Integer addition is associative: this form is
  * bit-reproducible at ANY scale, and exactly replayable by the
  * DuckDB oracle (`//`). Precision 10^-12 dwarfs PageRank's own
  * iteration error.
  */
object LinkGraph {

  /** href outlinks of an HTML column, exploded: (idCol, dst_url).
    * Fragment-only and empty hrefs never emit. Pure per-row projection +
    * explode — no shuffle, scan speed at any corpus size. */
  def extractOutlinks(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(s"`$idCol`"),
        explode(regexp_extract_all(col(s"`$textCol`"),
          lit("""(?i)href\s*=\s*["']([^"'#]+)"""), lit(1))).as("dst_url"))
      .filter(length(col("dst_url")) > 0)

  /** Lowercased host of an absolute http(s) URL; null otherwise (relative
    * links carry no host — host-graph callers drop them). */
  def host(u: Column): Column = {
    val h = regexp_extract(lower(u), "^https?://([^/:?#]+)", 1)
    when(h === "", lit(null)).otherwise(h)
  }

  /** Host-level edge list with multiplicities: (src_host, dst_host,
    * n_links). Self-loops and non-absolute links are dropped. One
    * shuffle, keyed by the host pair — the web's host graph is ~10^8
    * edges from a 10^11-page crawl, a plain hash aggregation. */
  def hostGraph(links: DataFrame, srcUrlCol: String, dstUrlCol: String): DataFrame =
    links.select(host(col(s"`$srcUrlCol`")).as("src_host"),
        host(col(s"`$dstUrlCol`")).as("dst_host"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("n_links"))

  /** Fixed-point PageRank over an edge list: returns (node, rank_scaled)
    * where rank_scaled = rank × 10^scaleDigits (LONG). Init rank 1.0 per
    * node; per iteration every node gets `(100-dampingPct)/100` base plus
    * `dampingPct/100` of the summed in-contributions, each source
    * splitting its rank equally over its distinct out-edges (floor
    * division; dangling mass is dropped, the usual simplification).
    *
    * Overflow headroom: the largest intermediate is ~total scaled mass,
    * so the node count must stay under ~9·10^18 / 10^scaleDigits — at
    * the default 12 digits that is ~10^6 nodes (host graphs: fine);
    * pass scaleDigits 9 for ~10^9 nodes. The damping multiply uses the
    * split form `(s/100)*d + ((s%100)*d)/100` — identical floor result,
    * never forms s*d.
    *
    * Plan shape: K iterations = K (join + partial-agg shuffle) rounds
    * keyed by node — the canonical Spark iterative workload. The edge
    * frame is reused every round: persist/bucket it by `src` upstream
    * and every join co-locates; ranks (one row per node) is the small,
    * changing side and AQE broadcasts it when it fits. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85,
      scaleDigits: Int = 12): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val one = math.pow(10, scaleDigits).toLong
    val base = (100 - dampingPct) * one / 100
    val e = edges.select(col(s"`$srcCol`").as("src"), col(s"`$dstCol`").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val withDeg = e.join(outDeg, "src")

    var ranks = nodes.withColumn("rank_scaled", lit(one))
    (1 to iterations).foreach { _ =>
      // `div` is Spark's INTEGRAL division: Column./ on longs is double
      // division, whose round-to-nearest can exceed the true quotient
      // before a cast truncates — not floor, and not what the oracle's
      // exact `//` computes
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"),
          expr("rank_scaled div out_deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("mass"))
      val damped = expr(
        s"(mass div 100) * $dampingPct + ((mass % 100) * $dampingPct) div 100")
      ranks = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(base) + coalesce(damped, lit(0L))).as("rank_scaled"))
    }
    ranks
  }
}
