package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist filtering — the safety arm of crawl curation (C4 §2.2 used a
  * bad-word list; RefinedWeb and CCNet filter against UT1-class domain
  * blocklists with millions of entries). Both forms are JOIN-based, never
  * a literal array: a 4M-entry list must live as a distributed frame —
  * AQE broadcasts it when it fits, and the plan survives when it does
  * not.
  */
object Blocklist {

  /** Drop rows whose URL's host matches a blocked domain by SUFFIX:
    * `ads.tracker.com` matches blocklist entries `ads.tracker.com`,
    * `tracker.com`, and `com`-free suffixes alike — the way domain
    * blocklists are meant to apply to subdomains.
    *
    * Plan: each row's host explodes into its ≤~6 label suffixes
    * (bounded by hostname label count, never corpus size), then ONE
    * left-anti equi-join against the blocklist drops matching rows.
    * The pre-join distinct on (row, suffix) is unnecessary — explode
    * emits distinct suffixes per row by construction. */
  def dropBlockedHosts(df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame = {
    val host = LinkGraph.host(col(s"`$urlCol`"))
    val suffixes = filter(
      transform(split(host, "\\."),
        (_, i) => array_join(slice(split(host, "\\."), i + 1, lit(127)), ".")),
      s => length(s) > 0)
    val matchedUrls = df
      .select(col(s"`$urlCol`"), explode(suffixes).as("__graft_bl_one"))
      // case-fold the BLOCKLIST side too (host() already lowercases the
      // URL side): DNS names are case-insensitive, and an uppercase
      // blocklist entry silently never matched — flagBlockedTerms in
      // this file folds both sides for the same reason
      .join(blocklist.select(lower(col(s"`$domainCol`")).as("__graft_bl_one")),
        Seq("__graft_bl_one"), "left_semi")
      .select(col(s"`$urlCol`")).distinct()
    // joinBackOnce memoizes the (small) matched-URL set: the anti join
    // must not re-derive the explode+semi-join per consumer, and a UNION
    // corpus must not re-run it per branch (the pushdown-duplication trap
    // the dedup family measured)
    Dedup.joinBackOnce(df, matchedUrls, Seq(urlCol), "left_anti")
  }

  /** Per-document blocked-term hits: `(…, bad_hits, keep)` where
    * `keep` = fewer than `maxHits` distinct blocked terms appear
    * (case-folded whole-token match). `drop = true` filters to keepers
    * with the original schema.
    *
    * Plan: one explode of DISTINCT document tokens → equi-join the term
    * list (AQE broadcasts small lists) → per-doc count joins back. The
    * token explode emits distinct tokens per doc, so a repeated slur
    * counts once — term PRESENCE, the C4 semantic, not occurrence mass. */
  def flagBlockedTerms(df: DataFrame, textCol: String, idCol: String,
      terms: DataFrame, termCol: String = "term", maxHits: Int = 1,
      drop: Boolean = false): DataFrame = {
    // same collision guard as applyMixture/saltedJoin: an input already
    // carrying the output columns would make the join-back's bad_hits
    // ambiguous and die with an AnalysisException mid-plan
    Seq("bad_hits", "keep").foreach { c =>
      require(!df.columns.contains(c),
        s"flagBlockedTerms emits '$c' but the input already has it — " +
          "rename or drop the existing column first")
    }
    val toks = df.select(col(s"`$idCol`"),
        explode(array_distinct(filter(
          TextAnalysis.tokens(lower(col(s"`$textCol`"))),
          w => length(w) > 0))).as("__graft_bl_tok"))
      .join(terms.select(lower(col(s"`$termCol`")).as("__graft_bl_tok")),
        Seq("__graft_bl_tok"), "left_semi")
      .groupBy(col(s"`$idCol`")).agg(count(lit(1)).as("bad_hits"))
    val flagged = Dedup.joinBackOnce(df, toks, Seq(idCol), "left")
      .withColumn("bad_hits", coalesce(col("bad_hits"), lit(0L)))
      .withColumn("keep", col("bad_hits") < maxHits)
    if (drop) flagged.filter(col("keep"))
      .select(df.columns.map(c => col(s"`$c`")): _*)
    else flagged
  }
}
