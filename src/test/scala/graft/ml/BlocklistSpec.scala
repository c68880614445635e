package graft.ml

import graft.SparkSpec
import graft.pipeline.Planner
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("dropBlockedHosts: suffix match on label boundaries, subdomains blocked") {
    val docs = Seq(
      (0L, "http://ads.tracker.com/x"),   // blocked via tracker.com
      (1L, "http://tracker.com/y"),       // blocked exactly
      (2L, "http://nottracker.com/z"),    // NOT blocked: label boundary
      (3L, "http://tracker.com.evil.org/w"), // NOT blocked: com.evil.org ≠ suffix
      (4L, "/relative/no-host"),          // no host → kept
      (5L, null.asInstanceOf[String]),    // null url → kept
      (6L, "http://clean.example/ok")).toDF("id", "url")
    val bl = Seq("tracker.com").toDF("domain")
    val kept = Blocklist.dropBlockedHosts(docs, "url", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("dropBlockedHosts: uppercase blocklist entries match (DNS is case-insensitive)") {
    // the URL side lowercases via host(); the blocklist side didn't —
    // an uppercase entry silently never matched (r14 fix)
    val docs = Seq(("http://ads.tracker.com/x", 1L), ("http://ok.org/y", 2L))
      .toDF("url", "id")
    val bl = Seq("Ads.Tracker.COM").toDF("domain")
    val kept = Blocklist.dropBlockedHosts(docs, "url", bl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L), s"got $kept")
  }

  test("flagBlockedTerms: case-folded distinct presence, maxHits, drop mode") {
    val docs = Seq(
      (0L, "clean words only here"),
      (1L, "one BAD word appears"),              // 1 hit (case-folded)
      (2L, "bad bad bad worse"),                 // bad repeated = 1 distinct + worse = 2
      (3L, "badness is not a whole-token match")).toDF("id", "text")
    val terms = Seq("bad", "worse").toDF("term")
    val out = Blocklist.flagBlockedTerms(docs, "text", "id", terms, maxHits = 2)
      .select("id", "bad_hits", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(0L) == (0L, true))
    assert(out(1L) == (1L, true))
    assert(out(2L) == (2L, false))
    assert(out(3L) == (0L, true), "substring must not match a whole token")

    val dropped = Blocklist.flagBlockedTerms(docs, "text", "id", terms,
      maxHits = 1, drop = true)
    assert(dropped.columns.toSeq == Seq("id", "text"))
    assert(dropped.select("id").as[Long].collect().toSet == Set(0L, 3L))
  }

  test("BlockHosts/BlockTerms stages dispatch inline lists and reject bad config") {
    val docs = Seq((0L, "http://spam.example/x", "fine text"),
      (1L, "http://ok.example/y", "really bad text"))
      .toDF("id", "url", "text")
    val hosts = Planner.corpusStage("BlockHosts",
      Map("src" -> "url", "domains" -> Seq("spam.example")))(docs)
    assert(hosts.select("id").as[Long].collect().toSeq == Seq(1L))
    val terms = Planner.corpusStage("BlockTerms",
      Map("src" -> "text", "id_field" -> "id", "mode" -> "drop",
        "terms" -> Seq("bad")))(docs)
    assert(terms.select("id").as[Long].collect().toSeq == Seq(0L))
    intercept[RuntimeException] {
      Planner.corpusStage("BlockHosts", Map("src" -> "url"))(docs)
    }
    intercept[RuntimeException] {
      Planner.corpusStage("BlockTerms", Map[String, Any]())(docs)
    }
  }
}
