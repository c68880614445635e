package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("extractOutlinks: hrefs in any quote/case, fragments and empties dropped") {
    val docs = Seq(
      (0L, """<a href="http://a.example/x">x</a> text <A HREF='https://B.example/y?q=1'>y</A>"""),
      (1L, """<a href="#frag">skip</a> <a href="">skip</a> <a href="/relative/path">rel</a>"""),
      (2L, "no links at all")).toDF("doc_id", "text")
    val out = LinkGraph.extractOutlinks(docs, "text", "doc_id")
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      0L -> "http://a.example/x",
      0L -> "https://B.example/y?q=1",
      1L -> "/relative/path"))
  }

  test("host: absolute http(s) lowercased; relative/other schemes null") {
    val got = Seq("http://A.Example:8080/p", "https://b.example/x?y#z",
      "ftp://c.example/f", "/rel", "mailto:x@example.org")
      .toDF("u").select(LinkGraph.host(col("u"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("a.example"), Some("b.example"), None, None, None))
  }

  test("hostGraph: aggregates link multiplicity, drops self-loops and relative links") {
    val links = Seq(
      ("http://a.example/1", "http://b.example/x"),
      ("http://a.example/2", "http://B.EXAMPLE/y"),
      ("http://a.example/3", "http://a.example/self"),
      ("http://a.example/4", "/relative"),
      ("http://c.example/1", "http://b.example/z")).toDF("src", "dst")
    val g = LinkGraph.hostGraph(links, "src", "dst")
      .as[(String, String, Long)].collect().toSet
    assert(g == Set(("a.example", "b.example", 2L), ("c.example", "b.example", 1L)))
  }

  test("pageRank: hand-computed fixed-point ranks on a 3-node graph") {
    // A -> B, A -> C, B -> C, C -> A
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("s", "d")
    val got = LinkGraph.pageRank(edges, "s", "d", iterations = 2)
      .as[(String, Long)].collect().toMap

    // replay the integer arithmetic by hand (scale 10^12, damping 85)
    val one = 1000000000000L
    val base = 15L * one / 100
    def damp(m: Long): Long = (m / 100) * 85 + ((m % 100) * 85) / 100
    // iter 1: all ranks 1.0; A gets C's 1.0, B gets A/2, C gets A/2 + B
    var (ra, rb, rc) = (base + damp(one), base + damp(one / 2), base + damp(one / 2 + one))
    // iter 2
    val (na, nb, nc) = (base + damp(rc), base + damp(ra / 2), base + damp(ra / 2 + rb))
    assert(got == Map("A" -> na, "B" -> nb, "C" -> nc))
    // after an even iteration the C→A backedge has just paid out: A leads
    assert(got("A") > got("C") && got("C") > got("B"))
  }

  test("pageRank: node with no in-links floors at base; dangling node keeps a rank row") {
    // D -> E; E has no outlinks (dangling), D no in-links
    val edges = Seq(("D", "E")).toDF("s", "d")
    val got = LinkGraph.pageRank(edges, "s", "d", iterations = 3)
      .as[(String, Long)].collect().toMap
    val one = 1000000000000L
    assert(got("D") == 15L * one / 100)
    assert(got.contains("E") && got("E") > got("D"))
  }

  test("host-graph store: appends merge by sum; compaction preserves the view") {
    val store = java.nio.file.Files.createTempDirectory("hg-store").toString + "/edges"
    val crawl1 = Seq(
      ("http://a.example/1", "http://b.example/x"),
      ("http://a.example/2", "http://b.example/y"),
      ("http://c.example/1", "http://b.example/z")).toDF("src", "dst")
    val crawl2 = Seq(
      ("http://a.example/9", "http://b.example/w"),  // a→b again: counts sum
      ("http://b.example/1", "http://c.example/q")). // new edge
      toDF("src", "dst")

    assert(LinkGraph.appendToHostGraphStore(crawl1, "src", "dst", store) == 2L)
    assert(LinkGraph.appendToHostGraphStore(crawl2, "src", "dst", store) == 2L)
    val merged = LinkGraph.readHostGraphStore(spark, store)
      .as[(String, String, Long)].collect().toSet
    assert(merged == Set(
      ("a.example", "b.example", 3L),
      ("c.example", "b.example", 1L),
      ("b.example", "c.example", 1L)))

    // compaction folds partials; the merged view is unchanged and the
    // accumulated graph ranks identically
    val before = LinkGraph.pageRank(
      LinkGraph.readHostGraphStore(spark, store), "src_host", "dst_host")
      .as[(String, Long)].collect().toMap
    LinkGraph.compactHostGraphStore(spark, store, targetFiles = 1)
    assert(LinkGraph.readHostGraphStore(spark, store)
      .as[(String, String, Long)].collect().toSet == merged)
    val after = LinkGraph.pageRank(
      LinkGraph.readHostGraphStore(spark, store), "src_host", "dst_host")
      .as[(String, Long)].collect().toMap
    assert(before == after)

    // absent store reads empty, not an error
    assert(LinkGraph.readHostGraphStore(spark, store + "-nope").count() == 0L)
  }

  test("pageRank is partition-count invariant (integer arithmetic, no float drift)") {
    val edges = (0L until 200L).map(i => (s"h${i % 13}", s"h${(i * i + 1) % 13}"))
      .toDF("s", "d")
    val r1 = LinkGraph.pageRank(edges.repartition(1), "s", "d")
      .as[(String, Long)].collect().toMap
    val r32 = LinkGraph.pageRank(edges.repartition(32), "s", "d")
      .as[(String, Long)].collect().toMap
    assert(r1 == r32)
  }

  test("pageRank: driver fast path equals the distributed loop (r19 switch)") {
    // pseudo-random multigraph with a hub, a dangling node, a self-loop
    // and duplicate edges; driverEdgeLimit = 0 forces the distributed
    // path on the SAME input — both paths must agree rank-for-rank
    val edges = spark.range(300).selectExpr(
      "concat('n', id % 37) as s",
      "concat('n', (id * id + 7) % 41) as d")
    val local = LinkGraph.pageRank(edges, "s", "d")
      .as[(String, Long)].collect().toMap
    val dist = LinkGraph.pageRank(edges, "s", "d", driverEdgeLimit = 0L)
      .as[(String, Long)].collect().toMap
    assert(local == dist)
    // null endpoints follow SQL join semantics on both paths: a null src
    // contributes nothing, a null dst receives nothing, both rank at base
    val withNulls = edges.unionAll(spark.range(3).selectExpr(
      "if(id = 0, null, concat('n', id)) as s",
      "if(id = 1, null, concat('m', id)) as d"))
    val localN = LinkGraph.pageRank(withNulls, "s", "d")
      .as[(String, Long)].collect().toMap
    val distN = LinkGraph.pageRank(withNulls, "s", "d", driverEdgeLimit = 0L)
      .as[(String, Long)].collect().toMap
    assert(localN == distN)
  }
}
