package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  // Locale.ROOT: the f interpolator formats with the JVM default locale,
  // and a comma-decimal locale would render 1.234 as "1,234" — malformed
  // JSON, which is exactly the driver-parse failure this line exists to
  // avoid.
  private[graft] def jnum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The driver captures only the LAST ~2,000 chars of the run's output,
    * and the parsed JSON line must fit entirely inside that window (plus
    * sbt's trailing "[success] ..." line) or the round's bench is
    * machine-unreadable (r6 and r10 both hit this — parsed:null). Budget
    * below this bound; `renderParsedLine` enforces it by construction. */
  private[graft] val MaxLineChars = 1800

  /** Fixed headline subset whose medians ride the parsed line — a stable,
    * deterministic set so cross-round comparisons read the same keys every
    * round. The FULL per-query medians/mins/spreads/samples live in
    * bench_detail.json; the parsed line must never again grow with the
    * gate count (89 medians inline is what overflowed r10's line). */
  private[graft] val headline: Seq[String] = Seq(
    "q1_pricing", "q_dedup_minhash", "q_dedup_store_exact",
    "q_dedup_store_near", "q_image_phash", "q_quality_band",
    "q_multimodal_curate", "q_ann_ivf", "q_sessionize", "q_funnel",
    // round-11 additions (additive — earlier keys stay comparable)
    "q_knn", "q_sorted_write", "q_langid", "q_pagerank",
    // round-12 additions (append-only — BenchLineSpec pins the prefix)
    "q_cluster_balance", "q_template_cond")

  /** Render the one driver-parsed JSON line. Pure so a spec can pin the
    * length invariant at any gate count: if the assembled line would
    * exceed [[MaxLineChars]], progressively drop the optional payloads
    * (headline queries map first, then stress_norm, then stress) — the
    * driver's contract needs `value` and `errors` above all. */
  private[graft] def renderParsedLine(
      total: Double,
      queryMedians: Seq[(String, Double)],
      errored: Seq[String],
      rounds: Int,
      sharedSec: Double,
      stress: Seq[(String, Double)],
      stressNorm: Seq[(String, Double)],
      sfDir: String): String = {
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
        .mkString("{", ",", "}")
    val head = queryMedians.filter { case (k, _) => headline.contains(k) }
    val errJson = errored.map("\"" + _ + "\"").mkString("[", ",", "]")
    def assemble(qs: Seq[(String, Double)], st: Seq[(String, Double)],
        norm: Seq[(String, Double)]): String =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":${obj(qs)},"errors":$errJson,"rounds":$rounds,"shared":{"shared_build":${jnum(sharedSec)}},"stress":${obj(st)},"stress_norm":${obj(norm)},"sf":"$sfDir"}"""
    val candidates = Iterator(
      assemble(head, stress, stressNorm),
      assemble(Seq.empty, stress, stressNorm),
      assemble(Seq.empty, stress, Seq.empty),
      assemble(Seq.empty, Seq.empty, Seq.empty))
    candidates.find(_.length <= MaxLineChars)
      .getOrElse(assemble(Seq.empty, Seq.empty, Seq.empty))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Median-of-N per query (default 3): a single-shot run cannot
    // distinguish real regressions from scheduler/JIT noise — r3→r5 spent
    // two rounds chasing a q_ann_pq "drift" that was structurally
    // unanswerable with one sample. Rounds alternate A/B/C over the whole
    // query list (not back-to-back repeats) so one slow neighbor can't
    // poison all of a query's samples.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/parquet-footer paths on the smallest SF so the
    // first timed query doesn't absorb one-time session costs.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Cross-scale stress datapoints — run FIRST, before the query rounds,
    // in the freshest JVM state this process will ever have: r7's driver
    // run recorded semdedup at 108.5 s where three same-code re-runs gave
    // 27-36 s, and the only difference was what had already churned the
    // JVM/machine. Each op is BEST-of-2 with a GC settle between — the
    // min is the contention-robust statistic for a fixed workload (noise
    // only ever adds time); both samples go to bench_detail.json so a
    // suspicious min is auditable.
    val stress = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val stressSamples = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    val stressCopies = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES", "100").toInt
    val semCopies = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_COPIES", "50").toInt
    // min-of-3 by default: a same-session A/B (this round) showed min-of-2
    // still moving 45-67% probe-normalized on two ops when the machine
    // slowed 20% mid-block — the third sample tightens the floor for ~3
    // extra minutes of driver time
    val stressRuns = sys.env.getOrElse("SPARK_GRAFT_STRESS_RUNS", "3").toInt
    if (sys.env.getOrElse("SPARK_GRAFT_STRESS", "1") != "0") {
      spark.catalog.clearCache()
      graft.core.CacheRegistry.drain()
      // CALIBRATION PROBE: a fixed seeded CPU+shuffle workload timed with
      // the same best-of-N discipline as the stress ops. r8 vs r9 ran
      // byte-identical code and the driver recorded 2-4× swings on the
      // stress block (minhash 38.4 vs 127.7 s) — the machine, not the
      // code. Each stress datapoint is also reported normalized to the
      // probe (stress_norm on the parsed line), which cancels machine
      // contention and is the number to compare across rounds.
      def probeOnce(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        spark.range(0, 200000000L, 1, 32)
          .select(xxhash64(xxhash64(col("id"), lit(42))).as("h"))
          .groupBy(pmod(col("h"), lit(1024)).as("b"))
          .agg(sum(col("h"))).count()
        (System.nanoTime() - t0) / 1e9
      }
      def timed(key: String)(f: => Long): Unit = {
        val xs = (0 until stressRuns).map { _ =>
          System.gc() // settle: don't bill a prior op's garbage to this one
          val t0 = System.nanoTime()
          val ok = try { f; true } catch { case _: Throwable => false }
          spark.catalog.clearCache()
          graft.core.CacheRegistry.drain()
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }.toVector
        stressSamples(key) = xs
        stress(key) = if (xs.exists(_ < 0)) -1.0 else xs.min
      }
      val probePre = Vector.fill(2)(probeOnce())
      val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
      val bigDocs = (0 until stressCopies).map(i => d1.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text")))
        .reduce(_ union _)
      stress("doc_copies") = stressCopies.toDouble
      timed("minhash")(
        graft.ml.Dedup.minhashPairs(bigDocs, "text", "doc_id").count())
      timed("hamming64_drop")(
        graft.ml.Dedup.dropDuplicatesHamming64(bigDocs, "text", "doc_id").count())
      timed("passage")(
        graft.ml.Dedup.duplicatedPassages(bigDocs, "text", "doc_id").count())
      // SKEWED twin (VERDICT r7 task 7): 1% of docs collapse onto one
      // boilerplate text — the hot exact-dup cluster real crawls have.
      // The star-reduction inside the fused drop keeps this linear; the
      // uniform/skew ratio is the driver-visible regression guard.
      val hotText = "common boilerplate navigation header about contact " +
        "privacy terms copyright all rights reserved site map search login"
      val skewDocs = bigDocs.withColumn("text",
        when(pmod(col("doc_id"), lit(100)) === 0, lit(hotText))
          .otherwise(col("text")))
      timed("hamming64_drop_skew")(
        graft.ml.Dedup.dropDuplicatesHamming64(skewDocs, "text", "doc_id").count())
      // star-reduced pair enumeration over the same hot cluster (the raw
      // list is C(5000,2)=12.5M pairs / 151 s — quadratic by contract;
      // collapse_exact is the at-scale form the clustered stage uses)
      timed("minhash_skew_collapse")(
        graft.ml.Dedup.minhashPairs(skewDocs, "text", "doc_id",
          collapseExact = true).count())
      // INCREMENTAL STORE (VERDICT r7 task 3's "Done ="): a seen store
      // ~16× the daily increment. The recurring per-day cost is
      // store_drop — one store scan + Bloom-prefiltered broadcast
      // probes, never a store shuffle — and must sit far below
      // store_build (the one-time backfill, whose anti-join + bloom
      // build DO scan/shuffle the corpus).
      val storeRoot = java.nio.file.Files
        .createTempDirectory("graft-stress-store").toString
      // fresh store per sample — a re-append to the same store is a
      // no-op (anti-join drops everything), and best-of-2 would then
      // report the no-op as the "build" cost
      var storeN = 0
      timed("store_build") {
        storeN += 1
        graft.ml.Dedup.appendToSeenStore(bigDocs, "text", s"$storeRoot/fps$storeN")
      }
      val storeDir = s"$storeRoot/fps$storeN"
      val increment = bigDocs
        .filter(pmod(col("doc_id"), lit(20)) === 0) // ~25k seen texts, fresh ids
        .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
        .union(d1.select((col("doc_id") + lit(950000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "zz_$1").as("text"))) // ~5k unseen
      timed("store_drop")(
        graft.ml.Dedup.dropSeenStore(increment, storeDir, "text").count())
      // mid-block probe sample: contention can ramp DURING the block
      // (observed: ops slowed while the pre-block probe stayed fast,
      // which over-amplified stress_norm) — sampling the floor at three
      // points brackets the ops it normalizes
      val probeMid = probeOnce()
      // NEAR STORE + SKEWED INCREMENT (VERDICT r9 stretch 8): the banded
      // store probe DISTINCTs increment fingerprints before the join, so
      // a boilerplate-heavy increment (99% of rows one hot text — the
      // shape a crawler re-visiting a template site produces) must cost
      // ≈ the uniform increment, not multiply the probe. The
      // uniform/skew ratio is the driver-visible guard.
      var nearN = 0
      timed("near_store_build") {
        nearN += 1
        graft.ml.Dedup.appendToNearStore(bigDocs, "text", s"$storeRoot/near$nearN")
      }
      val nearDir = s"$storeRoot/near$nearN"
      timed("near_store_drop")(
        graft.ml.Dedup.dropSeenNearStore(increment, nearDir, "text", "doc_id").count())
      val skewIncrement = increment.withColumn("text",
        when(pmod(col("doc_id"), lit(100)) =!= 0, lit(hotText))
          .otherwise(col("text")))
      timed("near_store_drop_skew")(
        graft.ml.Dedup.dropSeenNearStore(skewIncrement, nearDir, "text", "doc_id").count())
      locally {
        def rmrf(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rmrf))
          f.delete(): Unit
        }
        rmrf(new java.io.File(storeRoot))
      }
      // INVERTED INDEX at 100×, uniform vs stop-word twin: the copies'
      // word-prefix salting makes every token copy-local (uniform); the
      // skew twin appends one shared token to EVERY doc — a 500k-row
      // posting chain for a single key, the stop-word shape. The df path
      // collapses it map-side (partial agg) and the rank path cuts it
      // map-side (WindowGroupLimit Partial), so skew/uniform must stay
      // ≈1 — the driver-visible guard that neither path ever funnels a
      // stop-word's full chain through one reducer.
      timed("inverted_index")(
        graft.ml.TextAnalysis.invertedIndex(bigDocs, "text", "doc_id",
          minDf = 2L, maxPostings = 100).count())
      timed("inverted_index_stopword")(
        graft.ml.TextAnalysis.invertedIndex(
          bigDocs.withColumn("text", concat(col("text"), lit(" thetoken"))),
          "text", "doc_id", minDf = 2L, maxPostings = 100).count())
      val e1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val bigVecs = (0 until semCopies).map(i => e1.select(
        (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        transform(col("embedding"), x => x * (1.0f + i / 128.0f)).as("embedding")))
        .reduce(_ union _)
      stress("vec_copies") = semCopies.toDouble
      timed("semdedup")(
        graft.ml.Similarity.semanticDedup(bigVecs, "embedding", "vec_id",
          numCells = 16, threshold = 0.95, maxCellSize = 2000L).count())
      // MULTIMODAL HEADER THROUGHPUT: synthesize-and-decode a mixed
      // audio/video corpus (WAV/MP4/FLAC/Ogg/WebM by id%5 — PNG excluded
      // because ImageIO *encode* would dominate the fixture side) fused
      // in one pass, stressCopies × documents rows. The decoders are
      // header-only, so this is the per-row fixed cost a 100 TB media
      // scan pays; a regression here means a decoder started reading
      // payload bytes.
      locally {
        val mm = graft.ml.Multimodal
        val ids = bigDocs.select(col("doc_id"))
        def cls(m: Int) = ids.filter(pmod(col("doc_id"), lit(5)) === m)
        val bigMedia = mm.synthesizeWavs(cls(0), "doc_id")
          .unionByName(mm.synthesizeMp4s(cls(1), "doc_id"))
          .unionByName(mm.synthesizeFlacs(cls(2), "doc_id"))
          .unionByName(mm.synthesizeOggs(cls(3), "doc_id"))
          .unionByName(mm.synthesizeMkvs(cls(4), "doc_id"))
        timed("decode_headers")(
          mm.decodePartitions(bigMedia, mm.HeaderDecoder)
            .agg(sum(col("meta.duration_ms"))).count())
      }
      // PIXEL-DECODE THROUGHPUT: unlike decode_headers this reads EVERY
      // payload byte — full PNG decode plus the aHash/dHash reduction,
      // the payload-proportional cost of an image near-dup pass. The
      // fixture is PNG-*encode*-heavy, so it is built and checkpointed
      // OUTSIDE the timed region (the localCheckpoint survives the
      // between-sample cache clears); the datapoint times decode+hash
      // only. A regression here means the decode path started paying
      // per-image constant costs again (e.g. the ImageIO disk cache).
      locally {
        val mm = graft.ml.Multimodal
        val bigPngs = mm.synthesizeImageVariants(
          bigDocs.select(col("doc_id")), "doc_id").localCheckpoint()
        timed("decode_pixels")(
          mm.decodeImagePixels(bigPngs)
            .agg(sum(col("px.px_sum"))).count())
      }
      // AS-OF JOIN + SESSIONIZE at 100×: both ops are one keyed exchange
      // plus a per-partition sort, so cost should scale ~linearly in rows
      // per key. Uniform twin: copies get DISTINCT user_ids (more keys,
      // same chain length — the healthy sharded shape). Skew twin: copies
      // KEEP their user_ids, so every per-key chain grows stressCopies× —
      // the long-sort shape a hot entity produces at 100 TB. The
      // uniform/skew ratio is the driver-visible guard that neither op
      // degrades super-linearly in chain length.
      locally {
        val ev = graft.core.Tables.load(spark, sfDir, "events")
        def copies(shiftKeys: Boolean) = (0 until stressCopies).map { i =>
          val uid = if (shiftKeys) col("user_id") + lit(i * 1000000L)
                    else col("user_id")
          ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
            uid.as("user_id"), col("ts"), col("event_type"), col("value"))
        }.reduce(_ union _)
        val bigEv     = copies(shiftKeys = true)
        val bigEvSkew = copies(shiftKeys = false)
        stress("event_copies") = stressCopies.toDouble
        def asof(d: DataFrame): Long =
          graft.operators.AsOfJoin.leftAsOf(
            d.select(col("event_id"), col("user_id"), col("ts")),
            d.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("value")).count()
        timed("asof")(asof(bigEv))
        timed("asof_skew")(asof(bigEvSkew))
        timed("sessionize")(
          graft.operators.Sessionize.summarize(bigEv, "user_id", "ts", 1800L).count())
        timed("sessionize_skew")(
          graft.operators.Sessionize
            .summarize(bigEvSkew, "user_id", "ts", 1800L).count())
        // funnel/retention at 100×: the funnel's per-user DP folds a
        // 100×-longer matched-event list under skew (same users, all
        // copies) — the guard that the fold stays linear in list length
        def funnelOf(d: DataFrame): Long =
          graft.operators.Funnel.windowFunnel(d, "user_id", "ts",
            Seq(col("event_type") === "view", col("event_type") === "click",
              col("event_type") === "purchase"), 86400L).count()
        timed("funnel")(funnelOf(bigEv))
        timed("funnel_skew")(funnelOf(bigEvSkew))
        timed("retention")(
          graft.operators.Retention.cohorts(bigEv, "user_id", "ts",
            col("event_type") === "signup", 604800L, 8).count())
      }
      // PAGERANK at 100×: 5 iterations of join + partial-agg over a
      // 2-edges-per-doc list (~2·copies·|docs| edges). Uniform twin:
      // residue-rule targets spread in-degree. Hub twin: HALF of all
      // edges point at one host — the in-degree skew real webgraphs have.
      // Map-side combine must absorb the hub's rank-mass sum before the
      // shuffle; the uniform/hub ratio is the guard that a hot host never
      // funnels its full in-edge list through one reducer.
      locally {
        def edges(hub: Boolean) = {
          val dst2 = if (hub) lit(0L) else pmod(col("doc_id") * 13 + 1, lit(50000L))
          val src = concat(lit("h"), col("doc_id").cast("string"))
          bigDocs.select(src.as("src"),
              concat(lit("h"), pmod(col("doc_id") * 7 + 3, lit(50000L))
                .cast("string")).as("dst"))
            .union(bigDocs.select(src.as("src"),
              concat(lit("h"), dst2.cast("string")).as("dst")))
        }
        def rank(d: DataFrame): Long =
          graft.ml.LinkGraph.pageRank(d, "src", "dst")
            .agg(sum("rank_scaled")).count()
        timed("pagerank")(rank(edges(hub = false)))
        timed("pagerank_hub")(rank(edges(hub = true)))
      }
      // LANGID at 100×: train + classify fused over the copied corpus
      // (labels synthesized — this measures the training explode/rank
      // and the in-row classify map, not accuracy). The throughput shape
      // a 100 TB language-routing pass pays. Since the r12 classify
      // rewrite (zero-exchange embedded-profile map) the cost is
      // dominated by trainProfiles' gram explode.
      locally {
        // EXPLICIT cap at 20 copies (recorded as langid_copies): the r11
        // window-join classify was ~90 s/run at 100 copies; kept at 20
        // so the datapoint stays comparable round over round
        val langidCopies = math.min(stressCopies, 20)
        val labeled = bigDocs
          .filter(col("doc_id") < langidCopies * 10000000L)
          .withColumn("lang",
            concat(lit("l"), pmod(col("doc_id"), lit(5)).cast("string")))
        stress("langid_copies") = langidCopies.toDouble
        timed("langid") {
          val prof = graft.ml.LangId.trainProfiles(labeled, "text", "lang")
          graft.ml.LangId.classify(labeled, "text", "doc_id", prof).count()
        }
      }
      // pre + mid + post probe samples: the min is the machine floor the
      // stress ops are normalized against
      val probeAll = probePre :+ probeMid :+ probeOnce()
      stressSamples("probe") = probeAll
      stress("probe") = probeAll.min
      System.gc() // leave the query rounds a settled heap
    }

    // Shared memoized frames (minhash pair frame feeds q_dedup_minhash
    // AND q_dedup_clusters; the synthesized-PNG corpus feeds
    // q_multimodal_decode) are built ONCE here and attributed to their
    // own JSON key — otherwise the build cost lands on whichever consumer
    // the map yields first and round-over-round comparisons drift with
    // map order.
    val tShared = System.nanoTime()
    if (rounds > 0)
      try SparkEntry.prebuildShared(spark, sfDir) catch { case _: Throwable => () }
    val sharedSec = (System.nanoTime() - tShared) / 1e9
    // SPARK_GRAFT_BENCH_RUNS=0 → stress-only run (probe-reproducibility
    // measurements without paying 3 query rounds)
    // SPARK_GRAFT_ONLY=a,b,c → time only those queries (builder-side fast
    // iteration, the Verify third-arg convention; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names =
      if (rounds > 0)
        SparkEntry.queries.keys.toSeq.filter(n => only.forall(_.contains(n)))
      else Seq.empty[String]
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 0 until rounds) {
      // identical plans across rounds would hit the previous round's
      // persisted frames (joinBackOnce pins drop sets in the cache) and
      // turn the median into a warm-cache number — clear between rounds
      // so every sample pays the full derivation. prebuildShared's memo
      // is localCheckpoint-based (an RDD, not the cache) and survives.
      spark.catalog.clearCache()
      graft.core.CacheRegistry.drain()
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        // An errored query must NOT record its fast-fail latency as a
        // timing (r9 benched 16 analysis-failures at ~0.06 s each and the
        // artifact read as green): mark the sample -1 and surface the
        // name in the parsed line's "errors" list instead.
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        samples(name) = samples(name) :+
          (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    }
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map { n =>
      val xs = samples(n)
      n -> (if (xs.exists(_ < 0)) -1.0 else median(xs))
    }
    val errored = med.collect { case (n, v) if v < 0 => n }

    // Per-query medians, spread and raw samples go to a SIDE FILE: the
    // driver captures only the tail of the run's output, and both r6's
    // inline spread/runs arrays and r10's 89 inline medians pushed the
    // parsed line past the capture window (parsed:null). The driver-parsed
    // line below carries only the total, errors, a fixed headline median
    // subset, and the stress block — everything per-query lives here.
    val detail = {
      val meds = med.map { case (n, v) =>
        "\"" + n + "\":" + v
      }.mkString("{", ",", "}")
      val spread = names.map { n =>
        val s = samples(n)
        "\"" + n + "\":" + (s.max - s.min)
      }.mkString("{", ",", "}")
      // per-query min alongside the parsed-line median: a contended
      // driver round shows up as median >> min and can be diagnosed as
      // environment-vs-code from the artifacts alone, without a re-run
      val mins = names.map { n =>
        "\"" + n + "\":" + samples(n).min
      }.mkString("{", ",", "}")
      val runs = names.map { n =>
        "\"" + n + "\":" + samples(n).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val stressRuns = stressSamples.map { case (k, xs) =>
        "\"" + k + "\":" + xs.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      s"""{"rounds":$rounds,"median":$meds,"spread":$spread,"min":$mins,"runs":$runs,"stress_runs":$stressRuns,"sf":"$sfDir"}"""
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }

    // probe-normalized stress datapoints: the cross-round comparable form
    val norm = stress.get("probe").filter(_ > 0).map { p =>
      stressSamples.keys.filter(k => k != "probe" && stress(k) > 0)
        .map(k => k -> stress(k) / p).toSeq
    }.getOrElse(Seq.empty)
    val total = med.collect { case (_, v) if v >= 0 => v }.sum + sharedSec
    println(renderParsedLine(total, med, errored, rounds, sharedSec,
      stress.toSeq, norm, sfDir))
    spark.stop()
  }
}
