package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-scale stress datapoints, grouped into FAMILIES so each family can
  * run in a fresh JVM ([[StressWorker]]): r12's in-block numbers showed
  * 3-4.5× intra-run spreads on byte-identical code (semdedup
  * 120/152/47 s within one run) that an isolated fresh-JVM re-run
  * immediately brought back in band — heap/page-cache/JIT churn from
  * everything that ran earlier in the block, which the short CPU-bound
  * calibration probe demonstrably does NOT see (it read FASTER while the
  * long shuffle-heavy ops read 2× slower), so probe normalization
  * amplified rather than cancelled the noise. Fresh JVM per family is
  * the fix: every datapoint starts from the same JVM state every round,
  * making cross-round comparisons certifiable.
  *
  * The ops themselves are unchanged from the in-block era (the datapoint
  * keys and workload shapes are the cross-round contract); [[Bench]]
  * runs families in-process as a fallback when spawning fails.
  */
object StressOps {

  /** Ordered (family → op keys) — the worker CLI contract and the
    * parsed-line output order. Constants (doc_copies etc.) are emitted
    * by the families that define them. */
  val families: Seq[(String, Seq[String])] = Seq(
    "dedup" -> Seq("minhash", "hamming64_drop", "passage", "passage_strip",
      "hamming64_drop_skew", "minhash_skew_collapse"),
    "store" -> Seq("store_build", "store_drop", "near_store_build",
      "near_store_drop", "near_store_drop_skew"),
    "index" -> Seq("inverted_index", "inverted_index_stopword"),
    "vec" -> Seq("semdedup"),
    "media" -> Seq("decode_headers", "decode_pixels"),
    "events" -> Seq("asof", "asof_skew", "sessionize", "sessionize_skew",
      "funnel", "funnel_skew", "retention"),
    "graph" -> Seq("pagerank", "pagerank_hub"),
    "langid" -> Seq("langid"),
    "token" -> Seq("bpe_encode", "ngram_lm_score"),
    // round-15 addition (append-only): quantile aggregation at 100×,
    // exact (per-group value buffering) vs the GK sketch, uniform vs a
    // hot (window × group) holding ~1/3 of all rows — the shape where
    // the exact form's memory contract breaks at corpus scale
    "metrics" -> Seq("stats_pct_exact", "stats_pct_approx",
      "stats_pct_exact_skew", "stats_pct_approx_skew"))

  /** ARM GROUPS (r15 verdict tasks 1+3): the four most expensive families
    * split their op list into groups that rotate across bench runs (a
    * per-family arm cursor persists in the stress ledger), so one run
    * pays roughly half the family's cost and 3-4 families certify per
    * 600 s budget instead of 2. Groups keep dependent ops together
    * (store_drop probes the store store_build just built; a skew twin
    * may ride with its uniform baseline or rotate — the uniform/skew
    * ratio then compares across adjacent runs, which min-of-N already
    * requires for any cross-round ratio). Families absent here run all
    * their ops every time. Each entry PARTITIONS the family's op list
    * exactly (spec-pinned in BenchLineSpec). */
  val armGroups: Map[String, Seq[Seq[String]]] = Map(
    "dedup" -> Seq(
      Seq("minhash", "hamming64_drop", "passage"),
      Seq("passage_strip", "hamming64_drop_skew", "minhash_skew_collapse")),
    "store" -> Seq(
      Seq("store_build", "store_drop"),
      Seq("near_store_build", "near_store_drop", "near_store_drop_skew")),
    "events" -> Seq(
      Seq("asof", "asof_skew", "sessionize", "sessionize_skew"),
      Seq("funnel", "funnel_skew", "retention")),
    // the r15 driver's metrics worker blew its (end-of-budget) watchdog
    // running all 4 arms — exact+approx uniform one run, the skew pair
    // the next keeps each run's cost ≈ half (verdict task 3)
    "metrics" -> Seq(
      Seq("stats_pct_exact", "stats_pct_approx"),
      Seq("stats_pct_exact_skew", "stats_pct_approx_skew")))

  /** The op subset a family runs at arm cursor `armIdx` (modulo the
    * group count, so a stale cursor never errors); families without
    * groups run everything. */
  def armsFor(family: String, armIdx: Int): Seq[String] =
    armGroups.get(family) match {
      case Some(groups) => groups(((armIdx % groups.size) + groups.size) % groups.size)
      case None => families.find(_._1 == family).map(_._2).getOrElse(Seq.empty)
    }

  /** CALM BANDS (r18 verdict task 4): per-op [lo, hi] seconds observed
    * on calm windows of THIS box — emitted into bench_detail.json next
    * to every published datapoint so heat inflation is classifiable
    * from the artifact alone (the r18 judge could classify ngram_lm's
    * 65.7 s as ~4× hot only by grepping SURVEY for the band). Bands are
    * deliberately generous (~±15% past the observed calm span) — they
    * classify 2-4× heat, not 10% regressions (min-of-N across rounds
    * does that). Provenance: committed calm-round BENCH lines (r12/r16/
    * r17) and the SURVEY §8.22-8.25 calm-box rehearsals, post the r13
    * head()-consumption definitions and the r10/r13 kernel fixes (the
    * pre-fix values — minhash 35.2, semdedup 47.5 — are NOT in-band on
    * purpose). A datapoint far above its band on a calm bracket is a
    * real regression; above it on a contended bracket is heat. */
  val calmBands: Map[String, (Double, Double)] = Map(
    // dedup — §8.22h/§8.23j/m rehearsals + r17 driver arm
    "minhash" -> (11.7, 22.0),              // obs 13.8-19.1
    "hamming64_drop" -> (14.5, 25.8),       // obs 17.1-22.4
    "passage" -> (6.5, 12.0),               // obs 7.6-10.7
    "passage_strip" -> (8.0, 13.5),         // obs 9.4-11.7 (head()-def)
    "hamming64_drop_skew" -> (14.1, 26.9),  // obs 16.6-23.4
    "minhash_skew_collapse" -> (11.9, 23.7),// obs 14.0-20.6
    // store — §8.22h/§8.23j/m; store_drop honestly wide (obs 9.5-17.6)
    "store_build" -> (5.4, 10.1),           // obs 6.4-8.8
    "store_drop" -> (8.1, 20.2),
    "near_store_build" -> (5.4, 8.5),       // obs 6.3-7.4
    "near_store_drop" -> (10.9, 20.4),      // obs 12.8-17.7
    "near_store_drop_skew" -> (11.1, 21.4), // obs 13.1-18.7
    // index — obs 8.1-10.2 both twins (skew ≈ uniform by design)
    "inverted_index" -> (6.9, 11.7),
    "inverted_index_stopword" -> (6.9, 11.7),
    // vec — r20 re-derived: the semanticDedup assignment barrier became
    // the eager RDD barrier (unknown stats ⇒ no AQE coalesce of the
    // pair-join exchanges at stress scale), and a full-defaults calm
    // rehearsal (probe floor 0.516, the calmest window on record) read
    // [19.31, 12.85, 12.28] — the old 23.7-38.2 band (pre-barrier obs
    // 27.9-33.2) now sits ENTIRELY above calm. lo 15% under the calm
    // min; hi covers the fresh-JVM first sample with margin.
    "semdedup" -> (10.4, 20.0),
    // media — obs 16.7-23 / 2.0-3.2 (§8.23j, r12-13)
    "decode_headers" -> (14.2, 26.5),
    "decode_pixels" -> (1.7, 3.7),
    // events — the r16-18 verdict bands + §8.24g/§8.25f rehearsals
    "asof" -> (1.2, 3.0),                   // obs 1.41-2.84 (§8.26l calm)
    "asof_skew" -> (1.1, 1.9),              // obs 1.26-1.63
    "sessionize" -> (5.6, 8.8),             // the verdict's quoted band
    "sessionize_skew" -> (4.6, 8.8),        // obs 5.1-8.4
    "funnel" -> (4.8, 8.6),                 // obs 5.7-7.8
    "funnel_skew" -> (3.9, 8.0),            // obs 4.6-7.2
    "retention" -> (4.2, 6.6),              // obs 5.0-5.9
    // graph — the r16 verdict's 14.7-16.8 re-cert band, §8.25f 14.375
    "pagerank" -> (12.2, 18.5),             // obs 13.9-16.8
    "pagerank_hub" -> (10.4, 17.3),         // obs 12.2-15.8
    // langid — obs 8.2 (§8.22h) - 11.96 (r15, mildly warm)
    "langid" -> (7.0, 13.2),
    // token — head()-def obs bpe 3.4-5.1, ngram 13.9-20.0
    "bpe_encode" -> (2.9, 6.9),             // obs 3.4-6.26 (§8.26l calm)
    // r19: score() rewritten to the zero-exchange broadcast-model
    // kernel (pre-r19 lattice-explode band 11.8-25.0). r20: the model
    // drain additionally checkpoints before its bounded take (the
    // scale-up-scan fix), and a full-defaults calm rehearsal on the r20
    // bits (probe floor 0.516) read [5.36, 4.637, 4.278] — under the
    // prior 5.0 floor, which fired that band-comment's own rule: lo
    // dropped BELOW HotSkipCalmSecs (the arm leaves the hot-skip set —
    // BenchLineSpec membership pin updated with it) instead of bending
    // the skip threshold. Context: earlier r20-bit obs 8.33-8.63 at
    // probes ~0.97 (~1.7× floor, mildly warm — correctly above-band
    // now); pre-r20 calm obs 5.334/8.408 are superseded by the drain
    // change. lo 15% under the calm min; hi covers warm-adjacent
    // variance without absorbing 2×+ heat.
    "ngram_lm_score" -> (3.6, 8.0),
    // metrics — §8.22h 5.5/7.0/6.4/7.8, r17 driver 10.45/8.49,
    // §8.24e/g 7.2-9.0; skew twins single-obs → widened
    "stats_pct_exact" -> (4.7, 12.0),
    "stats_pct_approx" -> (6.0, 10.4),
    "stats_pct_exact_skew" -> (4.8, 9.4),
    "stats_pct_approx_skew" -> (5.9, 11.0))

  /** Ops too expensive to burn on a window that cannot certify (r18
    * verdict task 2): heat MULTIPLIES cost (r18 ran a calm-band-5.6-8.8
    * sessionize for 32.9 s and a calm-band-11.8-22 ngram_lm_score for
    * 65.7 s on refused windows — ~100 s of a 609 s budget producing two
    * contended, unusable datapoints while 8 of 10 families got nothing
    * isolated). An UNGATED attempt whose own pre-probe exceeds the
    * stamping bound skips these ops — the bracket (heat evidence) and
    * the cheap ops still publish; the banked budget buys breadth. */
  private[graft] val HotSkipCalmSecs = 5.0
  val hotSkipOps: Set[String] =
    calmBands.collect { case (k, (lo, _)) if lo >= HotSkipCalmSecs => k }.toSet

  /** CALIBRATION PROBE: a fixed seeded CPU+shuffle workload. Kept as a
    * machine sanity line only (NOT a normalizer — see the scaladoc
    * above): each family samples it once before and once after its ops,
    * so the merged min brackets the whole stress run's machine floor. */
  def probeOnce(spark: SparkSession): Double = {
    System.gc()
    val t0 = System.nanoTime()
    spark.range(0, 200000000L, 1, 32)
      .select(xxhash64(xxhash64(col("id"), lit(42))).as("h"))
      .groupBy(pmod(col("h"), lit(1024)).as("b"))
      .agg(sum(col("h"))).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** The probe sample that enters a family's BRACKET must measure the
    * machine, not the JVM: in a fresh forked worker the first probe run
    * pays the probe's own JIT/codegen (it read 4-10× the calm floor on a
    * verifiably idle machine — structurally indistinguishable from real
    * contention), so one unrecorded run warms it before the recorded
    * sample. In an already-warm JVM the extra run costs ~1 s and changes
    * nothing. */
  def probeWarmed(spark: SparkSession): Double = {
    probeOnce(spark): Unit
    probeOnce(spark)
  }

  /** Mutable result sink for one family run. `deferred` = the pre-flight
    * heat gate ([[runFamilyIfCalm]]) refused to run the ops: the box was
    * hot at family start, so the only samples are the (hot) probes. */
  final class Results {
    val consts = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    var deferred: Boolean = false
    /** Selected ops NOT run because the attempt's own pre-probe was over
      * the stamping bound and the op is in [[hotSkipOps]] (r18 task 2) —
      * the audit trail for a family whose published arm is missing its
      * heavy keys this run. */
    val hotSkipped = scala.collection.mutable.ArrayBuffer.empty[String]
  }

  /** Pre-flight heat gate (r16 verdict task 1): a family whose pre-probe
    * already exceeds the stamping bound ([[Bench.StampRefMult]] × the
    * calm-floor reference) CANNOT produce a certifiable bracket no matter
    * how its ops run — running them would burn minutes of stress budget
    * on a window that is certain to be flagged (r16's events family cost
    * ~400 s of a 600 s budget exactly this way, probes 2.7-3.2 vs calm
    * 0.684, squeezing 8 of 10 families out of the run). Instead: confirm
    * the heat with ONE more probe (a single noisy sample must not defer a
    * calm box), and if still hot return a `deferred` result (~probe cost
    * only, ~20-30 s with JVM startup vs minutes of hot ops) so [[Bench]]
    * re-attempts the family at the END of the stress phase — heat is
    * temporally correlated, and the end of the run is the cheapest
    * de-correlation available. The retry runs UNGATED: on a box that
    * never calms, datapoints still get produced and the bracket logic
    * classifies them — the failure mode degrades to the r16 behavior,
    * never below it. `floorRef <= 0` (no calm history) never defers. */
  def runFamilyIfCalm(spark: SparkSession, family: String, sfDir: String,
      stressCopies: Int, semCopies: Int, runs: Int,
      ops: Seq[String], floorRef: Double,
      stampRef: Double = -1.0): Results = {
    // the tie-break reference is allowed to differ from the deferral
    // gate's (the worker CLI carries them separately); callers that
    // don't distinguish get the gate ref for both (r18 review finding —
    // the gated path used to hardwire stampRef = floorRef, silently
    // ignoring the CLI's arg 5)
    val effStampRef = if (stampRef > 0) stampRef else floorRef
    val bound = Bench.StampRefMult * floorRef
    val p1 = probeWarmed(spark)
    if (floorRef > 0 && p1 > bound) {
      val p2 = probeOnce(spark)
      if (p2 > bound) {
        val res = new Results
        res.deferred = true
        res.samples("probe") = Vector(p1, p2)
        res
      } else runFamily(spark, family, sfDir, stressCopies, semCopies,
        runs, ops, preProbe = Some(p2), stampRef = effStampRef)
    } else runFamily(spark, family, sfDir, stressCopies, semCopies,
      runs, ops, preProbe = Some(p1), stampRef = effStampRef)
  }

  private val hotText = "common boilerplate navigation header about contact " +
    "privacy terms copyright all rights reserved site map search login"

  /** Run one family's datapoints. `runs` samples per op (min is the
    * contention-robust statistic — noise only ever adds time); a probe
    * sample before and after the family brackets its machine floor.
    * `ops` restricts which of the family's datapoints run this time
    * (empty = all — the pre-arm-rotation behavior); unselected ops emit
    * nothing, so the published stress block only ever carries keys that
    * really ran.
    *
    * `stampRef` (> 0) arms the TIE-BREAKER (r17 verdict task 1,
    * [[Bench.tieBreakNeeded]]): a bracket straddling the 1.25× stamping
    * bound takes ONE confirmation probe on the hot side before the
    * refusal stands — a single GC/co-tenant blip must not veto a
    * certification the other two samples support. Separate from the
    * deferral gate's `floorRef` on purpose: UNGATED re-attempts (the
    * path where stamping actually lands on a hot round) still deserve
    * the tie-breaker. */
  def runFamily(spark: SparkSession, family: String, sfDir: String,
      stressCopies: Int, semCopies: Int, runs: Int,
      ops: Seq[String] = Seq.empty,
      preProbe: Option[Double] = None,
      stampRef: Double = -1.0): Results = {
    val res = new Results
    val preSelected: String => Boolean =
      if (ops.isEmpty) _ => true else ops.toSet
    // HOT-WINDOW HEAVY-ARM SKIP (r18 verdict task 2): this attempt's own
    // pre-probe over the stamping bound means the bracket is already
    // refused — running a heavy op buys a datapoint that can only be
    // flagged contended (r18: sessionize 32.9 s vs band 5.6-8.8,
    // ngram_lm_score 65.7 s vs 11.8-22). Heavy ops are skipped; cheap
    // ops and the bracket still publish. Only the UNGATED paths reach
    // here hot (the deferral gate refuses hot windows outright), so
    // this is exactly the end-of-phase re-attempt/retry budget burn.
    // Like the deferral gate, a single noisy sample must not cost a calm
    // box its heavy arms (r19 review finding 2): a hot raw pre-probe
    // earns ONE confirmation probe — calm confirmation wins the window
    // (and becomes the bracket's pre side, the runFamilyIfCalm p2
    // convention); the overruled raw sample stays in the published
    // vector (middle position — the parent reads the bracket as
    // (head, last)) for the floor population and the audit trail.
    val rawPre = preProbe.getOrElse(probeWarmed(spark))
    val (probePre, preExtra, hotWindow) =
      if (stampRef > 0 && rawPre > Bench.StampRefMult * stampRef) {
        val confirm = probeOnce(spark)
        if (confirm > Bench.StampRefMult * stampRef)
          (rawPre, Vector(confirm), true) // 2-of-2 hot
        else (confirm, Vector(rawPre), false) // blip loses its veto
      } else (rawPre, Vector.empty[Double], false)
    val selected: String => Boolean = k =>
      preSelected(k) && {
        val skip = hotWindow && hotSkipOps(k)
        if (skip && !res.hotSkipped.contains(k)) res.hotSkipped += k
        !skip
      }
    def timed(key: String)(f: => Long): Unit = if (selected(key)) {
      val xs = (0 until runs).map { _ =>
        System.gc() // settle: don't bill a prior op's garbage to this one
        val t0 = System.nanoTime()
        val ok = try { f; true } catch { case _: Throwable => false }
        // stop the clock BEFORE the between-sample housekeeping: the
        // cache clear/drain is fixture bookkeeping, not op cost (Bench's
        // query loop already clears outside its timed region — r16
        // review finding; op mins may read marginally lower than r15's)
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.core.CacheRegistry.drain()
        if (ok) elapsed else -1.0
      }.toVector
      res.samples(key) = xs
    }
    def bigDocsOf(d1: DataFrame): DataFrame =
      (0 until stressCopies).map(i => d1.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text")))
        .reduce(_ union _)

    family match {
      case "dedup" =>
        val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
        val bigDocs = bigDocsOf(d1)
        res.consts("doc_copies") = stressCopies.toDouble
        timed("minhash")(
          graft.ml.Dedup.minhashPairs(bigDocs, "text", "doc_id").count())
        timed("hamming64_drop")(
          graft.ml.Dedup.dropDuplicatesHamming64(bigDocs, "text", "doc_id").count())
        timed("passage")(
          graft.ml.Dedup.duplicatedPassages(bigDocs, "text", "doc_id").count())
        // the REWRITE form (ExactSubstr removal): detection plus the
        // spans join-back and token-filter rebuild — the additional cost
        // of rewriting documents instead of flagging them. head() (NOT
        // count): under count() Catalyst proves the spans left join
        // row-preserving (grouped right side → distinct keys, no right
        // column referenced) and ELIMINATES the whole detection subtree —
        // the measured op would be a corpus scan
        timed("passage_strip")(
          graft.ml.Dedup.stripDuplicatedPassages(bigDocs, "text", "doc_id")
            .agg(sum(length(col("text")))).head().getLong(0))
        // SKEWED twin (VERDICT r7 task 7): 1% of docs collapse onto one
        // boilerplate text — the hot exact-dup cluster real crawls have.
        // The star-reduction inside the fused drop keeps this linear; the
        // uniform/skew ratio is the driver-visible regression guard.
        val skewDocs = bigDocs.withColumn("text",
          when(pmod(col("doc_id"), lit(100)) === 0, lit(hotText))
            .otherwise(col("text")))
        timed("hamming64_drop_skew")(
          graft.ml.Dedup.dropDuplicatesHamming64(skewDocs, "text", "doc_id").count())
        // star-reduced pair enumeration over the same hot cluster (the raw
        // list is C(5000,2)=12.5M pairs — quadratic by contract;
        // collapse_exact is the at-scale form the clustered stage uses)
        timed("minhash_skew_collapse")(
          graft.ml.Dedup.minhashPairs(skewDocs, "text", "doc_id",
            collapseExact = true).count())

      case "store" =>
        // INCREMENTAL STORE (VERDICT r7 task 3): a seen store ~16× the
        // daily increment. The recurring per-day cost is store_drop —
        // one store scan + Bloom-prefiltered broadcast probes, never a
        // store shuffle — and must sit far below store_build (the
        // one-time backfill, whose anti-join + bloom build DO
        // scan/shuffle the corpus).
        val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
        val bigDocs = bigDocsOf(d1)
        res.consts("doc_copies") = stressCopies.toDouble
        val storeRoot = java.nio.file.Files
          .createTempDirectory("graft-stress-store").toString
        // fresh store per sample — a re-append to the same store is a
        // no-op (anti-join drops everything), and best-of-N would then
        // report the no-op as the "build" cost
        var storeN = 0
        timed("store_build") {
          storeN += 1
          graft.ml.Dedup.appendToSeenStore(bigDocs, "text", s"$storeRoot/fps$storeN")
        }
        val storeDir = s"$storeRoot/fps$storeN"
        val increment = bigDocs
          .filter(pmod(col("doc_id"), lit(20)) === 0) // seen texts, fresh ids
          .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
          .union(d1.select((col("doc_id") + lit(950000000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", "zz_$1").as("text"))) // unseen
        timed("store_drop")(
          graft.ml.Dedup.dropSeenStore(increment, storeDir, "text").count())
        // NEAR STORE + SKEWED INCREMENT (VERDICT r9 stretch 8): the banded
        // store probe DISTINCTs increment fingerprints before the join, so
        // a boilerplate-heavy increment (99% of rows one hot text — the
        // shape a crawler re-visiting a template site produces) must cost
        // ≈ the uniform increment, not multiply the probe.
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

      case "index" =>
        // INVERTED INDEX at 100×, uniform vs stop-word twin: the copies'
        // word-prefix salting makes every token copy-local (uniform); the
        // skew twin appends one shared token to EVERY doc — a 500k-row
        // posting chain for a single key, the stop-word shape. The df path
        // collapses it map-side (partial agg) and the rank path cuts it
        // map-side (WindowGroupLimit Partial), so skew/uniform must stay
        // ≈1 — the guard that neither path ever funnels a stop-word's
        // full chain through one reducer.
        val bigDocs = bigDocsOf(spark.read.parquet(s"$sfDir/documents.parquet"))
        res.consts("doc_copies") = stressCopies.toDouble
        timed("inverted_index")(
          graft.ml.TextAnalysis.invertedIndex(bigDocs, "text", "doc_id",
            minDf = 2L, maxPostings = 100).count())
        timed("inverted_index_stopword")(
          graft.ml.TextAnalysis.invertedIndex(
            bigDocs.withColumn("text", concat(col("text"), lit(" thetoken"))),
            "text", "doc_id", minDf = 2L, maxPostings = 100).count())

      case "vec" =>
        val e1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val bigVecs = (0 until semCopies).map(i => e1.select(
          (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          transform(col("embedding"), x => x * (1.0f + i / 128.0f)).as("embedding")))
          .reduce(_ union _)
        res.consts("vec_copies") = semCopies.toDouble
        timed("semdedup")(
          graft.ml.Similarity.semanticDedup(bigVecs, "embedding", "vec_id",
            numCells = 16, threshold = 0.95, maxCellSize = 2000L).count())

      case "media" =>
        // MULTIMODAL HEADER THROUGHPUT: synthesize-and-decode a mixed
        // audio/video corpus (WAV/MP4/FLAC/Ogg/WebM by id%5 — PNG excluded
        // because ImageIO *encode* would dominate the fixture side) fused
        // in one pass. The decoders are header-only, so this is the
        // per-row fixed cost a 100 TB media scan pays; a regression here
        // means a decoder started reading payload bytes.
        val bigDocs = bigDocsOf(spark.read.parquet(s"$sfDir/documents.parquet"))
        res.consts("doc_copies") = stressCopies.toDouble
        val mm = graft.ml.Multimodal
        val ids = bigDocs.select(col("doc_id"))
        def cls(m: Int) = ids.filter(pmod(col("doc_id"), lit(5)) === m)
        val bigMedia = mm.synthesizeWavs(cls(0), "doc_id")
          .unionByName(mm.synthesizeMp4s(cls(1), "doc_id"))
          .unionByName(mm.synthesizeFlacs(cls(2), "doc_id"))
          .unionByName(mm.synthesizeOggs(cls(3), "doc_id"))
          .unionByName(mm.synthesizeMkvs(cls(4), "doc_id"))
        // head(), not count(): under count() Catalyst prunes the summed
        // column (and with it any prunable work above the scan); head()
        // forces the aggregate's VALUE, the honest throughput measure
        timed("decode_headers")(
          mm.decodePartitions(bigMedia, mm.HeaderDecoder)
            .agg(sum(col("meta.duration_ms"))).head().getLong(0))
        // PIXEL-DECODE THROUGHPUT: reads EVERY payload byte — full PNG
        // decode plus the aHash/dHash reduction. The fixture is
        // PNG-*encode*-heavy, so it is built and checkpointed OUTSIDE the
        // timed region (the localCheckpoint survives the between-sample
        // cache clears); the datapoint times decode+hash only.
        if (selected("decode_pixels")) { // the checkpoint build is eager
          val bigPngs = mm.synthesizeImageVariants(
            bigDocs.select(col("doc_id")), "doc_id").localCheckpoint()
          timed("decode_pixels")(
            mm.decodeImagePixels(bigPngs)
              .agg(sum(col("px.px_sum"))).head().getLong(0))
        }

      case "events" =>
        // AS-OF JOIN + SESSIONIZE at 100×: both ops are one keyed exchange
        // plus a per-partition sort, so cost should scale ~linearly in
        // rows per key. Uniform twin: copies get DISTINCT user_ids (more
        // keys, same chain length). Skew twin: copies KEEP their user_ids,
        // so every per-key chain grows stressCopies× — the long-sort shape
        // a hot entity produces at 100 TB. The uniform/skew ratio is the
        // guard that neither op degrades super-linearly in chain length.
        val ev = graft.core.Tables.load(spark, sfDir, "events")
        def copies(shiftKeys: Boolean) = (0 until stressCopies).map { i =>
          val uid = if (shiftKeys) col("user_id") + lit(i * 1000000L)
                    else col("user_id")
          ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
            uid.as("user_id"), col("ts"), col("event_type"), col("value"))
        }.reduce(_ union _)
        val bigEv     = copies(shiftKeys = true)
        val bigEvSkew = copies(shiftKeys = false)
        res.consts("event_copies") = stressCopies.toDouble
        def asof(d: DataFrame): Long =
          graft.operators.AsOfJoin.leftAsOf(
            d.select(col("event_id"), col("user_id"), col("ts")),
            d.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value")),
            keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
            valueCols = Seq("value")).count()
        timed("asof")(asof(bigEv))
        timed("asof_skew")(asof(bigEvSkew))
        // head()-consumed sums (the count-pruning audit): session
        // BOUNDARIES drive cardinality so count() ran the gap chain, but
        // the summary aggregates themselves were prunable
        def sess(d: DataFrame): Long =
          graft.operators.Sessionize.summarize(d, "user_id", "ts", 1800L)
            .agg(sum(col("n_events"))).head().getLong(0)
        timed("sessionize")(sess(bigEv))
        timed("sessionize_skew")(sess(bigEvSkew))
        // funnel/retention at 100×: the funnel's per-user DP folds a
        // 100×-longer matched-event list under skew (same users, all
        // copies) — the guard that the fold stays linear in list length
        // head(), not count: funnel groups by user alone, so count()
        // pruned the per-user DP FOLD — the op under test
        def funnelOf(d: DataFrame): Long =
          graft.operators.Funnel.windowFunnel(d, "user_id", "ts",
            Seq(col("event_type") === "view", col("event_type") === "click",
              col("event_type") === "purchase"), 86400L)
            .agg(sum(col("funnel_level"))).head().getLong(0)
        timed("funnel")(funnelOf(bigEv))
        timed("funnel_skew")(funnelOf(bigEvSkew))
        timed("retention")(
          graft.operators.Retention.cohorts(bigEv, "user_id", "ts",
            col("event_type") === "signup", 604800L, 8).count())

      case "graph" =>
        // PAGERANK: 5 iterations of join + partial-agg over a
        // 2-edges-per-doc list. Uniform twin: residue-rule targets spread
        // in-degree. Hub twin: HALF of all edges point at one host — the
        // in-degree skew real webgraphs have. Map-side combine must absorb
        // the hub's rank-mass sum before the shuffle; the uniform/hub
        // ratio is the guard that a hot host never funnels its full
        // in-edge list through one reducer.
        // EXPLICIT cap at 50 copies (recorded as graph_copies, the langid
        // precedent): the r13 head()-consumed definition measures the
        // real iterative rank arithmetic (count() had pruned it — r12's
        // 13.9 s was the join lattice only, the honest 100-copy cost is
        // ~55 s/run), and 3 runs × 2 twins at 100 copies would add ~10
        // driver-minutes for no extra signal.
        val graphCopies = math.min(stressCopies, 50)
        val bigDocs = bigDocsOf(spark.read.parquet(s"$sfDir/documents.parquet"))
          .filter(col("doc_id") < graphCopies * 10000000L)
        res.consts("graph_copies") = graphCopies.toDouble
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
          // driverEdgeLimit 0: this arm certifies the DISTRIBUTED
          // iterative loop (its calm bands are the r13-r18 history of
          // that path); the r19 bounded driver fast path would flip on
          // near the copied corpus's ~1M edges and change what the
          // datapoint measures
          graft.ml.LinkGraph.pageRank(d, "src", "dst", driverEdgeLimit = 0L)
            .agg(sum("rank_scaled")).head().getLong(0)
        timed("pagerank")(rank(edges(hub = false)))
        timed("pagerank_hub")(rank(edges(hub = true)))

      case "langid" =>
        // LANGID: train + classify fused over the copied corpus (labels
        // synthesized — this measures the training explode/rank and the
        // in-row classify map, not accuracy). EXPLICIT cap at 20 copies
        // (recorded as langid_copies): the r11 window-join classify was
        // ~90 s/run at 100; kept at 20 so the datapoint stays comparable.
        val bigDocs = bigDocsOf(spark.read.parquet(s"$sfDir/documents.parquet"))
        val langidCopies = math.min(stressCopies, 20)
        val labeled = bigDocs
          .filter(col("doc_id") < langidCopies * 10000000L)
          .withColumn("lang",
            concat(lit("l"), pmod(col("doc_id"), lit(5)).cast("string")))
        res.consts("langid_copies") = langidCopies.toDouble
        timed("langid") {
          val prof = graft.ml.LangId.trainProfiles(labeled, "text", "lang")
          graft.ml.LangId.classify(labeled, "text", "doc_id", prof).count()
        }

      case "token" =>
        // TOKENIZATION at 100×: the per-row scan cost every token-budget
        // (bpe_encode) and perplexity (ngram_lm_score) pass pays at
        // 100 TB. Both kernels run the model as plan literals /
        // model-as-frame; a regression here means the plan-literal fold
        // kernels started paying per-row constant costs. Models are
        // trained on the BASE corpus outside the timed region (fixture,
        // deterministic) — the datapoints time ENCODE/SCORE only.
        val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
        val bigDocs = bigDocsOf(d1)
        res.consts("doc_copies") = stressCopies.toDouble
        if (selected("bpe_encode")) { // training is eager (driver merges)
          val merges = graft.ml.Bpe.train(d1, "text", numMerges = 200,
            maxWords = 20000)
          // head(), not count(): the token-count column is a pure
          // projection — count() would prune the BPE kernel entirely and
          // time a bare parquet scan
          timed("bpe_encode")(
            graft.ml.Bpe.tokenCount(bigDocs, "text", merges)
              .agg(sum(col("n_bpe_tokens"))).head().getLong(0))
        }
        if (selected("ngram_lm_score")) {
          // localCheckpoint: the model frame must survive the
          // between-sample cache clears and not re-derive inside the
          // timed region
          val model = graft.ml.NgramLm.train(d1, "text", order = 3,
            minCount = 2).localCheckpoint()
          // head() + sum_prob: the scoring FOLDS are projections over the
          // per-doc lattice — count() would run the lattice for
          // cardinality but prune the folds, under-measuring the kernel
          timed("ngram_lm_score")(
            graft.ml.NgramLm.score(bigDocs, model, "text", "doc_id", order = 3)
              .agg(sum(col("sum_prob"))).head().getDouble(0).toLong)
        }

      case "metrics" =>
        // QUANTILES at 100×: exact per-group percentile buffers every
        // value; the GK sketch caps the buffer at `accuracy`. Copies KEEP
        // ts/event_type (per-(window × type) counts grow 100×); the skew
        // twin collapses a third of all rows onto ONE (window, type) —
        // the hot latency key every metrics pipeline has. The guards:
        // approx must not cost more than exact on the same data, and
        // approx_skew must stay ≈ approx (the sketch is size-oblivious)
        // while exact_skew pays the hot group's full sort.
        val ev = graft.core.Tables.load(spark, sfDir, "events")
        val big = (0 until stressCopies).map(i =>
          ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
            col("ts"), col("event_type"), col("value"))).reduce(_ union _)
        val bigSkew = big
          .withColumn("ts", when(pmod(col("event_id"), lit(3)) === 0,
            to_timestamp(lit("2024-01-01 00:00:00"))).otherwise(col("ts")))
          .withColumn("event_type", when(pmod(col("event_id"), lit(3)) === 0,
            lit("hot")).otherwise(col("event_type")))
        res.consts("event_copies") = stressCopies.toDouble
        // head()-consumed p99 sum: count() would prune the quantile
        // aggregates themselves (the head()-consumed-sums audit) and
        // time only the grouping lattice
        def pct(d: DataFrame, approx: Boolean): Long =
          graft.operators.LinkStatsMetric.batch(
            graft.operators.LinkMetric.Config("event_type->value",
              batchWindowSec = 3600, tsColumn = "ts",
              percentiles = Seq(0.5, 0.99), percentilesApprox = approx,
              approxAccuracy = 10000))(d)
            .agg(sum(col("p99"))).head().getDouble(0).toLong
        timed("stats_pct_exact")(pct(big, approx = false))
        timed("stats_pct_approx")(pct(big, approx = true))
        timed("stats_pct_exact_skew")(pct(bigSkew, approx = false))
        timed("stats_pct_approx_skew")(pct(bigSkew, approx = true))

      case other => sys.error(s"unknown stress family '$other' " +
        s"(known: ${families.map(_._1).mkString(", ")})")
    }
    // bracket tie-breaker (r17 verdict task 1): one straddling sample
    // earns one confirmation probe; 2-of-3 decides. The resolved vector
    // keeps every raw sample (floor population + audit trail); the
    // parent reads the bracket as (head, last), so the pre-side
    // confirmation's overruled sample (preExtra) splices into the
    // MIDDLE — bracket semantics untouched, no sample lost.
    val probePost = probeOnce(spark)
    val resolved =
      if (Bench.tieBreakNeeded(probePre, probePost, stampRef))
        Bench.resolveTieBreak(probePre, probePost, probeOnce(spark), stampRef)
      else Vector(probePre, probePost)
    res.samples("probe") = resolved.head +: (preExtra ++ resolved.tail)
    res
  }
}
