package graft

/** The pre-flight heat gate (r16 verdict task 1): a stress family whose
  * pre-probe exceeds the stamping bound must be DEFERRED (ops skipped,
  * ~probe cost only) so Bench can re-attempt it at the end of the stress
  * phase, and a calm or reference-less box must never defer. Exercised
  * with extreme floorRef values because a genuinely hot box cannot be
  * manufactured in a test; the local bench rehearsal covers the calm
  * path end-to-end. Ops lists name no real op so a non-deferred run
  * costs only its bracketing probes. */
class StressGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("hot pre-probe defers: no ops run, probe evidence kept") {
    // any real probe reads >> 1.25 × 1e-6: the gate must fire after its
    // one confirmation probe and return ONLY the two hot probe samples
    val res = StressOps.runFamilyIfCalm(spark, "index", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("no_such_op"), floorRef = 1e-6)
    assert(res.deferred)
    assert(res.samples.keySet === Set("probe"))
    assert(res.samples("probe").size === 2)
    assert(res.samples("probe").forall(_ > 0))
    assert(res.consts.isEmpty)
  }

  test("calm pre-probe (huge reference) and absent reference never defer") {
    // floorRef so large every probe is under the bound → gate passes
    // through to runFamily, which reuses the gate's probe as its pre
    // sample (no re-probe) and brackets with a post sample
    val calm = StressOps.runFamilyIfCalm(spark, "index", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("no_such_op"), floorRef = 1e9)
    assert(!calm.deferred)
    assert(calm.samples("probe").size === 2)
    // no calm history (first run seeds the reference) → ungated
    val seed = StressOps.runFamilyIfCalm(spark, "index", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("no_such_op"), floorRef = -1.0)
    assert(!seed.deferred)
  }

  test("hot ungated attempt skips heavy arms, keeps cheap arms and the " +
      "bracket (r18 task 2)") {
    // stampRef 1e-6: any real probe reads over the bound → hot window.
    // The UNGATED path (runFamily directly — the end-of-phase re-attempt
    // r18 burned 32.9 s of sessionize on) must skip the heavy op, run
    // the cheap one, and record the skip for the audit trail.
    val res = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 1,
      ops = Seq("asof", "sessionize"), stampRef = 1e-6)
    assert(res.samples.contains("asof"), "cheap arm must still run")
    assert(!res.samples.contains("sessionize"), "heavy arm must be skipped")
    assert(res.hotSkipped.toSeq === Seq("sessionize"))
    assert(res.samples("probe").size >= 2, "bracket still publishes")
    // calm window (huge reference): nothing is skipped
    val calm = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 1,
      ops = Seq("asof", "sessionize"), stampRef = 1e9)
    assert(calm.samples.contains("sessionize"))
    assert(calm.hotSkipped.isEmpty)
    // no reference at all (seed run) → ungated AND unskipped
    val seed = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 1,
      ops = Seq("sessionize"), stampRef = -1.0)
    assert(seed.samples.contains("sessionize"))
    assert(seed.hotSkipped.isEmpty)
  }

  test("hot-skip confirmation probe rides the published vector in the " +
      "middle — bracket (head, last) semantics intact (r19 review fix 2)") {
    // stampRef 1e-6: raw pre-probe AND its confirmation both read hot
    // (2-of-2) → skip stands, and the vector carries THREE samples:
    // head = raw pre, middle = the confirmation, last = post. The
    // parent's bracket (head, last) never reads the extra sample.
    val hot = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("sessionize"), stampRef = 1e-6)
    val v = hot.samples("probe")
    assert(v.size === 3, s"expected (pre, confirm, post), got $v")
    assert(v.forall(_ > 0))
    // calm window (huge reference): no confirmation taken — two samples
    val calm = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("no_such_op"), stampRef = 1e9)
    assert(calm.samples("probe").size === 2)
    // no reference: the pre-r19 two-sample shape, untouched
    val seed = StressOps.runFamily(spark, "events", sfDir,
      stressCopies = 1, semCopies = 1, runs = 0,
      ops = Seq("no_such_op"), stampRef = -1.0)
    assert(seed.samples("probe").size === 2)
  }
}
