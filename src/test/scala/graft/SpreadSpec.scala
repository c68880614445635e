package graft

import org.apache.spark.sql.functions._

/** Pins the r20 row-aware spread cap (graft.core.Spread): the session
  * shuffle-partition pin stays the ceiling, the measured rows-per-task
  * floor caps tiny inputs, and the cap disappears as input grows — a
  * constant-count regression (local-mode special case) or a cap that
  * binds at scale would both fail here. */
class SpreadSpec extends SparkSpec {

  test("cappedParts: pure cap rule") {
    import graft.core.Spread.cappedParts
    // default (minRowsPerTask <= 1): always the session pin
    assert(cappedParts(32, 10, 1L) == 32)
    assert(cappedParts(32, 0, 0L) == 32)
    // tiny input: ceil(est / minRows), floor 1
    assert(cappedParts(32, 5000, 1024L) == 5)
    assert(cappedParts(32, 1, 1024L) == 1)
    assert(cappedParts(32, 0, 1024L) == 1)
    // exact multiples and the ceil edge
    assert(cappedParts(32, 2048, 1024L) == 2)
    assert(cappedParts(32, 2049, 1024L) == 3)
    // large input: the cap stops binding — full session pin
    assert(cappedParts(32, 1L << 40, 1024L) == 32)
    // session pin is always the ceiling
    assert(cappedParts(8, 1L << 40, 1024L) == 8)
  }

  test("byKey: default keeps the full session pin; row-aware caps a tiny frame") {
    import spark.implicits._
    val df = (0L until 64L).toDF("id")
    val full = graft.core.Spread.byKey(df, col("id"))
    assert(full.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    // row-aware: a 64-row in-memory frame (known row count via stats)
    // under a large floor collapses to one task
    val capped = graft.core.Spread.byKey(df, col("id"), 1L << 20)
    assert(capped.rdd.getNumPartitions == 1)
    // rows are partitioning-invariant
    assert(capped.as[Long].collect().sorted.toSeq == (0L until 64L))
  }
}
