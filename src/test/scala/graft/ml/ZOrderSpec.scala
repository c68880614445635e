package graft.ml

import graft.SparkSpec
import graft.functions.ZOrderFns
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave kernel: bit placement, masking, null-as-zero") {
    // 2-D: col 0 on even bits, col 1 on odd
    assert(ZOrderFns.interleaveKernel(Array(3L, 0L), 2) == 5L)  // 0b0101
    assert(ZOrderFns.interleaveKernel(Array(0L, 3L), 2) == 10L) // 0b1010
    assert(ZOrderFns.interleaveKernel(Array(3L, 3L), 2) == 15L)
    // out-of-range buckets mask to `bits`, never corrupt neighbors
    assert(ZOrderFns.interleaveKernel(Array(4L, 0L), 2) == 0L)
    // 3-D: bit i of col j lands at i*3+j
    assert(ZOrderFns.interleaveKernel(Array(1L, 1L, 1L), 1) == 7L)
    assert(ZOrderFns.interleaveKernel(Array(0L, 0L, 1L), 2) == 4L)
  }

  test("interleaveBits column matches the kernel and evaluates codegen'd") {
    val df = Seq((3L, 0L), (0L, 3L), (2L, 1L), (255L, 255L))
      .toDF("a", "b")
      .select(ZOrderFns.interleaveBits(Seq(col("a"), col("b")), 8).as("z"))
    assert(df.as[Long].collect().toSeq ==
      Seq(5L, 10L, 6L, ZOrderFns.interleaveKernel(Array(255L, 255L), 8)))
    // null buckets interleave as 0
    val n = Seq((Some(3L), Option.empty[Long])).toDF("a", "b")
      .select(ZOrderFns.interleaveBits(Seq(col("a"), col("b")), 4).as("z"))
    assert(n.as[Long].head() == 5L)
  }

  test("withZValue: equi-width buckets from lazily-broadcast bounds") {
    // domain 0..15, bits=2 -> 4 buckets of width 4
    val df = (0L until 16L).map(i => (i, 15L - i)).toDF("x", "y")
    val z = DatasetOps.withZValue(df, Seq("x", "y"), bits = 2)
    val out = z.select("x", "y", "z").as[(Long, Long, Long)]
      .collect().toSeq.toMap2
    def bucket(v: Long) = (v * 4) / 16
    for (x <- 0L until 16L) {
      val expected = ZOrderFns.interleaveKernel(
        Array(bucket(x), bucket(15L - x)), 2)
      assert(out((x, 15L - x)) == expected, s"x=$x")
    }
    // helper bound columns do not leak
    assert(z.columns.toSet == Set("x", "y", "z"))
  }

  test("withZValue survives the full hashed-long domain (decimal bucket arithmetic)") {
    // withZValue's own error message recommends xxhash64-hashed keys,
    // whose ~2^64 span wrapped the old long arithmetic (max−min+1
    // negative) into a silently random layout (r14 fix)
    val df = Seq(Long.MinValue, -1L, 0L, Long.MaxValue).toDF("x")
    val z = DatasetOps.withZValue(df, Seq("x"), bits = 8)
      .select("x", "z").as[(Long, Long)].collect().toMap
    def expect(b: Long) = ZOrderFns.interleaveKernel(Array(b), 8)
    assert(z(Long.MinValue) == expect(0L))
    assert(z(-1L) == expect(127L))
    assert(z(0L) == expect(128L))
    assert(z(Long.MaxValue) == expect(255L))
  }

  private implicit class Map2[A, B, C](s: Seq[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = s.map(t => (t._1, t._2) -> t._3).toMap
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dataFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))

  // a 32x32 grid: both dimensions uniform, the shape z-order serves
  lazy val grid = (for (a <- 0L until 32L; b <- 0L until 32L)
    yield (a, b, s"row-$a-$b")).toDF("a", "b", "payload")

  test("writeZOrdered round-trips content into `files` files") {
    val out = tmp("graft-zorder")
    DatasetOps.writeZOrdered(grid, Seq("a", "b"), out, files = 4)
    assert(dataFiles(out).size == 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 1024L)
    assert(back.columns.toSet == Set("a", "b", "payload")) // no scratch cols
    assert(back.as[(Long, Long, String)].collect().toSet ==
      grid.as[(Long, Long, String)].collect().toSet)
  }

  test("every file bounds BOTH clustered columns (the pruning contract)") {
    val out = tmp("graft-zorder")
    DatasetOps.writeZOrdered(grid, Seq("a", "b"), out, files = 4)
    val rects = DatasetOps.auditFileRectangles(spark, out, Seq("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rects.length == 4)
    assert(rects.map(_._5).sum == 1024L)
    // z-clustering on a uniform grid must quarter BOTH dimensions'
    // spans, not just the leading key's: every file's span in each
    // dimension is at most ~half the 0..31 domain
    rects.foreach { case (amin, amax, bmin, bmax, _) =>
      assert(amax - amin <= 16, s"a-span [$amin,$amax] did not prune")
      assert(bmax - bmin <= 16, s"b-span [$bmin,$bmax] did not prune")
    }
    // a point predicate on EITHER column alone skips at least half the
    // files — single-key range sorting can only do this for its own key
    def filesCovering(dim: (Long, Long, Long, Long, Long) => (Long, Long),
        point: Long) =
      rects.count { r => val (lo, hi) = dim(r._1, r._2, r._3, r._4, r._5)
        lo <= point && point <= hi }
    assert(filesCovering((alo, ahi, _, _, _) => (alo, ahi), 3L) <= 2)
    assert(filesCovering((_, _, blo, bhi, _) => (blo, bhi), 3L) <= 2)
  }

  test("bits * columns must fit a long; empty columns rejected") {
    intercept[IllegalArgumentException] {
      ZOrderFns.interleaveBits(Seq(col("a"), col("b")), 32)
    }
    intercept[IllegalArgumentException] {
      ZOrderFns.interleaveBits(Seq.empty, 8)
    }
    intercept[IllegalArgumentException] {
      DatasetOps.writeZOrdered(grid, Seq("a", "b"), tmp("z"), files = 0)
    }
    // string keys need an explicit hash-to-long first
    intercept[IllegalArgumentException] {
      DatasetOps.withZValue(grid, Seq("a", "payload"), bits = 4)
    }
  }
}
