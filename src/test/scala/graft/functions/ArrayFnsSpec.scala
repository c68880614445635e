package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayFnsSpec extends SparkSpec {
  import spark.implicits._

  test("dotD matches the aggregate/zip_with fold bit-for-bit") {
    val df = Seq((Array(1.1, 2.2, 3.3), Array(0.5, -0.25, 4.0))).toDF("a", "b")
    val viaHof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)).as[Double].head()
    val viaKernel = df.select(ArrayFns.dotD(col("a"), col("b"))).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(viaHof) ==
      java.lang.Double.doubleToLongBits(viaKernel))
  }

  test("dotD on length-mismatched arrays is NULL, like the composed form") {
    // zip_with pads the shorter side with null → the fold is null; the
    // kernel previously truncated and scored a malformed embedding with
    // a partial dot product (r14 fix)
    val df = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
    assert(df.select(ArrayFns.dotD(col("a"), col("b"))).head().isNullAt(0))
  }

  test("jaccardLong matches array_intersect-based jaccard") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L)),
      (Seq(1L, 2L), Seq(1L, 2L)),
      (Seq(1L), Seq(2L)),
      (Seq.empty[Long], Seq(1L, 2L)),
    ).toDF("a", "b")
    val viaBuiltin = df.select(
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        (size(col("a")) + size(col("b")) - size(array_intersect(col("a"), col("b")))))
        .as("j")).as[Double].collect().toSeq
    val viaKernel = df.select(ArrayFns.jaccardLong(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(viaBuiltin == viaKernel)
  }

  test("minhashBands: identical arrays collide in every band, disjoint ones in none") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L, 40L, 50L)),
      (2L, Seq(10L, 20L, 30L, 40L, 50L)),
      (3L, Seq(77L, 88L, 99L, 111L, 222L)),
    ).toDF("id", "hs")
    val bands = df.select(col("id"), ArrayFns.minhashBands(col("hs"), 64, 32).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L).zip(bands(3L)).count { case (x, y) => x == y } == 0)
    assert(bands(1L).length == 32)
  }

  test("kernels are callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val j = spark.sql(
      "SELECT jaccard_long(array(1L,2L,3L), array(2L,3L,4L)) AS j").collect().head.getDouble(0)
    assert(j == 0.5)
    val d = spark.sql(
      "SELECT dot_d(array(1.0d,2.0d), array(3.0d,4.0d)) AS d").collect().head.getDouble(0)
    assert(d == 11.0)
    val b = spark.sql(
      "SELECT size(minhash_bands(array(1L,2L,3L), 64, 32)) AS n").collect().head.getInt(0)
    assert(b == 32)
    val jt = spark.sql(
      "SELECT jaccard_threshold(array(1L,2L,3L), array(2L,3L,4L), 0.4) AS j,"
        + " jaccard_threshold(array(1L,2L,3L), array(2L,3L,4L), 0.6) AS below")
      .collect().head
    assert(jt.getDouble(0) == 0.5 && jt.isNullAt(1))
    val s32 = spark.sql("SELECT simhash32(array(5L)) AS s").collect().head.getLong(0)
    assert(s32 == 5L) // single hash votes its own low bits
    val s64 = spark.sql(
      "SELECT simhash64(array(4294967296L)) AS s").collect().head.getLong(0)
    assert(s64 == 4294967296L) // bit 32 survives only in the 64-bit variant
  }

  test("kernels survive whole-stage codegen in a realistic plan") {
    val df = (0L until 100L).map(i => (i, Seq.tabulate(20)(j => i * 31L + j)))
      .toDF("id", "hs")
    val out = df.select(col("id"), posexplode(ArrayFns.minhashBands(col("hs"), 64, 16)))
      .groupBy("pos").count().count()
    assert(out == 16)
  }
}
