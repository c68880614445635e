package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DebugStoreSpec extends SparkSpec {

  test("debug store_drop at bench scale") {
    val sfDir = "/root/testdata/sf0.1"
    val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val bigDocs = (0 until 100).map(i => d1.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text")))
      .reduce(_ union _)
    val storeRoot = java.nio.file.Files
      .createTempDirectory("graft-debug-store").toString
    val store = s"$storeRoot/fps"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DBG $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("build")(Dedup.appendToSeenStore(bigDocs, "text", store))
    val increment = bigDocs
      .filter(pmod(col("doc_id"), lit(20)) === 0)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
      .union(d1.select((col("doc_id") + lit(950000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "zz_$1").as("text")))
    t("inc_count")(println("  rows=" + increment.count()))
    t("inc_fp_distinct")(println("  fps=" + increment
      .select(md5(col("text").cast("string")).as("fp")).distinct().count()))
    t("store_scan")(println("  store=" + spark.read.parquet(store).count()))
    t("drop_total")(println("  kept=" +
      Dedup.dropSeenStore(increment, store, "text").count()))
    t("drop_again")(println("  kept=" +
      Dedup.dropSeenStore(increment, store, "text").count()))
  }
}
