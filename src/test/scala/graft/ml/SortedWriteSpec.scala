package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedWriteSpec extends SparkSpec {
  import spark.implicits._

  lazy val corpus = (0L until 1000L).map(i => (i, s"doc $i body", s"src${i % 4}"))
    .toDF("doc_id", "text", "source")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dataFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))

  test("writeRangeSorted round-trips content exactly into `files` files") {
    val out = tmp("graft-sorted")
    DatasetOps.writeRangeSorted(corpus, "doc_id", out, files = 4)
    assert(dataFiles(out).size == 4)
    val back = spark.read.parquet(out)
      .as[(Long, String, String)].collect().toSet
    assert(back == corpus.as[(Long, String, String)].collect().toSet)
  }

  test("files cover disjoint key ranges and are internally sorted") {
    val out = tmp("graft-sorted")
    DatasetOps.writeRangeSorted(corpus, "doc_id", out, files = 4)
    val audit = DatasetOps.auditFileRanges(spark, out, "doc_id")
      .as[(Int, Long, Boolean)].collect().sortBy(_._1)
    assert(audit.map(_._1).toSeq == (1 to 4))
    assert(audit.forall(_._3), s"overlapping file ranges: ${audit.mkString(", ")}")
    assert(audit.map(_._2).sum == 1000L)
    // in-file order: each file read alone must be ascending
    dataFiles(out).foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").as[Long].collect().toSeq
      assert(ids == ids.sorted, s"${f.getName} not internally sorted")
    }
  }

  test("maxRecordsPerFile rolls oversized partitions, ranges stay disjoint") {
    val out = tmp("graft-sorted")
    DatasetOps.writeRangeSorted(corpus, "doc_id", out, files = 2,
      maxRecordsPerFile = 200L)
    val files = dataFiles(out)
    assert(files.size > 2, s"expected rolled files, got ${files.size}")
    val audit = DatasetOps.auditFileRanges(spark, out, "doc_id")
      .as[(Int, Long, Boolean)].collect()
    assert(audit.forall(_._3), "rolled files must still be disjoint")
    assert(audit.map(_._2).sum == 1000L)
  }

  test("overwrite mode makes re-export idempotent") {
    val out = tmp("graft-sorted")
    DatasetOps.writeRangeSorted(corpus, "doc_id", out, files = 3)
    DatasetOps.writeRangeSorted(corpus, "doc_id", out, files = 3)
    assert(spark.read.parquet(out).count() == 1000L)
    assert(dataFiles(out).size == 3)
  }
}
