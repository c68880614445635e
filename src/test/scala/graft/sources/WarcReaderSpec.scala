package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcReaderSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rec(uri: String, body: String): Array[Byte] =
    WarcReader.responseRecord(uri, "2026-01-01T00:00:00Z",
      s"<urn:uuid:${uri.hashCode}>", body.getBytes("UTF-8"))

  test("plain .warc: response records parse with HTTP envelope split") {
    val dir = tmpDir("warc-plain")
    val bytes = rec("http://a.example/1", "hello world") ++
      rec("http://a.example/2", "second doc")
    Files.write(Paths.get(dir, "f.warc"), bytes)

    val df = WarcReader.read(spark, s"$dir/*.warc")
    val rows = df.orderBy("record_index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("warc_type") == "response")
    assert(rows(0).getAs[String]("target_uri") == "http://a.example/1")
    assert(rows(0).getAs[Int]("http_status") == 200)
    assert(rows(0).getAs[String]("http_content_type") == "text/plain")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "second doc")
    assert(!rows(0).getAs[Boolean]("truncated"))
  }

  test(".warc.gz: concatenated per-record gzip members decode as one stream") {
    val dir = tmpDir("warc-gz")
    val bytes = WarcReader.gzipMember(rec("http://b.example/1", "alpha")) ++
      WarcReader.gzipMember(rec("http://b.example/2", "beta")) ++
      WarcReader.gzipMember(rec("http://b.example/3", "gamma"))
    Files.write(Paths.get(dir, "f.warc.gz"), bytes)

    val got = WarcReader.read(spark, s"$dir/*.warc.gz")
      .select("target_uri").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(got.toSeq == Seq("http://b.example/1", "http://b.example/2",
      "http://b.example/3"))
  }

  test("non-response records keep raw payload; unknown junk between records skipped") {
    val dir = tmpDir("warc-mixed")
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\nContent-Length: 9\r\n\r\n" +
      "robots: x\r\n\r\n").getBytes("ISO-8859-1")
    val bytes = info ++ "\r\n\r\n".getBytes("ISO-8859-1") ++
      rec("http://c.example/1", "doc")
    Files.write(Paths.get(dir, "f.warc"), bytes)

    val rows = WarcReader.read(spark, s"$dir/*.warc").orderBy("record_index")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("warc_type") == "warcinfo")
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), "ISO-8859-1") ==
      "robots: x")
    assert(rows(0).getAs[Any]("http_status") == null)
    assert(rows(1).getAs[String]("warc_type") == "response")
  }

  test("oversize records clip to maxRecordBytes, flag truncated, and do not desync") {
    val dir = tmpDir("warc-trunc")
    val big = "x" * 10000
    val bytes = rec("http://d.example/big", big) ++
      rec("http://d.example/after", "small")
    Files.write(Paths.get(dir, "f.warc"), bytes)

    val rows = WarcReader.read(spark, s"$dir/*.warc", maxRecordBytes = 1024)
      .orderBy("record_index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("truncated"))
    // the NEXT record still parses cleanly — the skip stayed in frame
    assert(rows(1).getAs[String]("target_uri") == "http://d.example/after")
    assert(!rows(1).getAs[Boolean]("truncated"))
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), "UTF-8") == "small")
  }

  test("binary payload bytes survive exactly (content-length framing, no charset)") {
    val dir = tmpDir("warc-bin")
    val body = Array.tabulate[Byte](256)(i => i.toByte)
    val record = WarcReader.responseRecord("http://e.example/bin",
      "2026-01-01T00:00:00Z", "<urn:uuid:1>", body,
      httpContentType = "application/octet-stream")
    Files.write(Paths.get(dir, "f.warc"), record)

    val row = WarcReader.read(spark, s"$dir/*.warc").collect().head
    assert(row.getAs[Array[Byte]]("payload").toSeq == body.toSeq)
  }

  test("WarcWriter: distributed conversion-record export round-trips through the reader") {
    import spark.implicits._
    val dir = tmpDir("warc-write")
    val docs = Seq(
      ("http://w.example/0", "alpha"),
      ("http://w.example/1", "beta"),
      ("http://w.example/2", "gamma"),
      ("http://w.example/3", "delta"))
      .toDF("uri", "text").repartition(3)

    val s = WarcWriter.write(docs, dir, "uri", "text",
      date = "2026-01-01T00:00:00Z").collect()
    assert(s.map(_.getLong(1)).sum == 4L)
    assert(s.length <= 3 && s.forall(_.getLong(2) > 0L))

    val back = WarcReader.read(spark, s"$dir/*.warc.gz")
    val rows = back.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[String]("warc_type") == "conversion"))
    assert(rows.forall(_.getAs[String]("warc_date") == "2026-01-01T00:00:00Z"))
    assert(rows.map(r => r.getAs[String]("target_uri") ->
      new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap ==
      Map("http://w.example/0" -> "alpha", "http://w.example/1" -> "beta",
        "http://w.example/2" -> "gamma", "http://w.example/3" -> "delta"))
    // record ids unique across files
    assert(rows.map(_.getAs[String]("record_id")).distinct.length == 4)
  }

  test("WarcWriter: empty partitions write no file; null text becomes empty body") {
    import spark.implicits._
    val dir = tmpDir("warc-write-empty")
    val docs = Seq(("http://w.example/9", null: String))
      .toDF("uri", "text").repartition(4)
    val s = WarcWriter.write(docs, dir, "uri", "text",
      date = "2026-01-01T00:00:00Z").collect()
    assert(s.length == 1 && s.head.getLong(1) == 1L)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) == 1)
    val row = WarcReader.read(spark, s"$dir/*.warc.gz").collect().head
    assert(row.getAs[Array[Byte]]("payload").isEmpty)
  }

  test("many files fan out one task per file") {
    val dir = tmpDir("warc-many")
    (0 until 5).foreach { i =>
      Files.write(Paths.get(dir, s"f$i.warc"),
        rec(s"http://f.example/$i", s"doc $i"))
    }
    val df = WarcReader.read(spark, s"$dir/*.warc")
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 5)
  }
}
