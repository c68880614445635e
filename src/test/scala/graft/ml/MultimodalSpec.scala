package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.fromText(
    Seq((1L, "hello world payload"), (2L, "another fake image"))
      .toDF("doc_id", "text"),
    "text", "doc_id")

  test("fromText produces binary payload with id and media_type") {
    val r = media.orderBy("media_id").collect()
    assert(r.length == 2)
    assert(new String(r(0).getAs[Array[Byte]]("content"), "UTF-8") == "hello world payload")
    assert(r(0).getString(r(0).fieldIndex("media_type")) == "image")
  }

  test("decodeStub derives deterministic dims from content") {
    val d = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(d(0).getLong(d(0).fieldIndex("byte_len")) == 19L)
    val w = d(0).getInt(d(0).fieldIndex("width"))
    assert(w >= 1 && w <= 512)
    // identical content → identical dims
    val d2 = Multimodal.decodeStub(media).orderBy("media_id").collect()
    assert(d(0).getInt(d(0).fieldIndex("width")) == d2(0).getInt(d2(0).fieldIndex("width")))
  }

  test("featureStub emits dim doubles in [-1, 1)") {
    val f = media.select(Multimodal.featureStub(col("content"), 8).as("f"))
      .as[Seq[Double]].collect()
    assert(f.forall(_.length == 8))
    assert(f.flatten.forall(x => x >= -1.0 && x < 1.0))
  }

  test("frameSampleStub samples n frames of frameBytes each") {
    val frames = media.select(Multimodal.frameSampleStub(col("content"), 3, 4).as("fr"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.length == 3)
    assert(frames.forall(_.length <= 4))
    // first frame starts at byte 1
    assert(new String(frames.head, "UTF-8") == "hell")
  }

  test("binaryFile ingestion: real media files ride as binary + metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.img"), "fake-image-bytes".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.img"), "more-bytes".getBytes("UTF-8"))
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(col("path").as("media_id"), col("content"), lit("image").as("media_type"))
    val decoded = Multimodal.decodeStub(media).orderBy("byte_len").collect()
    assert(decoded.length == 2)
    assert(decoded(0).getLong(decoded(0).fieldIndex("byte_len")) == 10L)
    assert(decoded(1).getLong(decoded(1).fieldIndex("byte_len")) == 16L)
  }

  test("decodePartitions matches decodeStub's expression math") {
    val viaPartitions = Multimodal.decodePartitions(media)
      .select(col("media_id"), col("meta.width").as("w"), col("meta.height").as("h"),
        col("meta.byte_len").as("b"))
      .orderBy("media_id").collect()
    val viaExpr = Multimodal.decodeStub(media)
      .select(col("media_id"), col("width"), col("height"), col("byte_len"))
      .orderBy("media_id").collect()
    viaPartitions.zip(viaExpr).foreach { case (p, e) =>
      assert(p.getInt(1) == e.getInt(1))
      assert(p.getInt(2) == e.getInt(2))
      assert(p.getLong(3) == e.getLong(3))
    }
  }
}
