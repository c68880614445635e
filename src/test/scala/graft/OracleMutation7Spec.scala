package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Gate-layer mutation audit, round 9 (r15 verdict task 5): the
  * byte-level I/O families the program had documented out — WARC header
  * fields and the planted media-container headers — plus the remaining
  * uncovered value-bearing gates (estimator-semantics swap, pooling
  * mode, suffix-match policy, banding pigeonhole, feature config,
  * top-k bound). Same contract as rounds 1-8: seed ONE plausible bug,
  * assert the driver's canonical compare distinguishes it. */
class OracleMutation7Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")

  // ---- WARC: perturb one header byte in the roundtrip ----

  test("q_warc_read: an off-by-one WARC Content-Length truncates every " +
      "payload — the reader's extent must ride the header") {
    assertCaught("q_warc_read") {
      import scala.jdk.CollectionConverters._
      val out = java.nio.file.Files.createTempDirectory("graft-mut-warc")
      val fpath = out.resolve("docs.warc.gz")
      // the gate's writer with the seeded bug: the WARC Content-Length
      // header under-reports the payload by ONE byte (the digit-level
      // header perturbation the verdict asked for) — a conforming
      // reader then surfaces a truncated body on every record
      def buggyRecord(uri: String, body: Array[Byte]): Array[Byte] = {
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
        val payload = http ++ body
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x>\r\n" +
          s"WARC-Target-URI: $uri\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
          s"Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${payload.length - 1}\r\n\r\n") // BUG: -1
          .getBytes("ISO-8859-1") ++ payload ++
          "\r\n\r\n".getBytes("ISO-8859-1")
      }
      val os = java.nio.file.Files.newOutputStream(fpath)
      try {
        docs.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
          .orderBy("doc_id").toLocalIterator().asScala.foreach { r =>
            os.write(graft.sources.WarcReader.gzipMember(buggyRecord(
              s"http://docs.example/${r.getLong(0)}",
              r.getString(1).getBytes("UTF-8"))))
          }
      } finally os.close()
      graft.sources.WarcReader.read(spark, fpath.toString)
        .select(
          regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long")
            .as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"))
    }
  }

  test("q_warc_write: one flipped URI header byte in a written member " +
      "surfaces through the readback") {
    assertCaught("q_warc_write") {
      // the real distributed writer, then ONE header byte flipped in one
      // .warc.gz member on disk — the roundtrip's output must track the
      // actual file bytes, proving the reader re-parses every header
      // rather than echoing the fixture
      val out = java.nio.file.Files.createTempDirectory("graft-mut-warcw")
        .toString
      val summary = graft.sources.WarcWriter.write(
        docs.filter(col("doc_id") < 200)
          .select(concat(lit("http://docs.example/"), col("doc_id")).as("uri"),
            col("text")).repartition(4),
        out, "uri", "text", date = "2026-01-01T00:00:00Z")
      assert(summary.agg(sum("records")).head.getLong(0) == 200L)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).sortBy(_.getName)
      assert(files.nonEmpty)
      val target = files.head
      val raw = {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.FileInputStream(target))
        try in.readAllBytes() finally in.close()
      }
      val marker = "WARC-Target-URI: http://docs.example/"
        .getBytes("ISO-8859-1")
      val at = {
        var i = 0; var found = -1
        while (found < 0 && i <= raw.length - marker.length) {
          if (java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(raw, i, i + marker.length), marker))
            found = i
          i += 1
        }
        found
      }
      assert(at >= 0, "no URI header found in the written member")
      val d = at + marker.length // first digit of the doc id
      raw(d) = (('0' + (raw(d) - '0' + 1) % 10).toByte) // flip ONE byte
      val gz = new java.io.ByteArrayOutputStream()
      val gzo = new java.util.zip.GZIPOutputStream(gz)
      gzo.write(raw); gzo.close()
      java.nio.file.Files.write(target.toPath, gz.toByteArray)
      // drop Hadoop's local-FS .crc sidecars: the checksum layer would
      // otherwise fail the read at the transport level, BEFORE the
      // header parse this mutation exercises
      new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".crc")).foreach(_.delete())
      graft.sources.WarcReader.read(spark, s"$out/*.warc.gz")
        .select(
          regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long")
            .as("doc_id"),
          decode(col("payload"), "UTF-8").as("text"))
    }
  }

  // ---- media: flip one byte in a planted container header ----

  private def oneByte(v: Int): Array[Byte] = Array(v.toByte)

  test("q_multimodal_audio: one flipped byte in the WAV fmt chunk moves " +
      "the decoded sample rate") {
    assertCaught("q_multimodal_audio") {
      // RIFF layout: fmt chunk body starts at 20; sample rate LE32 at
      // byte offset 24 (overlay pos 25, 1-based). Synthesized rates are
      // 8000..15000 — none has LSB 0x01, so the flip always lands
      val media = graft.ml.Multimodal.synthesizeWavs(
          docs.select(col("doc_id")), "doc_id")
        .withColumn("content",
          overlay(col("content"), lit(oneByte(0x01)), lit(25)))
      graft.ml.Multimodal.decodePartitions(media,
          graft.ml.Multimodal.WavDecoder)
        .select(col("media_id"),
          col("meta.channels").as("channels"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_video: one flipped byte in the mvhd timescale moves " +
      "duration_ms") {
    assertCaught("q_multimodal_video") {
      // ISO-BMFF layout is fixed: ftyp(20) + moov hdr(8) + mvhd hdr(8) +
      // version/flags(4) + creation(4) + modification(4) → timescale
      // BE32 at offset 48; its LSB is at offset 51 (overlay pos 52).
      // Timescales are 600/800/1000/1200 — LSBs 0x58/0x20/0xE8/0xB0,
      // so zeroing the byte changes every one
      val media = graft.ml.Multimodal.synthesizeMp4s(
          docs.select(col("doc_id")), "doc_id")
        .withColumn("content",
          overlay(col("content"), lit(oneByte(0x00)), lit(52)))
      graft.ml.Multimodal.decodePartitions(media,
          graft.ml.Multimodal.Mp4Decoder)
        .select(col("media_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_decode: one flipped magic byte makes the planted " +
      "PNGs unreadable — the md5-derived constants must mismatch") {
    assertCaught("q_multimodal_decode") {
      val media = graft.ml.Multimodal.synthesizeImages(
          docs.select(col("doc_id")), "doc_id")
        .withColumn("content",
          overlay(col("content"), lit(oneByte(0x00)), lit(1)))
      graft.ml.Multimodal.decodePartitions(media,
          graft.ml.Multimodal.ImageIoDecoder)
        .select(col("media_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"))
    }
  }

  // ---- remaining value-bearing gates ----

  test("q_ann_ivf: an off-by-one top-k bound shrinks every result list") {
    assertCaught("q_ann_ivf") {
      val emb = Tables.load(spark, dir, "embeddings")
      graft.ml.Similarity.ivfTopK(
        emb, emb.filter($"vec_id" < 5), "embedding", "vec_id", k = 4,
        numCells = 16, nprobe = 3)
    }
  }

  test("q_quality_clf: scoring without the model's bigram features " +
      "drifts every logit") {
    assertCaught("q_quality_clf") {
      val model = graft.functions.QualityClfModel(
        graft.ml.QualityClassifier.syntheticWeights(12), 12,
        bigrams = false, bias = 0.0) // BUG: train/score config mismatch
      graft.ml.QualityClassifier.score(docs, "text", model)
        .select(col("doc_id"), col("quality_logit"))
    }
  }

  test("q_link_stats_pct: a discrete estimator swapped for the exact " +
      "interpolating percentile is caught") {
    assertCaught("q_link_stats_pct") {
      // percentile_approx with accuracy ≫ group size returns the exact
      // DISCRETE quantile — a semantics swap, not an accuracy loss: any
      // even-sized group's p50 lerp midpoint disagrees with disc-lower
      graft.operators.LinkStatsMetric.batch(graft.operators.LinkMetric.Config(
        fieldsLink = "event_type->value", batchWindowSec = 3600,
        tsColumn = "ts", percentiles = Seq(0.5, 0.95, 0.99),
        percentilesApprox = true, approxAccuracy = 100000))(
        Tables.load(spark, dir, "events"))
    }
  }

  test("q_vec_pool: sum-pooling where the gate mean-pools scales every " +
      "pooled vector by its chunk count") {
    assertCaught("q_vec_pool") {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      graft.ml.Similarity.poolEmbeddings(
        vecs.withColumn("doc", col("vec_id") % 50), "embedding", "doc",
        "vec_id", mode = "sum")
        .select(col("doc"), col("n_chunks"), size(col("embedding")).as("dim"),
          aggregate(col("embedding"), lit(0.0d), (a, x) => a + x).as("vec_sum"))
    }
  }

  test("q_block_hosts: exact-host matching instead of registrable-suffix " +
      "misses every subdomain") {
    assertCaught("q_block_hosts") {
      val urls = docs
        .select(col("doc_id"), concat(lit("http://sub.h"),
          (col("doc_id") % 10).cast("string"), lit(".example/p/"),
          col("doc_id").cast("string")).as("url"))
      val host = regexp_extract(col("url"), "^http://([^/]+)/", 1)
      // BUG: h3/h7 entries match nothing (hosts are sub.hN.example);
      // only the exact sub.h5.example entry still fires
      urls.filter(!host.isin("h3.example", "h7.example", "sub.h5.example"))
        .select("doc_id", "url")
    }
  }

  test("q_minhash_bands: a band-slicing bug (one signature row per key) " +
      "inflates the candidate volume of every multi-row config") {
    assertCaught("q_minhash_bands") {
      // the seeded indexing bug: the band key takes sig[band] alone
      // instead of the r-row slice sig[band*r .. band*r+r-1] — every
      // config degenerates to r=1 permissiveness (b=16 is legitimately
      // r=1, but b=2/4/8 inflate: 42→hundreds of candidates at sf0.01)
      val numHashes = 16
      val hs = transform(graft.ml.Dedup.shingles(col("text"), 3),
        s => conv(substring(md5(s), 25, 8), 16, 10).cast("long"))
      val sig = array((0 until numHashes).map { k =>
        array_min(transform(col("hs"),
          h => (h * lit(1000003L + 2L * k) + lit(12289L * k + 1L)) %
            lit(4294967296L)))
      }: _*)
      val keyStructs = Seq(2, 4, 8, 16).flatMap { b =>
        (0 until b).map { band =>
          val key = concat_ws("-", lit(band.toString),
            element_at(col("sig"), band + 1).cast("string")) // BUG
          struct(lit(b).as("bands"), key.as("bkey"))
        }
      }
      docs.select(col("doc_id").as("id"), hs.as("hs"))
        .filter(size(col("hs")) > 0)
        .repartition(col("id"))
        .select(col("id"), sig.as("sig"))
        .select(explode(array(keyStructs: _*)).as("k"))
        .select(col("k.bands").as("bands"), col("k.bkey").as("bkey"))
        .groupBy("bands", "bkey").agg(count(lit(1)).as("n"))
        .groupBy("bands").agg(
          count(lit(1)).as("n_buckets"),
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_collision_buckets"),
          sum((col("n") * (col("n") - lit(1)) / lit(2)).cast("long"))
            .as("n_candidates"),
          max(col("n")).as("max_bucket"))
    }
  }

  test("q_dedup_incremental_near: a tightened hamming threshold leaks " +
      "distance-3 near-duplicates through the probe") {
    // NOTE: the classic banding bug (bands ≤ k, pigeonhole broken) is
    // unreachable by construction — dropSeenNearBy rejects it at plan
    // time ("need more bands than allowed bit flips", Dedup.scala) —
    // so the seeded bug is the threshold drift k=3→2 instead
    assertCaught("q_dedup_incremental_near") {
      val seen = docs.filter(col("doc_id") < 250)
        .select(graft.ml.Dedup.simhash32(col("text")).as("sim")).distinct()
      graft.ml.Dedup.dropSeenNearBy(docs.filter(col("doc_id") >= 250), seen,
          "text", "doc_id", graft.ml.Dedup.simhash32, totalBits = 32,
          k = 2, bands = 4)
        .select(col("doc_id"), col("source"))
    }
  }
}
