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

  private def encode(w: Int, h: Int, imgType: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    img.setRGB(0, 0, 0x336699)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  test("ImageIoDecoder reads real PNG/JPEG headers: dims, channels, format") {
    val png = Multimodal.ImageIoDecoder.decode("image",
      encode(17, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "png"))
    assert(png.getInt(2) == 17 && png.getInt(3) == 9)
    assert(png.getInt(4) == 3)
    assert(png.getString(7) == "png")
    val gray = Multimodal.ImageIoDecoder.decode("image",
      encode(5, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY, "png"))
    assert(gray.getInt(2) == 5 && gray.getInt(4) == 1)
    val jpg = Multimodal.ImageIoDecoder.decode("image",
      encode(33, 21, java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "jpg"))
    assert(jpg.getInt(2) == 33 && jpg.getInt(3) == 21)
    assert(jpg.getString(7) == "jpeg")
  }

  test("ImageIoDecoder: corrupt or non-image bytes → null dims, not a throw") {
    val junk = Multimodal.ImageIoDecoder.decode("image",
      "definitely not an image".getBytes("UTF-8"))
    assert(junk.isNullAt(2) && junk.isNullAt(3) && junk.isNullAt(4))
    assert(junk.getLong(1) == 23L)
    // a PNG truncated after its magic bytes: a reader IS found, then fails
    val truncated = Multimodal.ImageIoDecoder.decode("image",
      encode(17, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR, "png").take(12))
    assert(truncated.isNullAt(2))
    // non-image media types aren't guessed at
    val audio = Multimodal.ImageIoDecoder.decode("audio", Array[Byte](1, 2, 3))
    assert(audio.getString(0) == "audio" && audio.isNullAt(2))
  }

  test("synthesizeImages → ImageIoDecoder round-trip recovers f(id) dims") {
    val ids = Seq(0L, 1L, 63L, 64L, 100L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeImages(ids, "doc_id"), Multimodal.ImageIoDecoder)
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("meta.channels"), col("meta.format"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 64 + 1).toInt, s"width for $id")
      assert(r.getInt(2) == (id % 48 + 1).toInt, s"height for $id")
      assert(r.getInt(3) == 3 && r.getString(4) == "png")
    }
    // determinism across runs (the oracle hash-compares whole frames)
    val again = Multimodal.synthesizeImages(ids, "doc_id")
      .select(md5(col("content"))).as[String].collect().sorted
    val first = Multimodal.synthesizeImages(ids, "doc_id")
      .select(md5(col("content"))).as[String].collect().sorted
    assert(again.sameElements(first))
  }

  test("synthesizeWavs → WavDecoder round-trip recovers f(id) audio meta") {
    val ids = Seq(0L, 1L, 7L, 8L, 1999L, 2000L, 12345L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeWavs(ids, "doc_id"), Multimodal.WavDecoder)
      .select(col("media_id"), col("meta.channels"), col("meta.sample_rate"),
        col("meta.duration_ms"), col("meta.format"), col("meta.byte_len"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val sr = (8000 + (id % 8) * 1000).toInt
      val n  = (id % 2000 + 100).toInt
      assert(r.getInt(1) == 1, s"channels for $id")
      assert(r.getInt(2) == sr, s"sample_rate for $id")
      assert(r.getLong(3) == n.toLong * 1000 / sr, s"duration for $id")
      assert(r.getString(4) == "wav")
      assert(r.getLong(5) == 44L + n * 2, s"byte_len for $id")
    }
  }

  test("WavDecoder: corrupt, truncated, or non-WAV bytes → null dims, not a throw") {
    // not RIFF at all
    val junk = Multimodal.WavDecoder.decode("audio", "not audio".getBytes("UTF-8"))
    assert(junk.getString(0) == "audio" && junk.isNullAt(4) && junk.isNullAt(5))
    // RIFF/WAVE magic but truncated before any complete chunk
    val wav = Multimodal.synthesizeWavs(Seq(42L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    assert(Multimodal.WavDecoder.decode("audio", wav.take(20)).isNullAt(5))
    // data chunk size that lies past the buffer is still header-parseable
    // (the walk reads sizes, never the payload)
    assert(Multimodal.WavDecoder.decode("audio", wav.take(60)).getInt(4) > 0)
    // non-audio media types aren't guessed at
    assert(Multimodal.WavDecoder.decode("video", wav).isNullAt(5))
    // declared-image bytes routed by the dispatcher stay image-parsed
    val viaDispatch = Multimodal.HeaderDecoder.decode("audio", wav)
    assert(viaDispatch.getString(7) == "wav" && viaDispatch.getInt(4) == 1)
    assert(Multimodal.HeaderDecoder.decode("video", wav).isNullAt(4))
  }

  test("synthesizeMp4s → Mp4Decoder round-trip recovers f(id) video meta") {
    val ids = Seq(0L, 1L, 3L, 4L, 319L, 50000L, 98765L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeMp4s(ids, "doc_id"), Multimodal.Mp4Decoder)
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.format"), col("meta.channels"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val ts = (600 + (id % 4) * 200).toInt
      val units = (id % 50000 + 600).toLong
      assert(r.getInt(1) == (id % 320 + 16).toInt, s"width for $id")
      assert(r.getInt(2) == (id % 240 + 16).toInt, s"height for $id")
      assert(r.getLong(3) == units * 1000 / ts, s"duration for $id")
      assert(r.getString(4) == "mp4")
      assert(r.isNullAt(5)) // no audio channel info in a video header
    }
  }

  test("Mp4Decoder: corrupt, truncated, or non-MP4 bytes → null dims, not a throw") {
    val junk = Multimodal.Mp4Decoder.decode("video", "no ftyp here....".getBytes("UTF-8"))
    assert(junk.getString(0) == "video" && junk.isNullAt(2) && junk.isNullAt(6))
    val mp4 = Multimodal.synthesizeMp4s(Seq(7L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // truncated inside moov: the walk sees an over-long box and stops
    assert(Multimodal.Mp4Decoder.decode("video", mp4.take(40)).isNullAt(6))
    // truncation past moov but inside mdat: header already parsed —
    // exactly the header-only property that makes this scale
    val pastMoov = mp4.take(20 + 8 + 108 + 8 + 92 + 8)
    assert(Multimodal.Mp4Decoder.decode("video", pastMoov).getLong(6) ==
      (7L % 50000 + 600) * 1000 / (600 + (7 % 4) * 200))
    // non-video media types aren't guessed at
    assert(Multimodal.Mp4Decoder.decode("audio", mp4).isNullAt(6))
    // dispatcher routes video to the box walk
    assert(Multimodal.HeaderDecoder.decode("video", mp4).getString(7) == "mp4")
  }

  test("synthesizeFlacs → FlacDecoder round-trip recovers f(id) audio meta") {
    val ids = Seq(0L, 1L, 7L, 8L, 1999L, 54321L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeFlacs(ids, "doc_id"), Multimodal.FlacDecoder)
      .select(col("media_id"), col("meta.channels"), col("meta.sample_rate"),
        col("meta.duration_ms"), col("meta.format"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val sr = (8000 + (id % 8) * 1000).toInt
      val n  = id % 2000 + 100
      assert(r.getInt(1) == 1 && r.getInt(2) == sr, s"meta for $id")
      assert(r.getLong(3) == n * 1000 / sr, s"duration for $id")
      assert(r.getString(4) == "flac")
    }
    // corrupt / truncated / non-audio degrade, never throw
    assert(Multimodal.FlacDecoder.decode("audio", "fLaX nope".getBytes).isNullAt(5))
    assert(Multimodal.FlacDecoder.decode("audio", Array[Byte]('f', 'L', 'a', 'C')).isNullAt(5))
    assert(Multimodal.FlacDecoder.decode("image", Array[Byte](1)).isNullAt(5))
  }

  test("HeaderDecoder sniffs audio container magic: RIFF → wav, fLaC → flac") {
    val wav = Multimodal.synthesizeWavs(Seq(5L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    val flac = Multimodal.synthesizeFlacs(Seq(5L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    assert(Multimodal.HeaderDecoder.decode("audio", wav).getString(7) == "wav")
    assert(Multimodal.HeaderDecoder.decode("audio", flac).getString(7) == "flac")
    // same id ⇒ same predicted rate/duration through BOTH containers
    val w = Multimodal.HeaderDecoder.decode("audio", wav)
    val f = Multimodal.HeaderDecoder.decode("audio", flac)
    assert(w.getInt(5) == f.getInt(5) && w.getLong(6) == f.getLong(6))
  }

  test("synthesizeMp3s → Mp3Decoder round-trip recovers f(id) audio meta") {
    val ids = Seq(0L, 1L, 2L, 13L, 14L, 511L, 99999L).toDF("doc_id")
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeMp3s(ids, "doc_id"), Multimodal.Mp3Decoder)
      .select(col("media_id"), col("meta.channels"), col("meta.sample_rate"),
        col("meta.duration_ms"), col("meta.format"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val br = kbps((id % 14 + 1).toInt)
      assert(r.getInt(1) == 1 && r.getInt(2) == rates((id % 3).toInt), s"meta for $id")
      assert(r.getLong(3) == (id % 512 + 132) * 8 / br, s"duration for $id")
      assert(r.getString(4) == "mp3")
    }
  }

  test("Mp3Decoder: ID3v2 skip, corrupt sync, unsupported version → safe") {
    val mp3 = Multimodal.synthesizeMp3s(Seq(9L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // prepend an ID3v2 tag (synchsafe size 200) + 200 tag bytes: the
    // duration must count only the audio bytes after the tag
    val tag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, (200 >> 7).toByte, (200 & 0x7f).toByte) ++
      new Array[Byte](200)
    val tagged = Multimodal.Mp3Decoder.decode("audio", tag ++ mp3)
    val bare = Multimodal.Mp3Decoder.decode("audio", mp3)
    assert(tagged.getLong(6) == bare.getLong(6), "ID3 bytes leaked into duration")
    assert(tagged.getInt(5) == bare.getInt(5))
    // corrupt: bad sync, truncated, reserved bitrate index, MPEG-2 version
    assert(Multimodal.Mp3Decoder.decode("audio", "random junk".getBytes).isNullAt(5))
    assert(Multimodal.Mp3Decoder.decode("audio", mp3.take(3)).isNullAt(5))
    val badBr = mp3.clone(); badBr(2) = (15 << 4).toByte
    assert(Multimodal.Mp3Decoder.decode("audio", badBr).isNullAt(5))
    val mpeg2 = mp3.clone(); mpeg2(1) = 0xf3.toByte
    assert(Multimodal.Mp3Decoder.decode("audio", mpeg2).isNullAt(5))
    // dispatcher sniffs both bare-sync and ID3-prefixed payloads to mp3
    assert(Multimodal.HeaderDecoder.decode("audio", mp3).getString(7) == "mp3")
    assert(Multimodal.HeaderDecoder.decode("audio", tag ++ mp3).getString(7) == "mp3")
  }

  test("synthesizeOggs → OggDecoder round-trip recovers f(id) audio meta") {
    val ids = Seq(0L, 1L, 2L, 7L, 8L, 1999L, 2000L, 54321L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeOggs(ids, "doc_id"), Multimodal.OggDecoder)
      .select(col("media_id"), col("meta.channels"), col("meta.sample_rate"),
        col("meta.duration_ms"), col("meta.format"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 1, s"channels for $id")
      if (id % 2 == 0) { // Vorbis: granule ticks at the stream rate
        val sr = (8000 + (id % 8) * 1000).toInt
        assert(r.getInt(2) == sr, s"sample_rate for $id")
        assert(r.getLong(3) == (id % 2000 + 100) * 1000 / sr, s"duration for $id")
        assert(r.getString(4) == "vorbis")
      } else { // Opus: 48 kHz granules minus pre-skip → exactly the ms
        assert(r.getInt(2) == 48000, s"sample_rate for $id")
        assert(r.getLong(3) == id % 2000 + 100, s"duration for $id")
        assert(r.getString(4) == "opus")
      }
    }
  }

  test("OggDecoder: corrupt, truncated, or non-Ogg bytes → null dims, not a throw") {
    assert(Multimodal.OggDecoder.decode("audio", "not an ogg stream at all!!".getBytes)
      .isNullAt(5))
    val ogg = Multimodal.synthesizeOggs(Seq(6L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // truncated before the id packet completes
    assert(Multimodal.OggDecoder.decode("audio", ogg.take(30)).isNullAt(5))
    // BOS page alone still has ITS granule (0), so the parse degrades to
    // duration 0 rather than erroring — the id header is intact
    val bosOnly = Multimodal.OggDecoder.decode("audio", ogg.take(58))
    assert(bosOnly.getLong(6) == 0L && bosOnly.getString(7) == "vorbis")
    // unknown first packet (neither vorbis nor OpusHead)
    val alien = ogg.clone(); alien(28) = 'x'
    assert(Multimodal.OggDecoder.decode("audio", alien).isNullAt(5))
    // non-audio media types aren't guessed at
    assert(Multimodal.OggDecoder.decode("video", ogg).isNullAt(5))
    // dispatcher sniffs OggS to the Ogg parse
    assert(Multimodal.HeaderDecoder.decode("audio", ogg).getString(7) == "vorbis")
  }

  test("synthesizeMkvs → MkvDecoder round-trip recovers f(id) video meta") {
    val ids = Seq(0L, 1L, 3L, 4L, 319L, 50000L, 98765L).toDF("doc_id")
    val out = Multimodal.decodePartitions(
        Multimodal.synthesizeMkvs(ids, "doc_id"), Multimodal.MkvDecoder)
      .select(col("media_id"), col("meta.width"), col("meta.height"),
        col("meta.duration_ms"), col("meta.format"), col("meta.channels"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 320 + 16).toInt, s"width for $id")
      assert(r.getInt(2) == (id % 240 + 16).toInt, s"height for $id")
      assert(r.getLong(3) == id % 50000 + 600, s"duration for $id")
      assert(r.getString(4) == "webm")
      assert(r.isNullAt(5)) // video: no channels
    }
  }

  test("MkvDecoder: corrupt, truncated, or non-EBML bytes → null dims, not a throw") {
    assert(Multimodal.MkvDecoder.decode("video", "definitely not matroska".getBytes)
      .isNullAt(6))
    val mkv = Multimodal.synthesizeMkvs(Seq(11L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // truncated inside the Segment: the walk stops without throwing
    assert(Multimodal.MkvDecoder.decode("video", mkv.take(20)).isNullAt(6))
    // dims survive truncation that still contains Info+Tracks (drop the
    // trailing Void filler only)
    val noFiller = mkv.take(mkv.length - (11 % 32 + 4).toInt - 2)
    // Segment size now lies past the buffer; walker treats that as
    // truncated and stops at the last complete element it entered
    assert(Multimodal.MkvDecoder.decode("video", noFiller).isNullAt(6))
    // non-video media types aren't guessed at
    assert(Multimodal.MkvDecoder.decode("audio", mkv).isNullAt(6))
    // dispatcher: EBML magic → Matroska walk, ftyp stays on the BMFF walk
    assert(Multimodal.HeaderDecoder.decode("video", mkv).getString(7) == "webm")
    val mp4 = Multimodal.synthesizeMp4s(Seq(11L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    assert(Multimodal.HeaderDecoder.decode("video", mp4).getString(7) == "mp4")
  }

  test("unknown-size Segment (live-mux shape) still parses to end-of-buffer") {
    val mkv = Multimodal.synthesizeMkvs(Seq(23L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    // Segment header is at offset 12 (4B EBML id + 1B size + 7B body):
    // id 0x18538067 at 12..15, 1-byte size at 16 → 0xFF = unknown size
    assert((mkv(12) & 0xff) == 0x18 && (mkv(15) & 0xff) == 0x67, "fixture layout moved")
    val live = mkv.clone(); live(16) = 0xff.toByte
    val out = Multimodal.MkvDecoder.decode("video", live)
    assert(out.getLong(6) == 23L % 50000 + 600)
    assert(out.getInt(2) == (23 % 320 + 16))
  }

  test("decoder fuzz: random, truncated, and bit-flipped bytes never throw") {
    // At 100 TB of crawled media, every corruption shape WILL occur; the
    // decoder contract is null-dims degradation, never a partition kill.
    val rnd = new scala.util.Random(0x60ff) // seeded: reproducible
    def fixture(kind: String): Array[Byte] = {
      val one = Seq(13L).toDF("doc_id")
      val df = kind match {
        case "wav" => Multimodal.synthesizeWavs(one, "doc_id")
        case "flac" => Multimodal.synthesizeFlacs(one, "doc_id")
        case "mp3" => Multimodal.synthesizeMp3s(one, "doc_id")
        case "ogg" => Multimodal.synthesizeOggs(one, "doc_id")
        case "mp4" => Multimodal.synthesizeMp4s(one, "doc_id")
        case "mkv" => Multimodal.synthesizeMkvs(one, "doc_id")
        case "png" => Multimodal.synthesizeImages(one, "doc_id")
      }
      df.select(col("content")).head().getAs[Array[Byte]](0)
    }
    val decoders = Seq[(String, Multimodal.Decoder)](
      "audio" -> Multimodal.WavDecoder, "audio" -> Multimodal.FlacDecoder,
      "audio" -> Multimodal.Mp3Decoder, "audio" -> Multimodal.OggDecoder,
      "video" -> Multimodal.Mp4Decoder, "video" -> Multimodal.MkvDecoder,
      "image" -> Multimodal.ImageIoDecoder,
      "audio" -> Multimodal.HeaderDecoder, "video" -> Multimodal.HeaderDecoder,
      "image" -> Multimodal.HeaderDecoder)
    def check(mt: String, d: Multimodal.Decoder, bytes: Array[Byte]): Unit = {
      val row = d.decode(mt, bytes) // must not throw
      assert(row.getString(0) == mt && row.getLong(1) == bytes.length.toLong)
    }
    // pure random garbage, lengths 0..300
    for (_ <- 1 to 50; (mt, d) <- decoders) {
      val bytes = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(bytes)
      check(mt, d, bytes)
    }
    for (kind <- Seq("wav", "flac", "mp3", "ogg", "mp4", "mkv", "png")) {
      val good = fixture(kind)
      for ((mt, d) <- decoders) {
        // every truncation point of a valid container
        var n = 0
        while (n <= good.length) {
          check(mt, d, java.util.Arrays.copyOf(good, n))
          n += 1
        }
        // single-byte flips at 40 random offsets
        for (_ <- 1 to 40) {
          val mut = good.clone()
          val at = rnd.nextInt(mut.length)
          mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
          check(mt, d, mut)
        }
      }
    }
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
  test("synthesizeImageVariants -> decodeImagePixels: every-pixel decode matches the arithmetic") {
    val ids = Seq(0L, 1L, 126L, 127L, 253L, 254L, 381L, 5000L).toDF("doc_id")
    val out = Multimodal.decodeImagePixels(
        Multimodal.synthesizeImageVariants(ids, "doc_id"))
      .select(col("media_id"), col("px.width"), col("px.height"),
        col("px.px_sum"), col("px.ahash_hi"), col("px.ahash_lo"),
        col("px.dhash_hi"), col("px.dhash_lo"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val seed = id % 127
      val delta = (id / 127 % 3).toInt * 6
      val (w, h) = ((seed % 64 + 8).toInt, (seed % 48 + 8).toInt)
      def px(x: Int, y: Int): Long = {
        val hv = seed * 2654435761L + x * 131L + y * 7L
        (((hv >> 16) & 0xff) % 224) + (((hv >> 8) & 0xff) % 224) + ((hv & 0xff) % 224) + 3L * delta
      }
      assert(r.getInt(1) == w && r.getInt(2) == h, s"dims for $id")
      var pxSum = 0L
      for (y <- 0 until h; x <- 0 until w) pxSum += px(x, y)
      assert(r.getLong(3) == pxSum, s"px_sum for $id")
      val g = for (j <- 0 until 8; i <- 0 until 8) yield px(i * w / 8, j * h / 8)
      val tot = g.sum
      var hash = 0L
      g.zipWithIndex.foreach { case (v, k) => if (64L * v > tot) hash |= 1L << k }
      assert(r.getLong(4) == (hash >>> 32) && r.getLong(5) == (hash & 0xffffffffL),
        s"ahash for $id")
      var dhash = 0L
      for (j <- 0 until 8) {
        val y = j * h / 8
        for (i <- 1 to 8)
          if (px(i * w / 9, y) > px((i - 1) * w / 9, y)) dhash |= 1L << (j * 8 + i - 1)
      }
      assert(r.getLong(6) == (dhash >>> 32) && r.getLong(7) == (dhash & 0xffffffffL),
        s"dhash for $id")
    }
  }

  test("cross-run IMAGE near-dedup: perceptual hash through the incremental near store") {
    // the near seen-store is generic over its 64-bit fingerprint; with
    // `fingerprint_field` it keys on a MediaDecode perceptual hash, so a
    // re-encoded variant of YESTERDAY's image drops TODAY — same banded
    // sidecar machinery as text simhash, zero new store code
    val store = java.nio.file.Files.createTempDirectory("graft_img_store")
      .toString + "/s"
    def hashed(ids: Seq[Long]) = {
      val media = Multimodal.synthesizeImageVariants(ids.toDF("doc_id"), "doc_id")
      Multimodal.decodeImagePixels(media)
        .select(col("media_id").as("id"),
          (shiftleft(col("px.ahash_hi"), 32)
            .bitwiseOR(col("px.ahash_lo"))).as("ahash64"))
    }
    val stage = graft.pipeline.Planner.corpusStage("Dedup", Map(
      "method" -> "incremental", "near" -> true,
      "fingerprint_field" -> "ahash64", "id_field" -> "id",
      "store" -> store, "update_store" -> true, "k" -> 3))

    // run 1: two distinct scenes (seeds 0 and 5) — both kept, both banked
    val run1 = stage(hashed(Seq(0L, 5L)))
    assert(run1.select("id").as[Long].collect().toSet == Set(0L, 5L))
    graft.core.PostCommit.drain()

    // run 2: id 127 is seed-0's brightness variant (identical aHash,
    // different PNG bytes) — dropped against the store; seed 6 is new
    val run2 = stage(hashed(Seq(127L, 6L)))
    assert(run2.select("id").as[Long].collect().toSet == Set(6L))
    graft.core.PostCommit.drain()

    // after run 2 commits, its whole increment is "seen": a replay drops
    // everything, and the store holds one sim per distinct scene
    assert(stage(hashed(Seq(127L, 6L))).count() == 0)
    graft.core.PostCommit.clear()
    assert(spark.read.parquet(store).count() == 3)
  }

  test("perceptual hash: brightness variants collide, bytes differ") {
    // ids 0, 127, 254 share seed 0 with deltas 0, 6, 12: same scene,
    // shifted exposure -> different PNG bytes, identical aHash
    val ids = Seq(0L, 127L, 254L).toDF("doc_id")
    val media = Multimodal.synthesizeImageVariants(ids, "doc_id")
    val md5s = media.select(md5(col("content"))).as[String].collect().toSet
    assert(md5s.size == 3, "variant bytes must differ")
    val hashes = Multimodal.decodeImagePixels(media)
      .select(col("px.ahash_hi"), col("px.ahash_lo"),
        col("px.dhash_hi"), col("px.dhash_lo")).distinct().collect()
    assert(hashes.length == 1, "variant aHash AND dHash must collide")
  }

  test("decodeImagePixels: corrupt or non-image bytes -> null struct, not a throw") {
    val junk = Multimodal.fromText(
      Seq((1L, "definitely not a png")).toDF("doc_id", "text"), "text", "doc_id")
    val r = Multimodal.decodeImagePixels(junk).collect()
    assert(r.length == 1 && r(0).isNullAt(1))
    // truncated real PNG: magic survives, decode fails, row degrades
    val png = Multimodal.synthesizeImageVariants(Seq(9L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    val truncated = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, "image",
        java.util.Arrays.copyOf(png, 24))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    assert(Multimodal.decodeImagePixels(truncated).head().isNullAt(1))
  }

  test("decodeWavPcm: every-sample decode matches the arithmetic") {
    val ids = Seq(0L, 1L, 7L, 1999L, 2000L, 12345L).toDF("doc_id")
    val out = Multimodal.decodeWavPcm(Multimodal.synthesizeWavs(ids, "doc_id"))
      .select(col("media_id"), col("pcm.n_samples"), col("pcm.sum_sq"),
        col("pcm.peak"), col("pcm.zero_cross"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val n = (id % 2000 + 100).toInt
      val samples = (0 until n).map { i =>
        val x = (id * 31 + i * 7) & 0xffff
        (if (x >= 32768) x - 65536 else x).toInt
      }
      assert(r.getLong(1) == n.toLong, s"n_samples for $id")
      assert(r.getLong(2) == samples.map(s => s.toLong * s).sum, s"sum_sq for $id")
      assert(r.getInt(3) == samples.map(math.abs).max, s"peak for $id")
      val zc = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      assert(r.getLong(4) == zc.toLong, s"zero_cross for $id")
    }
  }

  test("decodeWavPcm: corrupt, truncated, or non-PCM16 bytes -> null struct") {
    val junk = Multimodal.fromText(
      Seq((1L, "not a wav")).toDF("doc_id", "text"), "text", "doc_id")
    assert(Multimodal.decodeWavPcm(junk).head().isNullAt(1))
    // a valid WAV truncated mid-data still reduces the samples present
    val wav = Multimodal.synthesizeWavs(Seq(3L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    val cut = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(3L, "audio",
        java.util.Arrays.copyOf(wav, 44 + 10))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    val partial = Multimodal.decodeWavPcm(cut).head()
    assert(!partial.isNullAt(1) && partial.getStruct(1).getLong(0) == 5L)
  }

  test("resizeImages: integer box-filter downscale matches the arithmetic, re-encoded losslessly") {
    val ids = Seq(0L, 5L, 126L, 381L).toDF("doc_id")
    val out = Multimodal.decodeImagePixels(
        Multimodal.resizeImages(Multimodal.synthesizeImageVariants(ids, "doc_id"), 8, 6))
      .select(col("media_id"), col("px.width"), col("px.height"), col("px.px_sum"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val seed = id % 127
      val delta = (id / 127 % 3).toInt * 6
      val (w, h) = ((seed % 64 + 8).toInt, (seed % 48 + 8).toInt)
      def ch(x: Int, y: Int): (Long, Long, Long) = {
        val hv = seed * 2654435761L + x * 131L + y * 7L
        ((((hv >> 16) & 0xff) % 224) + delta, (((hv >> 8) & 0xff) % 224) + delta,
          ((hv & 0xff) % 224) + delta)
      }
      var pxSum = 0L
      for (j <- 0 until 6; i <- 0 until 8) {
        val (x0, x1) = (i * w / 8, (i + 1) * w / 8)
        val (y0, y1) = (j * h / 6, (j + 1) * h / 6)
        var rs = 0L; var gs = 0L; var bs = 0L
        for (y <- y0 until y1; x <- x0 until x1) {
          val (r0, g0, b0) = ch(x, y); rs += r0; gs += g0; bs += b0
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        pxSum += rs / n + gs / n + bs / n
      }
      assert(r.getInt(1) == 8 && r.getInt(2) == 6, s"resized dims for $id")
      assert(r.getLong(3) == pxSum, s"resized px_sum for $id")
    }
  }

  test("resizeImages: smaller-than-target and undecodable payloads pass through") {
    // 8x8 fixture resized to 16x16 must NOT inflate: bytes unchanged
    val small = Multimodal.synthesizeImageVariants(Seq(0L).toDF("doc_id"), "doc_id")
    val origMd5 = small.select(md5(col("content"))).as[String].head()
    val up = Multimodal.resizeImages(small, 16, 16)
      .select(md5(col("content"))).as[String].head()
    assert(up == origMd5)
    val junk = Multimodal.fromText(
      Seq((1L, "not an image")).toDF("doc_id", "text"), "text", "doc_id")
    val through = Multimodal.resizeImages(junk, 8, 6).head()
    assert(new String(through.getAs[Array[Byte]](2), "UTF-8") == "not an image")
    // EXACTLY at target: pass through byte-identical (r14 fix — the
    // strict-< test re-encoded an untouched image, changing its bytes
    // and breaking downstream content-hash dedup)
    val dims = Multimodal.decodeImagePixels(small)
      .select(col("px.width"), col("px.height")).as[(Int, Int)].head()
    val exact = Multimodal.resizeImages(small, dims._1, dims._2)
      .select(md5(col("content"))).as[String].head()
    assert(exact == origMd5, "exact-size image was re-encoded")
  }

  test("resamplePcm: integer linear interpolation matches the arithmetic") {
    val ids = Seq(0L, 1L, 7L, 200L, 1999L).toDF("doc_id")
    val out = Multimodal.decodeWavPcm(
        Multimodal.resamplePcm(Multimodal.synthesizeWavs(ids, "doc_id"), 16000))
      .select(col("media_id"), col("pcm.n_samples"), col("pcm.sum_sq"),
        col("pcm.peak"), col("pcm.zero_cross"))
      .orderBy("media_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val n = (id % 2000 + 100).toInt
      val sr = (8000 + (id % 8) * 1000).toInt
      val in = (0 until n).map { i =>
        val x = (id * 31 + i * 7) & 0xffff
        (if (x >= 32768) x - 65536 else x)
      }
      val nOut = ((n - 1).toLong * 16000 / sr + 1).toInt
      val res = (0 until nOut).map { k =>
        val pos = k.toLong * sr
        val idx = (pos / 16000).toInt
        val frac = pos % 16000
        if (frac == 0L) in(idx)
        else in(idx) + (in(idx + 1) - in(idx)) * frac / 16000
      }
      assert(r.getLong(1) == nOut.toLong, s"n_samples for $id")
      assert(r.getLong(2) == res.map(s => s * s).sum, s"sum_sq for $id")
      assert(r.getInt(3) == res.map(s => math.abs(s)).max.toInt, s"peak for $id")
      val zc = res.sliding(2).count(p => (p(0) >= 0L) != (p(1) >= 0L))
      assert(r.getLong(4) == zc.toLong, s"zero_cross for $id")
    }
  }

  test("resamplePcm: at-rate, non-PCM16, and undecodable payloads pass through") {
    // synthesizeWavs id with sr already 16000 never occurs (8k..15k),
    // so hand-build a 16 kHz WAV and check identity
    val ids = Seq(8L).toDF("doc_id") // sr = 8000, will resample
    val wav = Multimodal.synthesizeWavs(ids, "doc_id")
    val resampled = Multimodal.resamplePcm(wav, 8000) // already at rate
    val origMd5 = wav.select(md5(col("content"))).as[String].head()
    assert(resampled.select(md5(col("content"))).as[String].head() == origMd5)
    val junk = Multimodal.fromText(
      Seq((1L, "not audio")).toDF("doc_id", "text"), "text", "doc_id")
    val through = Multimodal.resamplePcm(junk, 16000).head()
    assert(new String(through.getAs[Array[Byte]](2), "UTF-8") == "not audio")
  }

  test("sampleFrames: stbl walk + byte-range reads match the arithmetic") {
    val ids = Seq(0L, 3L, 23L, 24L, 499L).toDF("doc_id")
    val out = Multimodal.sampleFrames(
        Multimodal.synthesizeMp4sSampled(ids, "doc_id"), n = 4)
      .orderBy("media_id", "k").collect()
    assert(out.length == 5 * 4)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = (id % 24 + 4).toInt
      def fsize(f: Int) = ((id * 7 + f * 13) % 200 + 20).toInt
      val k = r.getInt(1)
      val f = (k.toLong * (nf - 1) / 3).toInt
      assert(r.getInt(2) == f, s"frame_idx for $id/$k")
      val stsz = 20 + 4 * nf
      val stco = 16 + 4 * nf
      val mdatStart = 20 + (8 + 108 + (8 + 92 + (8 + (8 + (8 + stsz + stco))))) + 8
      val off = mdatStart + (0 until f).map(fsize).sum
      assert(r.getLong(3) == off.toLong, s"offset for $id/$k")
      assert(r.getInt(4) == fsize(f), s"size for $id/$k")
      val bs = (0 until fsize(f)).map(j => (id * 11 + f * 17 + j * 5) % 251).sum
      assert(r.getLong(5) == bs, s"byte_sum for $id/$k")
    }
  }

  test("sampleFrames: corrupt, truncated, or non-MP4 bytes emit zero rows") {
    val junk = Multimodal.fromText(
      Seq((1L, "definitely not an mp4")).toDF("doc_id", "text"), "text", "doc_id")
    assert(Multimodal.sampleFrames(junk, 4).count() == 0L)
    // truncation INSIDE the stbl: the moov walk dies cleanly
    val full = Multimodal.synthesizeMp4sSampled(Seq(7L).toDF("doc_id"), "doc_id")
      .select(col("content")).head().getAs[Array[Byte]](0)
    val cut = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(7L, "video",
        java.util.Arrays.copyOf(full, 150))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    assert(Multimodal.sampleFrames(cut, 4).count() == 0L)
  }

  test("synthesizeMp4sSampled still reads as a valid MP4 through Mp4Decoder") {
    // the sampled fixture nests deeper (mdia/minf/stbl) but keeps the
    // mvhd/tkhd the header decoder reads — one fixture, both consumers
    val meta = Multimodal.decodePartitions(
        Multimodal.synthesizeMp4sSampled(Seq(11L).toDF("doc_id"), "doc_id"),
        Multimodal.Mp4Decoder).select(col("meta.format"), col("meta.width")).head()
    assert(meta.getString(0) == "mp4" && meta.getInt(1) == 320)
  }

  test("codec-path fuzz: corrupt buffers flow through pixel/PCM/resample/frame ops") {
    // same contract as the header-decoder fuzz, for the five codec-level
    // operators: a corrupt payload degrades (null struct, pass-through,
    // or zero rows) — it never kills the partition
    val rnd = new scala.util.Random(0x70ff)
    def good(kind: String): Array[Byte] = {
      val one = Seq(29L).toDF("doc_id")
      val df = kind match {
        case "png" => Multimodal.synthesizeImageVariants(one, "doc_id")
        case "wav" => Multimodal.synthesizeWavs(one, "doc_id")
        case "mp4" => Multimodal.synthesizeMp4sSampled(one, "doc_id")
      }
      df.select(col("content")).head().getAs[Array[Byte]](0)
    }
    val buffers = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    for (_ <- 1 to 40) {
      val b = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(b); buffers += b
    }
    for (kind <- Seq("png", "wav", "mp4")) {
      val g = good(kind)
      for (_ <- 1 to 40) buffers += java.util.Arrays.copyOf(g, rnd.nextInt(g.length + 1))
      for (_ <- 1 to 40) {
        val mut = g.clone()
        mut(rnd.nextInt(mut.length)) = (mut(rnd.nextInt(mut.length)) ^ 0x41).toByte
        buffers += mut
      }
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(buffers.zipWithIndex.map { case (b, i) =>
        org.apache.spark.sql.Row(i.toLong, "image", b)
      }.toSeq: _*)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("media_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val corpus = spark.createDataFrame(rows, schema)
    val n = buffers.length.toLong
    // every operator must traverse the full corrupt corpus
    assert(Multimodal.decodeImagePixels(corpus).count() == n)
    assert(Multimodal.decodeWavPcm(corpus).count() == n)
    assert(Multimodal.resizeImages(corpus, 8, 6).count() == n)
    assert(Multimodal.resamplePcm(corpus, 16000).count() == n)
    assert(Multimodal.sampleFrames(corpus, 4).count() <= n * 4) // emits only parseable clips
  }

  test("decode seam works under Structured Streaming: per-batch pixel decode to a memory sink") {
    // a media corpus can arrive as a stream (e.g. Kafka of payload
    // pointers + bytes); the decode seam is mapPartitions-shaped, which
    // streams per micro-batch with no state — pin that the whole
    // synthesize->decode chain survives planning as a streaming query
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Long](spark)
    val media = Multimodal.synthesizeImageVariants(mem.toDF().withColumnRenamed("value", "doc_id"), "doc_id")
    val decoded = Multimodal.decodeImagePixels(media)
      .select(col("media_id"), col("px.width").as("w"), col("px.ahash_hi").as("hi"))
    val q = decoded.writeStream.format("memory").queryName("mm_stream_decode")
      .outputMode("append").start()
    try {
      mem.addData(0L, 127L, 254L, 5L)
      q.processAllAvailable()
      val out = spark.table("mm_stream_decode").collect()
      assert(out.length == 4)
      // seed-0 variants (0, 127, 254) share dims AND aHash in-stream
      val seed0 = out.filter(r => Set(0L, 127L, 254L)(r.getLong(0)))
      assert(seed0.map(_.getInt(1)).toSet == Set(8))
      assert(seed0.map(_.getLong(2)).toSet.size == 1)
    } finally q.stop()
  }

  test("transcodeImages: JPEG re-encode keeps dims, changes bytes, degrades gracefully") {
    val mm = graft.ml.Multimodal
    val ids = spark.range(0, 50).select(col("id").as("doc_id"))
    val smooth = mm.synthesizeSmoothImages(ids, "doc_id")
    val jp = mm.transcodeImages(smooth, "jpg", 0.9f)
    // byte-distinct payloads (lossy re-encode), same count
    val joined = smooth.select(col("media_id"), col("content").as("png"))
      .join(jp.select(col("media_id"), col("content").as("jpg")), "media_id")
    assert(joined.count() == 50)
    assert(joined.filter(col("png") === col("jpg")).count() == 0)
    // dims preserved through decode of the JPEG bytes
    val dims = mm.decodeImagePixels(jp)
      .select(col("px.width"), col("px.height")).collect()
    assert(dims.forall(r => r.getInt(0) >= 8 && r.getInt(1) >= 8))
    // discrimination: distinct ids produce many distinct dhashes (the
    // fixture is not a single constant gradient)
    val nd = mm.decodeImagePixels(smooth)
      .select(col("px.dhash_hi"), col("px.dhash_lo")).distinct().count()
    assert(nd > 10, s"smooth fixture collapsed to $nd dhash values")
    // undecodable bytes pass through unchanged (degrade, never throw)
    val junk = Seq((1L, "image", Array[Byte](1, 2, 3)))
      .toDF("media_id", "media_type", "content")
    val out = mm.transcodeImages(junk, "jpg").collect()(0)
    assert(out.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3))
  }
}
