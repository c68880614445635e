package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Gate-layer mutation audit, round 9b: the remaining media-container
  * and ANN families (previously documented-out of the program with the
  * rationale that their oracles state md5-derived constants — round 9a
  * proved a one-byte container perturbation IS mutation-testable, so
  * the rationale no longer holds). Same contract as rounds 1-9a. After
  * this batch only the invariance-shaped roundtrips (q_bpe_roundtrip,
  * q_codec_roundtrip — knobs pinned in their unit specs by construction)
  * and the self-checking q_compression_ratio (its own CompressionGateSpec
  * mutation program) remain outside. */
class OracleMutation8Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")
  private def docIds: DataFrame = docs.select(col("doc_id"))
  private val mm = graft.ml.Multimodal

  private def oneByte(v: Int): Array[Byte] = Array(v.toByte)
  private def flip(df: DataFrame, pos: Int, v: Int): DataFrame =
    df.withColumn("content", overlay(col("content"), lit(oneByte(v)), lit(pos)))

  test("q_multimodal: one flipped payload byte moves the stub's " +
      "md5-derived dimensions") {
    assertCaught("q_multimodal") {
      mm.decodeStub(flip(mm.fromText(docs, "text", "doc_id"), 1, 0x00))
        .select(col("media_id"), col("byte_len"), col("width"), col("height"),
          col("channels"), col("content_md5"))
    }
  }

  test("q_multimodal_meta: the partitioned decode seam tracks payload " +
      "bytes too") {
    assertCaught("q_multimodal_meta") {
      mm.decodePartitions(flip(mm.fromText(docs, "text", "doc_id"), 1, 0x00))
        .select(col("media_id"),
          col("meta.media_type").as("media_type"),
          col("meta.byte_len").as("byte_len"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_mixed: one flipped magic byte derails every " +
      "container's dispatch") {
    assertCaught("q_multimodal_mixed") {
      // the shared fixture rebuilt (PNG/WAV/MP4/FLAC/Ogg/WebM by id%6),
      // then byte 1 of every payload zeroed — the magic dispatcher must
      // stop recognizing all six containers
      def part(m: Int) = docIds.filter(pmod(col("doc_id"), lit(6)) === m)
      val mixed = mm.synthesizeImages(part(0), "doc_id")
        .unionByName(mm.synthesizeWavs(part(1), "doc_id"))
        .unionByName(mm.synthesizeMp4s(part(2), "doc_id"))
        .unionByName(mm.synthesizeFlacs(part(3), "doc_id"))
        .unionByName(mm.synthesizeOggs(part(4), "doc_id"))
        .unionByName(mm.synthesizeMkvs(part(5), "doc_id"))
      mm.decodePartitions(flip(mixed, 1, 0x00), mm.HeaderDecoder)
        .select(col("media_id"),
          col("meta.media_type").as("media_type"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_mp3: one planted header config byte moves " +
      "bitrate/rate off their id-derived values") {
    assertCaught("q_multimodal_mp3") {
      // byte 2 of the MPEG frame header (overlay pos 3) packs
      // bitrate<<4 | samplerate<<2 | padding — pin it to 0x92
      // (128 kbps / 44.1 kHz / pad): every row whose id-derived config
      // differs now decodes to the planted constants instead
      mm.decodePartitions(flip(mm.synthesizeMp3s(docIds, "doc_id"), 3, 0x92),
          mm.Mp3Decoder)
        .select(col("media_id"),
          col("meta.channels").as("channels"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_ogg: one flipped OggS capture byte makes the " +
      "stream unreadable") {
    assertCaught("q_multimodal_ogg") {
      mm.decodePartitions(flip(mm.synthesizeOggs(docIds, "doc_id"), 2, 0x00),
          mm.OggDecoder)
        .select(col("media_id"),
          col("meta.channels").as("channels"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_multimodal_webm: one flipped EBML magic byte makes the " +
      "container unreadable") {
    assertCaught("q_multimodal_webm") {
      mm.decodePartitions(flip(mm.synthesizeMkvs(docIds, "doc_id"), 2, 0x00),
          mm.MkvDecoder)
        .select(col("media_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.format").as("format"))
    }
  }

  test("q_audio_pcm: one flipped sample byte moves the energy fold — " +
      "the decoder must read every payload byte") {
    assertCaught("q_audio_pcm") {
      // PCM data starts at RIFF offset 44; overlay pos 45 rewrites the
      // low byte of sample 0 on every row
      mm.decodeWavPcm(flip(mm.synthesizeWavs(docIds, "doc_id"), 45, 0xFF))
        .select(col("media_id"),
          col("pcm.n_samples").as("n_samples"),
          col("pcm.sum_sq").as("sum_sq"),
          col("pcm.peak").as("peak"),
          col("pcm.zero_cross").as("zero_cross"))
    }
  }

  test("q_image_formats: a lossy transcode smuggled into the gif arm " +
      "breaks pixel exactness") {
    assertCaught("q_image_formats") {
      def sel(d: DataFrame, p: String) = d
        .select(col("media_id"),
          col("px.width").as(p + "w"), col("px.height").as(p + "h"),
          col("px.px_sum").as(p + "s"),
          col("px.ahash_hi").as(p + "ah"), col("px.ahash_lo").as(p + "al"),
          col("px.dhash_hi").as(p + "dh"), col("px.dhash_lo").as(p + "dl"))
      val base = sel(SparkEntry.sharedSmoothDecoded(spark, dir), "p")
      def arm(fmt: String, d: DataFrame) =
        base.join(sel(mm.decodeImagePixels(d), "j"), "media_id")
          .select(lit(fmt).as("fmt"), col("media_id"),
            (col("pw") === col("jw") && col("ph") === col("jh"))
              .as("dims_match"),
            (col("ps") === col("js") && col("pah") === col("jah") &&
              col("pal") === col("jal") && col("pdh") === col("jdh") &&
              col("pdl") === col("jdl")).as("pixel_exact"))
      // BUG: the gif arm actually transcodes through lossy JPEG
      arm("bmp", SparkEntry.sharedSmoothTranscoded(spark, dir, "bmp"))
        .unionByName(arm("gif", mm.transcodeImages(
          SparkEntry.sharedSynthSmooth(spark, dir), "jpg", 0.9f)))
    }
  }

  test("q_image_phash_jpeg: dropping the hamming tolerance to strict " +
      "equality is caught") {
    assertCaught("q_image_phash_jpeg") {
      val jp = mm.transcodeImages(SparkEntry.sharedSynthSmooth(spark, dir),
        "jpg", 0.9f)
      def ham(a: Column, b: Column) = bit_count(a.bitwiseXOR(b))
      def sel(d: DataFrame, p: String) = d
        .select(col("media_id"),
          col("px.width").as(p + "w"), col("px.height").as(p + "h"),
          col("px.ahash_hi").as(p + "ah"), col("px.ahash_lo").as(p + "al"),
          col("px.dhash_hi").as(p + "dh"), col("px.dhash_lo").as(p + "dl"))
      sel(SparkEntry.sharedSmoothDecoded(spark, dir), "p")
        .join(sel(mm.decodeImagePixels(jp), "j"), "media_id")
        .select(col("media_id"),
          (col("pw") === col("jw") && col("ph") === col("jh"))
            .as("dims_match"),
          ((ham(col("pdh"), col("jdh")) + ham(col("pdl"), col("jdl"))) <= 0)
            .as("dhash_close"), // BUG: tolerance 16 → 0
          ((ham(col("pah"), col("jah")) + ham(col("pal"), col("jal"))) <= 0)
            .as("ahash_close")) // BUG: tolerance 8 → 0
    }
  }

  test("q_simhash_bands: slicing every band from bit 0 (a dropped shift) " +
      "collapses the configs onto one histogram") {
    assertCaught("q_simhash_bands") {
      // the seeded indexing bug: the band slice forgets its shift and
      // always reads the LOW w bits — every band of a config buckets on
      // the same value, so collision structure degenerates
      val keyStructs = Seq(2, 4, 8).flatMap { b =>
        val w = 32 / b
        (0 until b).map { band =>
          val slice = col("sim").bitwiseAND(lit((1L << w) - 1L)) // BUG
          struct(lit(b).as("bands"),
            concat_ws("-", lit(band.toString), slice.cast("string")).as("bkey"))
        }
      }
      docs.select(col("doc_id").as("id"),
          graft.ml.Dedup.simhash32(col("text")).as("sim"))
        .repartition(col("id"))
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

  // the GATE's own planting helper — a local copy could drift from the
  // gate/oracle pair and silently turn these mutations vacuous
  private def scriptPlanted: DataFrame = SparkEntry.scriptPlanted(docs)

  test("q_script_profile: a cyrillic low bound drifted past the " +
      "uppercase block drops planted capitals") {
    assertCaught("q_script_profile") {
      // the seeded bug: [Ѐ-ӿ] → [а-ӿ] (lowercase
      // block start) — the fixture plants Привет Мир with UPPERCASE
      // П/М exactly so this class of drift is visible
      val chars = col("__c")
      val counts = graft.ml.TextAnalysis.scriptRanges.map {
        case ("cyrillic", _) =>
          "n_cyrillic" -> size(filter(chars,
            c => ascii(c) >= 0x430 && ascii(c) <= 0x4FF)).cast("long")
        case (nm, rs) =>
          s"n_$nm" -> size(filter(chars, c => rs.map { case (lo, hi) =>
            ascii(c) >= lo && ascii(c) <= hi }.reduce(_ || _))).cast("long")
      }
      counts.foldLeft(scriptPlanted.select(col("doc_id"),
          split(col("text"), "").as("__c"))) {
          case (d, (n, c)) => d.withColumn(n, c)
        }
        .withColumn("dominant_foreign",
          graft.ml.TextAnalysis.dominantForeignCol)
        .drop("__c")
    }
  }

  test("q_script_profile: a reversed dominant tie-break flips the " +
      "planted cyrillic/cjk tie row") {
    assertCaught("q_script_profile") {
      val base = graft.ml.TextAnalysis.scriptClassCols(col("__c"))
        .foldLeft(scriptPlanted.select(col("doc_id"),
          split(col("text"), "").as("__c"))) {
          case (d, (n, c)) => d.withColumn(n, c)
        }
      val foreign = graft.ml.TextAnalysis.scriptRanges.map(_._1)
        .filterNot(_ == "latin")
      val best = foreign.map(n => col(s"n_$n")).reduce(greatest(_, _))
      // BUG: LAST-in-order wins ties (foldLeft without the reverse) —
      // the doc_id%8==7 row (cyrillic 3, cjk 3) flips to cjk
      val dom = foreign.foldLeft(lit("none"): org.apache.spark.sql.Column) {
        case (acc, nm) =>
          when(col(s"n_$nm") === best && col(s"n_$nm") > 0, lit(nm))
            .otherwise(acc)
      }
      base.withColumn("dominant_foreign", dom).drop("__c")
    }
  }

  test("q_ann_lsh: an off-by-one top-k bound shrinks every result list") {
    assertCaught("q_ann_lsh") {
      val emb = Tables.load(spark, dir, "embeddings")
      graft.ml.Similarity.annTopK(
        emb, emb.filter($"vec_id" < 5), "embedding", "vec_id", k = 4,
        numPlanes = 6, dim = 64)
    }
  }

  test("q_ann_int8: a collapsed rerank pool lets quantization error " +
      "pick the winners") {
    assertCaught("q_ann_int8") {
      val emb = Tables.load(spark, dir, "embeddings")
      graft.ml.Similarity.int8TopK(
        emb, emb.filter($"vec_id" < 5), "embedding", "vec_id", k = 5,
        rerank = 2)
    }
  }
}
