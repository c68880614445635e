package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.filters._

/** Gate-layer mutation audit, round 7: the incremental STORE gates —
  * the cross-run semantics a daily 100 TB pipeline depends on (a store
  * probe that silently drops nothing, a lost increment, history ignored
  * on read) — plus connected-components convergence and the json/
  * convert chain. Same contract as rounds 1-6. */
class OracleMutation5Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private def docs: DataFrame = Tables.load(spark, dir, "documents")
  private def events: DataFrame = Tables.load(spark, dir, "events")

  test("q_asof_store: ignoring pre-split store history loses matches") {
    assertCaught("q_asof_store") {
      val T = lit("2024-01-15 00:00:00").cast("timestamp")
      // bug: the enrichment joins only the post-split increment — events
      // whose latest purchase predates the split lose their match
      val purch = events.filter($"event_type" === "purchase" && $"ts" >= T)
        .select($"user_id", $"ts", $"value")
      graft.operators.AsOfJoin.leftAsOf(
        events.filter($"ts" >= T).select($"event_id", $"user_id", $"ts"),
        purch, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        valueCols = Seq("value"), suffix = "_purchase")
        .select($"event_id", $"user_id", $"ts", $"ts_purchase", $"value_purchase")
    }
  }

  test("q_dedup_store_exact: a probe that drops nothing is caught") {
    assertCaught("q_dedup_store_exact") {
      docs.filter($"doc_id" >= 250).select($"doc_id", $"text")
    }
  }

  test("q_dedup_store_near: a near-probe that drops nothing is caught") {
    assertCaught("q_dedup_store_near") {
      docs.filter($"doc_id" >= 250).select($"doc_id", $"source")
    }
  }

  test("q_dedup_store_sem: a semantic probe that drops nothing is caught") {
    assertCaught("q_dedup_store_sem") {
      Tables.load(spark, dir, "embeddings")
        .filter($"vec_id" >= 250).select($"vec_id")
    }
  }

  test("q_vocab_store: a lost increment halves the merged counts") {
    assertCaught("q_vocab_store") {
      val ta = graft.ml.TextAnalysis
      val store = java.nio.file.Files
        .createTempDirectory("graft-mut-vocab").toString + "/vocab"
      // bug: the second (odd-doc) append never lands in the store
      ta.appendToVocabStore(docs.filter($"doc_id" % 2 === 0), "text", store)
      ta.compactVocabStore(spark, store, targetFiles = 4)
      ta.vocabularyFromStore(spark, store, minCount = 3, topN = 50)
    }
  }

  test("q_dedup_clusters: treating the pair list as directed loses " +
      "members (AUDIT FINDING: convergence depth is fixture-invisible)") {
    // First-pass mutation — label propagation stopped after ONE round —
    // produced IDENTICAL output: every natural component at sf0.01 is a
    // star/triangle whose members all sit one hop from the min id, so
    // convergence depth cannot be seen by this gate. Multi-hop chains
    // are unit-pinned instead (MlSpec "clusters: transitive min-id
    // components", both local and distributed paths). The catchable bug
    // class here is DIRECTEDNESS: forgetting the reverse edge union
    // drops every node that only ever appears on the right of a pair.
    assertCaught("q_dedup_clusters") {
      val pairs = graft.ml.Dedup.minhashPairs(docs, "text", "doc_id",
        shingleSize = 3, numHashes = 64, bands = 32, threshold = 0.9)
      val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst")).distinct()
      edges.groupBy("src").agg(min("dst").as("__mn"))
        .select($"src".as("id"), least($"src", $"__mn").as("rep"))
    }
  }

  // ---- media gates (the parameterized subset — container kernels
  //      themselves are pinned by MultimodalSpec fixtures) ----

  test("q_video_frames: sampling fewer frames than configured is caught") {
    assertCaught("q_video_frames") {
      val mm = graft.ml.Multimodal
      mm.sampleFrames(mm.synthesizeMp4sSampled(
        docs.select($"doc_id"), "doc_id"), n = 3)
    }
  }

  test("q_audio_resample: a wrong target rate changes every sample") {
    assertCaught("q_audio_resample") {
      val mm = graft.ml.Multimodal
      val at22k = mm.resamplePcm(
        mm.synthesizeWavs(docs.select($"doc_id"), "doc_id"), 22050)
      mm.decodeWavPcm(at22k)
        .select(col("media_id"),
          col("pcm.n_samples").as("n_samples"),
          col("pcm.sum_sq").as("sum_sq"),
          col("pcm.peak").as("peak"),
          col("pcm.zero_cross").as("zero_cross"))
    }
  }

  test("q_multimodal_curate: a lowered audio-energy gate admits quieter " +
      "clips") {
    assertCaught("q_multimodal_curate") {
      val mm = graft.ml.Multimodal
      val d = docs.select($"doc_id")
      def cls(m: Int) = d.filter(pmod($"doc_id", lit(3)) === m)
      val imgKeep = mm.decodeImagePixels(mm.synthesizeImageVariants(cls(0), "doc_id"))
        .groupBy(col("px.ahash_hi"), col("px.ahash_lo"))
        .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("metric"))
        .select(col("media_id"), lit("image").as("media_type"), col("metric"))
      val audKeep = mm.decodeWavPcm(mm.synthesizeWavs(cls(1), "doc_id"))
        .select(col("media_id"),
          expr("pcm.sum_sq div pcm.n_samples").as("metric"))
        .filter(col("metric") >= 60000000L) // bug: 8e7 → 6e7
        .select(col("media_id"), lit("audio").as("media_type"), col("metric"))
      val vidKeep = mm.sampleFrames(mm.synthesizeMp4sSampled(cls(2), "doc_id"), n = 2)
        .groupBy("media_id").agg(sum(col("frame_size")).as("metric"))
        .filter(col("metric") >= 240L)
        .select(col("media_id"), lit("video").as("media_type"), col("metric"))
      imgKeep.unionByName(audKeep).unionByName(vidKeep)
    }
  }

  test("q_mojibake: a mojibake pattern missing the smart-quote entry " +
      "undercounts") {
    assertCaught("q_mojibake") {
      // same planted corpus (byte-identical suffixes), but the counting
      // pattern lost its cp1252 smart-quote alternative - every %4 row
      // drops from 2 mojibake hits to 1
      val d = docs.select($"doc_id",
        concat($"text",
          when($"doc_id" % 4 === 0,
            lit(" caf\u00C3\u00A9 \u00E2\u20AC\u2122quoted")).otherwise(lit("")),
          when($"doc_id" % 5 === 0, lit(" \uFFFD\uFFFD")).otherwise(lit("")),
          when($"doc_id" % 7 === 0, lit(" x\u0001y")).otherwise(lit("")))
          .as("text"))
      val buggyPattern = Seq("\u00C3\u00A9", "\u00C3\u00A8", "\u00C3\u00BC",
        "\u00C3\u00B1", "\u00C2\u00B0", "\u00C2\u00B7").mkString("|")
      d.select($"doc_id",
        regexp_count($"text", lit("\uFFFD")).cast("long").as("n_replacement"),
        regexp_count($"text", lit(buggyPattern)).cast("long").as("n_mojibake"),
        regexp_count($"text", lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
          .cast("long").as("n_ctrl"))
    }
  }

  test("q_dup_lines: flags missing the successor check miss the first " +
      "member of every duplicate group") {
    assertCaught("q_dup_lines") {
      val multi = docs.select($"doc_id", concat_ws("\n",
        $"text", lit("shared dup line"),
        when($"doc_id" % 2 === 0, lit("shared dup line"))
          .otherwise(concat(lit("unique a "), $"doc_id".cast("string"))),
        when($"doc_id" % 3 === 0, lit("shared dup line"))
          .otherwise(concat(lit("unique b "), $"doc_id".cast("string"))),
        concat(lit("tail "), $"doc_id".cast("string"))).as("text"))
      val base = multi.select($"doc_id",
        array_sort(filter(split($"text", "\n", -1), l => length(l) > 0))
          .as("__ls"))
      val ls = col("__ls")
      // bug: only the predecessor is compared - the FIRST line of each
      // duplicate run never flags, undercounting every dup group by one
      val flags = transform(ls, (x, i) => i > 0 && x === element_at(ls, i))
      val n = size(ls)
      val nDup = aggregate(flags, lit(0), (a, f) => a + when(f, 1).otherwise(0))
      val dupChars = aggregate(
        zip_with(ls, flags, (x, f) => when(f, length(x)).otherwise(0)),
        lit(0L), (a, c) => a + c)
      val allChars = aggregate(ls, lit(0L), (a, x) => a + length(x))
      base.select($"doc_id",
        n.cast("long").as("n_lines"),
        nDup.cast("long").as("n_dup_lines"),
        when(n > 0, nDup.cast("double") / n).as("dup_line_frac"),
        when(allChars > 0, dupChars.cast("double") / allChars)
          .as("dup_char_frac"))
    }
  }

  test("q_json_convert: converting to the wrong target type is caught") {
    assertCaught("q_json_convert") {
      val parsed = FilterBox(JsonFilter("props", target = Some("pm"))).stage(events)
        .withColumn("k", element_at($"pm", "k"))
      val conv = FilterBox(ConvertFilter(Map(
        "k" -> ConvertFilter.Spec("float")))).stage(parsed)
      conv.select($"event_id", $"k")
    }
  }
}
