package graft.ml

import graft.SparkSpec
import graft.functions.{QualityClfFns, QualityClfModel}
import org.apache.spark.sql.functions._

/** Trained quality scoring: hashed-bag logistic regression (train) + the
  * zero-exchange embedded-model logit kernel (score). The cross-engine
  * scoring lattice is gated by q_quality_clf; these specs cover what the
  * SQL oracle cannot — iterative training. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // deterministic labeled fixture: "good" docs draw from a varied topical
  // vocabulary; "bad" docs are spam-like with heavy repetition. Seeds are
  // index arithmetic, no RNG.
  private val goodWords = Vector("research", "method", "analysis", "model",
    "data", "result", "experiment", "theory", "approach", "evidence",
    "measurement", "structure", "pattern", "system", "process", "detail")
  private val badWords = Vector("click", "buy", "now", "cheap", "free",
    "offer", "winner", "prize", "urgent", "deal")
  private def goodDoc(i: Int): String =
    (0 until 12).map(j => goodWords((i * 7 + j * 3) % goodWords.size))
      .mkString(" ")
  private def badDoc(i: Int): String = {
    val w1 = badWords(i % badWords.size)
    val w2 = badWords((i * 3 + 1) % badWords.size)
    s"$w1 $w2 $w1 $w2 $w1 $w2 $w1 $w2 $w1 $w2 $w1 $w2"
  }
  private def labeled(ids: Range) = ids.map { i =>
    if (i % 2 == 0) (i.toLong, goodDoc(i), 1) else (i.toLong, badDoc(i), 0)
  }.toDF("id", "text", "label")

  test("training separates a labeled fixture and generalizes to held-out docs") {
    val train = labeled(0 until 200)
    val heldOut = labeled(200 until 300) // same distributions, unseen docs
    val model = QualityClassifier.train(train, "text", "label",
      logBuckets = 10, bigrams = true, epochs = 30, lr = 1.0)
    val accTrain = QualityClassifier.accuracy(train, "text", "label", model)
    val accHeld = QualityClassifier.accuracy(heldOut, "text", "label", model)
    assert(accTrain >= 0.95, s"train accuracy $accTrain")
    assert(accHeld >= 0.9, s"held-out accuracy $accHeld")
    // real discrimination, not a constant: both classes appear
    val scored = QualityClassifier.score(heldOut, "text", model)
    assert(scored.filter(col("quality_logit") > 0).count() > 0)
    assert(scored.filter(col("quality_logit") < 0).count() > 0)
  }

  test("training is bit-deterministic under any partitioning (decimal gradient sums)") {
    val data = labeled(0 until 120)
    val m1 = QualityClassifier.train(data.repartition(1), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 5, lr = 0.5)
    val m32 = QualityClassifier.train(data.repartition(32), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 5, lr = 0.5)
    assert(m1.bias == m32.bias)
    assert(m1.weights.toSeq == m32.weights.toSeq,
      "gradient sums must not depend on partitioning")
  }

  test("feature store: incremental appends train BIT-IDENTICAL to full-batch") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_clf_store").toString + "/feats"
    val day1 = labeled(0 until 80)
    val day2 = labeled(80 until 120)
    // daily idiom: featurize only each increment, append, re-train
    assert(QualityClassifier.appendToFeatureStore(day1, "text", "label",
      "id", store, logBuckets = 8, bigrams = true) == 80)
    assert(QualityClassifier.appendToFeatureStore(day2, "text", "label",
      "id", store, logBuckets = 8, bigrams = true) == 40)
    // a replayed batch is a no-op (anti-join idempotence)
    assert(QualityClassifier.appendToFeatureStore(day2, "text", "label",
      "id", store, logBuckets = 8, bigrams = true) == 0)
    val fromStore = QualityClassifier.trainFromFeatureStore(spark, store,
      epochs = 5, lr = 0.5)
    // the decimal gradient lattice is order/partitioning-independent, so
    // the store re-read trains to the SAME BITS as one full batch
    val fullBatch = QualityClassifier.train(labeled(0 until 120), "text",
      "label", logBuckets = 8, bigrams = true, epochs = 5, lr = 0.5)
    assert(fromStore.bias == fullBatch.bias)
    assert(fromStore.weights.toSeq == fullBatch.weights.toSeq,
      "store-trained weights must equal full-batch weights bit-for-bit")
    assert(fromStore.logBuckets == 8 && fromStore.bigrams)
    // mixed-config appends fail loudly (hash spaces cannot mix)
    val err = intercept[IllegalArgumentException] {
      QualityClassifier.appendToFeatureStore(day1, "text", "label",
        "id", store, logBuckets = 10, bigrams = true)
    }
    assert(err.getMessage.contains("cannot mix"))
  }

  test("score is a zero-exchange narrow map over the scan") {
    val model = QualityClfModel(QualityClassifier.syntheticWeights(12), 12,
      bigrams = true, bias = 0.0)
    // Range-based frame: a local Seq collapses to LocalTableScan and the
    // plan-shape assertion would vacuously pass/fail
    val df = spark.range(50).select(col("id"),
      concat_ws(" ", lit("alpha"), col("id").cast("string"), lit("beta"))
        .as("text"))
    val out = QualityClassifier.score(df, "text", model)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score gained a shuffle:\n$plan")
    // the `*(1)` star marks whole-stage codegen: the kernel must live
    // INSIDE the codegen'd project, not break the stage
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(plan.contains("quality_clf_logit"), plan)
  }

  test("kernel contract: token-less/null text scores null; bias rides last") {
    val model = QualityClfModel(Array.fill(4)(0.25), 2, bigrams = false,
      bias = 0.125)
    val df = Seq((1L, "a b c"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = QualityClassifier.score(df, "text", model)
      .select("id", "quality_logit").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows(1L).contains(0.25 * 3 + 0.125))
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
  }

  test("bigram features change the score; unigram-only ignores order") {
    val model = QualityClfModel(QualityClassifier.syntheticWeights(12), 12,
      bigrams = true, bias = 0.0)
    val uni = model.copy(bigrams = false)
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("id", "text")
    def logits(m: QualityClfModel) = QualityClassifier.score(df, "text", m)
      .select("id", "quality_logit").as[(Long, Double)].collect().toMap
    val lu = logits(uni)
    assert(lu(1L) == lu(2L), "unigram bag must be order-invariant")
    val lb = logits(model)
    assert(lb(1L) != lb(2L), "bigrams must see order")
  }

  test("save/load round-trips the model bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf").toString
    val model = QualityClassifier.train(labeled(0 until 80), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 3, lr = 0.5)
    QualityClassifier.save(spark, model, s"$dir/m1")
    val back = QualityClassifier.load(spark, s"$dir/m1")
    assert(back.logBuckets == model.logBuckets)
    assert(back.bigrams == model.bigrams)
    assert(back.bias == model.bias)
    assert(back.weights.toSeq == model.weights.toSeq)
  }

  test("accuracy excludes null-label rows (not counted as misclassifications)") {
    val model = QualityClassifier.train(labeled(0 until 120), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 10, lr = 1.0)
    val base = labeled(0 until 20)
    val accBase = QualityClassifier.accuracy(base, "text", "label", model)
    // adding UNLABELED rows must not change accuracy — the old
    // three-valued comparison counted each one as a miss
    val withNulls = base.unionByName(
      (500 until 520).map(i => (i.toLong, goodDoc(i), Option.empty[Int]))
        .toDF("id", "text", "label"))
    val accNulls = QualityClassifier.accuracy(withNulls, "text", "label", model)
    assert(accNulls == accBase, s"$accNulls != $accBase")
  }

  test("save crash contract: a retired-only generation survives re-save and load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_crash").toString
    val m1 = QualityClassifier.train(labeled(0 until 80), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 3, lr = 0.5)
    QualityClassifier.save(spark, m1, s"$dir/m")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a save that crashed between retiring the old model and
    // committing the new: path absent, `.old` is the ONLY generation
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/m"),
      new org.apache.hadoop.fs.Path(s"$dir/m.old"))
    // load() restores the retired generation
    val back = QualityClassifier.load(spark, s"$dir/m")
    assert(back.weights.toSeq == m1.weights.toSeq)
    // ...and a SAVE from the same state must not destroy it on its way
    // in (the r14 review finding: deleting .old before the commit left
    // a window losing BOTH generations)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/m"),
      new org.apache.hadoop.fs.Path(s"$dir/m.old"))
    val m2 = QualityClassifier.train(labeled(0 until 40), "text", "label",
      logBuckets = 8, bigrams = true, epochs = 2, lr = 0.5)
    QualityClassifier.save(spark, m2, s"$dir/m")
    assert(QualityClassifier.load(spark, s"$dir/m").weights.toSeq
      == m2.weights.toSeq)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/m.old")))
  }

  test("feature store guards: bad labels and duplicate ids fail BEFORE persisting") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_clf_guard").toString + "/feats"
    val bad = Seq((1L, goodDoc(1), 2)).toDF("id", "text", "label")
    val e1 = intercept[IllegalArgumentException] {
      QualityClassifier.appendToFeatureStore(bad, "text", "label", "id",
        store, logBuckets = 8)
    }
    assert(e1.getMessage.contains("0/1"))
    val dup = Seq((1L, goodDoc(1), 1), (1L, goodDoc(2), 0))
      .toDF("id", "text", "label")
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.appendToFeatureStore(dup, "text", "label", "id",
        store, logBuckets = 8)
    }
    assert(e2.getMessage.contains("duplicate"))
    // nothing persisted by either failed append — not even the meta
    // sidecar: a first append that fails validation must leave NO store
    // behind (a meta-only husk made trainFromFeatureStore die on a raw
    // PATH_NOT_FOUND for <store>/rows instead of a named error)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store, "_clf_store_meta")),
      "failed first append must not write the meta sidecar")
    // training from a store that never got rows is a NAMED error
    val e3 = intercept[RuntimeException] {
      QualityClassifier.trainFromFeatureStore(spark, store)
    }
    assert(e3.getMessage.contains("appendToFeatureStore"))
    // a clean batch trains from an uncontaminated store
    assert(QualityClassifier.appendToFeatureStore(labeled(0 until 20),
      "text", "label", "id", store, logBuckets = 8) == 20)
    assert(spark.read.parquet(s"$store/rows").count() == 20)
    // no stranded meta tmp files from the tmp+rename commit
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(_.getPath.getName).count(_.startsWith("_clf_store_meta")) == 1)
  }

  test("YAML dispatch: labeled reference trains, model_path loads, keep_above filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_clf_yaml").toString
    labeled(0 until 200).write.parquet(s"$dir/labeled")
    val corpus = labeled(200 until 260).drop("label")
      .withColumnRenamed("id", "doc_id")

    // reference-trained: keep_above 0 should keep mostly good docs
    val stage = graft.pipeline.Planner.corpusStage("QualityClassifier", Map(
      "src" -> "text", "id_field" -> "doc_id",
      "reference" -> Map("input" -> "Parquet", "path" -> s"$dir/labeled",
        "label_field" -> "label"),
      "log_buckets" -> 10, "epochs" -> 20, "lr" -> 1.0,
      "keep_above" -> "0.0"))
    val kept = stage(corpus)
    assert(kept.columns.contains("quality_logit"))
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val goodIds = (200 until 260).filter(_ % 2 == 0).map(_.toLong).toSet
    // the trained filter should be a near-perfect separator on this fixture
    assert((keptIds & goodIds).size >= goodIds.size - 2, s"kept $keptIds")
    assert((keptIds -- goodIds).size <= 2, s"kept bad docs: ${keptIds -- goodIds}")

    // model_path round-trip drives the same scorer without training
    val model = QualityClassifier.train(labeled(0 until 200), "text", "label",
      logBuckets = 10, bigrams = true, epochs = 20, lr = 1.0)
    QualityClassifier.save(spark, model, s"$dir/model")
    val stage2 = graft.pipeline.Planner.corpusStage("QualityClassifier", Map(
      "src" -> "text", "model_path" -> s"$dir/model", "target" -> "qscore"))
    assert(stage2(corpus).columns.contains("qscore"))

    // box options are rejected like any corpus stage
    val e = intercept[RuntimeException] {
      graft.pipeline.Planner.filterStage("QualityClassifier",
        Map("model_path" -> s"$dir/model", "failTag" -> "x"))(corpus)
    }
    assert(e.getMessage.contains("corpus-level"), e.getMessage)
  }

  test("score runs on a STREAM: the zero-exchange map is stream-native") {
    // weights are a bounded batch-trained model embedded in the plan, so
    // scoring applies to a streaming frame as-is (the LangId contract)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val model = QualityClassifier.train(labeled(0 until 200), "text", "label",
      logBuckets = 10, bigrams = true, epochs = 20, lr = 1.0)
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF.toDF("id", "text")
    val out = QualityClassifier.score(src, "text", model)
      .filter(col("quality_logit") > 0)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("clf_stream").start()
    try {
      mem.addData((0L, goodDoc(500)), (1L, badDoc(501)), (2L, goodDoc(502)))
      q.processAllAvailable()
      val kept = spark.table("clf_stream").select("id").as[Long].collect().toSet
      assert(kept == Set(0L, 2L), s"stream kept $kept")
    } finally q.stop()
  }

  test("guards: non-0/1 labels and output-column collisions fail loudly") {
    val bad = Seq((1L, "some text", 2)).toDF("id", "text", "label")
    assert(intercept[IllegalArgumentException] {
      QualityClassifier.train(bad, "text", "label", logBuckets = 4, epochs = 1)
    }.getMessage.contains("must be 0/1"))
    val df = Seq((1L, "x", 0.5)).toDF("id", "text", "quality_logit")
    assert(intercept[IllegalArgumentException] {
      QualityClassifier.score(df, "text",
        QualityClfModel(Array.fill(4)(0.0), 2, bigrams = false, bias = 0.0))
    }.getMessage.contains("already exists"))
  }
}
