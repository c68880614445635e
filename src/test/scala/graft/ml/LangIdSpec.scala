package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and the cat watches them with great interest while they run through the green field"),
    ("en", "this is another english sentence with common words that the model should learn from during the training phase of the classifier"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und die katze schaut ihnen mit großem interesse zu während sie durch das feld laufen"),
    ("de", "dies ist ein weiterer deutscher satz mit häufigen wörtern die das modell während des trainings lernen soll für den klassifikator"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux et le chat les regarde avec beaucoup d'intérêt pendant qu'ils courent dans le champ"),
    ("fr", "ceci est une autre phrase française avec des mots courants que le modèle doit apprendre pendant la phase d'entraînement du classificateur"),
    ("zh", "敏捷的棕色狐狸跳过了懒惰的狗猫咪饶有兴趣地看着它们在绿色的田野里奔跑穿过树林和小溪流向远方的山脉"),
    ("zh", "这是另一个中文句子包含模型在训练阶段应该学习的常见词语用于构建语言分类器的特征")).toDF("lang", "text")

  test("trigram profiles classify held-out text in each language") {
    val profiles = LangId.trainProfiles(train, "text", "lang", topK = 200)
    // profile shape: ranks 1..K, unique per language, gram-tiebroken
    val p = profiles.collect()
    assert(p.forall(_.getInt(2) >= 1))
    assert(profiles.groupBy("lang", "rank").count()
      .filter(col("count") > 1).isEmpty)

    val heldOut = Seq(
      (0L, "the dog and the cat play together in the house with great joy"),
      (1L, "der hund und die katze spielen zusammen mit dem ball im haus"),
      (2L, "le chien et le chat jouent ensemble dans la maison avec le ballon"),
      // must SHARE trigrams with the zh training text — 3-char sequences
      // repeat rarely in tiny CJK corpora, and a doc with zero profile
      // overlap ties every language at the max penalty
      (3L, "猫咪饶有兴趣地看着它们在绿色的田野里奔跑")).toDF("id", "text")
    val got = LangId.classify(heldOut, "text", "id", profiles, topK = 200)
      .select("id", "lang_guess").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "de", 2L -> "fr", 3L -> "zh"), got)
  }

  test("sub-trigram documents emit no row; classification is partition invariant") {
    val profiles = LangId.trainProfiles(train, "text", "lang")
    val docs = Seq((0L, "ab"), (1L, "the cat and the dog run through the field"))
      .toDF("id", "text")
    val out = LangId.classify(docs, "text", "id", profiles)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L), "a 2-char doc has no trigrams, hence no verdict")

    val many = (0L until 40L).map(i => (i, train.collect()(
      (i % 8).toInt).getString(1))).toDF("id", "text")
    val r1 = LangId.classify(many.repartition(1), "text", "id", profiles)
      .as[(Long, String, Long)].collect().toSet
    val r32 = LangId.classify(many.repartition(32), "text", "id", profiles)
      .as[(Long, String, Long)].collect().toSet
    assert(r1 == r32, "integer distances must not drift with partitioning")
  }

  test("annotate keeps the payload; keep_langs filters with zero exchanges") {
    val profiles = LangId.trainProfiles(train, "text", "lang")
    val docs = Seq(
      (0L, "the dog and the cat play together in the house", "k0"),
      (1L, "der hund und die katze spielen zusammen im haus", "k1"),
      (2L, "ab", "k2")).toDF("id", "text", "payload")

    val ann = LangId.annotate(docs, "text", profiles)
    assert(ann.columns.toSeq ==
      Seq("id", "text", "payload", "lang_guess", "lang_distance"))
    val rows = ann.select("id", "lang_guess").as[(Long, Option[String])]
      .collect().toMap
    assert(rows(0L).contains("en") && rows(1L).contains("de"))
    assert(rows(2L).isEmpty, "sub-trigram doc gets a NULL verdict, keeps its row")

    // collision guard
    assert(intercept[IllegalArgumentException] {
      LangId.annotate(docs.withColumn("lang_guess", lit("x")), "text", profiles)
    }.getMessage.contains("lang_guess"))

    // YAML keep_langs: payload intact, verdict columns dropped, and the
    // whole classify-then-filter is a narrow plan (no Exchange/Join)
    val profDir = java.nio.file.Files.createTempDirectory("graft_li_prof").toString
    profiles.write.mode("overwrite").parquet(profDir)
    val kept = graft.pipeline.Planner.corpusStage("LangId", Map(
      "src" -> "text", "id_field" -> "id",
      "profiles_path" -> profDir, "keep_langs" -> Seq("en")))(docs)
    assert(kept.columns.toSeq == Seq("id", "text", "payload"))
    assert(kept.select("id").as[Long].collect().toSeq == Seq(0L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("classify runs on a STREAM: zero-exchange plan makes it stream-native") {
    // the embedded-profile rewrite turned classify into a narrow
    // filter+project — no shuffle, no window — so it applies to a
    // streaming frame as-is (profiles stay a bounded batch model)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val profiles = LangId.trainProfiles(train, "text", "lang")
    val mem = MemoryStream[(Long, String)]
    val src = mem.toDF.toDF("id", "text")
    val out = LangId.classify(src, "text", "id", profiles)
    assert(out.isStreaming)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("langid_stream").start()
    try {
      mem.addData((0L, "the dog and the cat play together in the house"),
        (1L, "der hund und die katze spielen zusammen im haus"),
        (2L, "ab")) // sub-trigram: no verdict row
      q.processAllAvailable()
      val got = spark.table("langid_stream")
        .select("id", "lang_guess").as[(Long, String)].collect().toMap
      assert(got == Map(0L -> "en", 1L -> "de"), got)
    } finally q.stop()
  }
}
