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
}
