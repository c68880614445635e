package graft.ml

import graft.SparkSpec
import graft.functions.{BpeCodec, BpeFns}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- trainer ------------------------------------------------------------

  test("trainer reproduces the textbook merge sequence on a hand example") {
    // Sennrich-style example: {"hug":10, "pug":5, "pun":12, "bun":4, "hugs":5}
    // pair counts: (h,u)=15 (u,g)=20 (p,u)=17 (g,s)=5 (u,n)=16 (b,u)=4
    // merge 1: (u,g) 20 → ug
    // then (p,u)=17, (u,n)=16, (h,ug)=15, (p,ug)? pug has (p,u)! wait: pug
    // = [p,u,g] → after ug-merge [p,ug]: (p,u) count drops to 12 (pun only),
    // (p,ug)=5, (h,ug)=15, (u,n)=16, (b,u)=4
    // merge 2: (u,n) 16 → un ; pun=[p,un] bun=[b,un]
    // then (h,ug)=15, (p,un)=12, (p,ug)=5, (ug,s)=5, (b,un)=4, (p,u)=0
    // merge 3: (h,ug) 15 → hug
    // merge 4: (p,un) 12 → pun
    val counts = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("token", "cnt")
    val merges = Bpe.trainFromCounts(counts, numMerges = 4)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un")))
  }

  test("trainer stops at minFrequency and breaks count ties lexicographically") {
    val counts = Seq(("ab", 3L), ("cd", 3L), ("xy", 1L)).toDF("token", "cnt")
    // (a,b)=3 and (c,d)=3 tie → (a,b) first; (x,y)=1 < minFrequency=2 → stop
    assert(Bpe.trainFromCounts(counts, numMerges = 10) ==
      Seq(("a", "b"), ("c", "d")))
    // minFrequency=1 takes it
    assert(Bpe.trainFromCounts(counts, numMerges = 10, minFrequency = 1L) ==
      Seq(("a", "b"), ("c", "d"), ("x", "y")))
  }

  test("trainer merges all occurrences within a word, weighted by count") {
    // "aaaa" x3: pairs (a,a) count 9 (3 adjacencies x 3) → merge all,
    // left-to-right non-overlap: [aa, aa]; then (aa,aa)=3 → aaaa
    val counts = Seq(("aaaa", 3L)).toDF("token", "cnt")
    assert(Bpe.trainFromCounts(counts, numMerges = 2, minFrequency = 1L) ==
      Seq(("a", "a"), ("aa", "aa")))
  }

  test("trainer from the vocab store view trains without rescanning text") {
    val store = java.nio.file.Files
      .createTempDirectory("bpe-vocab-store").toString + "/v"
    TextAnalysis.appendToVocabStore(
      Seq((0L, "river river riven")).toDF("doc_id", "text"), "text", store)
    TextAnalysis.appendToVocabStore(
      Seq((1L, "river riven")).toDF("doc_id", "text"), "text", store)
    val merges = Bpe.trainFromCounts(
      TextAnalysis.readVocabStore(spark, store), numMerges = 4)
    // "river"x3 + "riven"x2: (r,i)=5 (i,v)=5 (v,e)=5 (e,r)=3 (e,n)=2
    // ties at 5 → lexicographic: (i,v); then (iv,e) ties (r,iv) at 5 and
    // "iv" < "r"; then (r,ive)=5
    assert(merges.take(3) == Seq(("i", "v"), ("iv", "e"), ("r", "ive")))
  }

  // ---- encoder ------------------------------------------------------------

  test("encoder applies merges by rank, leftmost first") {
    val codec = BpeCodec(Seq(("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un")),
      unicode = false)
    assert(codec.encodeWord("hug").toSeq == Seq("hug"))
    assert(codec.encodeWord("pun").toSeq == Seq("pun"))
    assert(codec.encodeWord("hugs").toSeq == Seq("hug", "s"))
    assert(codec.encodeWord("pug").toSeq == Seq("p", "ug"))
    assert(codec.encodeWord("bun").toSeq == Seq("b", "un"))
    assert(codec.encodeWord("") .toSeq == Seq.empty)
  }

  test("encoder one-at-a-time == trainer's merge-all segmentation") {
    // train on a corpus, then check the encoder reproduces each trained
    // word's final trainer segmentation (the standard BPE property)
    val counts = Seq(("banana", 4L), ("bandana", 3L), ("cabana", 2L),
      ("nab", 5L), ("ban", 5L)).toDF("token", "cnt")
    val merges = Bpe.trainFromCounts(counts, numMerges = 8, minFrequency = 1L)
    val codec = BpeCodec(merges, unicode = false)
    // replay the trainer independently: apply merges in rank order,
    // all-occurrences-per-step, to each word
    def replay(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    for (w <- Seq("banana", "bandana", "cabana", "nab", "ban", "banan", "cab"))
      assert(codec.encodeWord(w).toSeq == replay(w), s"word $w")
  }

  test("encode column: per-word tokens flattened in order, lossless") {
    val codec = Seq(("t", "h"), ("th", "e"), ("c", "a"), ("ca", "t"))
    val df = Seq((1L, "the cat  thecat"), (2L, ""), (3L, "  ")).toDF("id", "text")
    val enc = Bpe.encode(df, "text", codec).orderBy("id")
      .select(col("id"), col("bpe_tokens")).as[(Long, Seq[String])].collect()
    assert(enc(0) == ((1L, Seq("the", "cat", "the", "cat"))))
    assert(enc(1) == ((2L, Seq.empty)))
    assert(enc(2) == ((3L, Seq.empty)))
    // count column matches the array length without materializing it
    val cnt = Bpe.tokenCount(df, "text", codec).orderBy("id")
      .select(col("n_bpe_tokens")).as[Long].collect().toSeq
    assert(cnt == Seq(4L, 0L, 0L))
  }

  test("unicode mode splits NBSP-joined words; default keeps them glued") {
    val codec = Seq(("a", "b"))
    val df = Seq((1L, "ab\u00a0ab")).toDF("id", "text")
    val strict = Bpe.encode(df, "text", codec)
      .select(col("bpe_tokens")).as[Seq[String]].head()
    // NBSP is not Java \\s: one "word" ab<nbsp>ab; (a,b) merges twice but
    // the nbsp symbol separates them
    assert(strict == Seq("ab", "\u00a0", "ab"))
    val uni = Bpe.encode(df, "text", codec, unicode = true)
      .select(col("bpe_tokens")).as[Seq[String]].head()
    assert(uni == Seq("ab", "ab"))
  }

  test("surrogate-pair code points stay whole symbols") {
    val codec = BpeCodec(Seq.empty, unicode = false)
    // U+1F600 is two Java chars; the symbol walk must not split it
    assert(codec.encodeWord("a😀b").toSeq ==
      Seq("a", "😀", "b"))
  }

  // ---- persistence + integration -----------------------------------------

  test("model save/load round-trips rank order") {
    val merges = Seq(("u", "g"), ("u", "n"), ("h", "ug"))
    val path = java.nio.file.Files.createTempDirectory("bpe-model").toString + "/m"
    Bpe.saveModel(spark, merges, path)
    assert(Bpe.loadModel(spark, path) == merges)
  }

  test("planMixture sized by BPE counts diverges from whitespace counts") {
    val df = Seq(
      ("code", "supercalifragilistic expialidocious tokenization"),
      ("prose", "the the the the the the the the")).toDF("src", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    // whitespace: code=3 prose=8; bpe: "the"→1 token (8), code words stay
    // char-level (~44 tokens) — the under-count planMixture exists to fix
    val plan = DatasetOps.planMixture(df, "src", "text",
        weights = Map.empty, defaultWeight = 1.0, totalBudget = 1000L,
        tokenCounter = Bpe.tokenCounter(merges))
      .select(col("group"), col("n_tokens")).as[(String, Long)].collect().toMap
    assert(plan("prose") == 8L)
    assert(plan("code") > 30L)
  }

  test("encode stays inside whole-stage codegen") {
    // a LocalTableScan would constant-fold the projection away — range()
    // keeps a real codegen stage under the expression
    val df = spark.range(4).select(col("id"),
      concat(lit("the cat "), col("id")).as("text"))
    val plan = Bpe.encode(df, "text", Seq(("t", "h")))
      .queryExecution.executedPlan.toString
    // the `*(n)` star prefix is the WholeStageCodegen marker: the project
    // holding bpe_encode must carry it (i.e. the expression generated code
    // rather than falling back to interpreted eval)
    val encLine = plan.linesIterator.find(_.contains("bpe_encode")).get
    assert(encLine.trim.startsWith("*("), s"not codegen'd: $encLine")
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }
}
