package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character-trigram language identification (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization" — the rank-order profile method
  * fastText-era pipelines still fall back to). Entirely INTEGER
  * arithmetic: profiles are rank tables, the score is the out-of-place
  * distance Σ|doc_rank − profile_rank| with a fixed `topK` penalty for
  * unseen grams — so classification is deterministic, reproducible at
  * any partition count, and exactly replayable by the SQL oracle
  * (unlike probability-smoothed classifiers whose float sums drift).
  *
  * The trained profile is a PLAIN (lang, gram, rank) DataFrame — persist
  * as parquet, ship anywhere, no driver-side model object (the same
  * model-as-frame contract as [[NgramLm]]).
  */
object LangId {

  /** Lowercased char trigram list; empty under 3 chars (Spark `sequence`
    * would DESCEND for start > stop — guard, don't trust it). */
  private[ml] def trigrams(c: Column): Column = {
    val t = lower(c)
    when(length(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3))))
  }

  /** Train per-language rank profiles from a labeled corpus:
    * (lang, gram, rank) with rank 1..topK by descending frequency, ties
    * broken by gram — the tiebreak makes training bit-deterministic.
    *
    * Plan: explode → partial-agg'd groupBy(lang, gram) (shuffle rows =
    * distinct grams per language, not corpus size) → per-lang rank
    * window whose `<= topK` filter runs as WindowGroupLimit (map-side
    * prune; a language's gram table never funnels unbounded through one
    * reducer). */
  def trainProfiles(df: DataFrame, textCol: String, langCol: String,
      topK: Int = 100): DataFrame =
    df.select(col(s"`$langCol`").as("lang"),
        explode(trigrams(col(s"`$textCol`"))).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rank") <= topK).drop("cnt")

  /** Classify each document against the profiles: (idCol, lang_guess,
    * distance). Lower distance = better match; ties break to the
    * lexicographically first language (deterministic).
    *
    * Plan: ZERO exchanges — the profile table (≤ |langs| × topK rows by
    * [[trainProfiles]] construction, the same bounded-model contract as
    * BPE's merge list at [[Bpe.encode]]) is collected once and embedded
    * in the plan as one map literal per language, so classification is a
    * single narrow map over the corpus. Per row: sort the trigram array,
    * run-length-encode it into (cnt, gram) pairs, rank the top-K pairs by
    * (cnt desc, gram asc), then fold the out-of-place distance against
    * each language's literal map and argmin via struct ordering. A doc of
    * L chars costs O(L log L) in-row — no shuffle, no window, nothing
    * leaves the partition. Docs with no trigrams (null / < 3 chars) emit
    * no row, matching the previous explode-based semantics. */
  def classify(df: DataFrame, textCol: String, idCol: String,
      profiles: DataFrame, topK: Int = 100): DataFrame =
    annotate(df, textCol, profiles, topK)
      .filter(col("lang_guess").isNotNull)
      .select(col(s"`$idCol`"), col("lang_guess"),
        col("lang_distance").as("distance"))

  /** [[classify]] that KEEPS the payload: adds `lang_guess` and
    * `lang_distance` columns (null for docs with no trigrams) instead of
    * projecting them out — still a zero-exchange narrow map, so a
    * pipeline can classify-then-filter (`keep_langs`) without ever
    * joining the verdicts back. */
  def annotate(df: DataFrame, textCol: String,
      profiles: DataFrame, topK: Int = 100): DataFrame = {
    Seq("lang_guess", "lang_distance").foreach { c =>
      require(!df.columns.contains(c),
        s"LangId.annotate emits '$c' but the input already has it — " +
          "rename or drop the existing column first")
    }
    // bounded drain (take, not collect): the model contract is
    // ≤ |langs| × topK rows; one row past the cap proves a violation
    // without ever materializing an unbounded frame on the driver
    val profRows = profiles
      .select(col("lang").cast("string"), col("gram").cast("string"),
        col("rank").cast("int"))
      .take(2000001)
    require(profRows.length <= 2000000,
      s"profile table too large to embed in the plan: >${profRows.length - 1} " +
        "rows (expected <= |langs| * topK)")
    val byLang: Seq[(String, Map[String, Int])] = profRows
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        (l, rs.map(r => r.getString(1) -> r.getInt(2)).toMap)
      }
      .toSeq.sortBy(_._1)

    val grams = trigrams(col(s"`$textCol`"))

    if (byLang.isEmpty)
      // no profiles → no verdicts, but keep the output schema stable
      return df
        .withColumn("lang_guess", lit(null).cast("string"))
        .withColumn("lang_distance", lit(null).cast("long"))

    // let-binding: evaluate `value` exactly ONCE and expose it to `body`
    // as a lambda variable. Plain withColumn intermediates get re-inlined
    // by plan rewrites (CollapseProject / ConvertToLocalRelation), which
    // turns every element access into a full re-sort — O(L²·log L) per
    // row; a lambda variable is bound once by construction.
    def bound(value: Column, body: Column => Column): Column =
      element_at(transform(array(value), body), 1)

    val best = bound(array_sort(grams), sorted => {
      val n = size(sorted)
      // run starts: 1-based positions where a new distinct gram begins
      val startsE = filter(sequence(lit(1), n), i =>
        (i === 1) || (element_at(sorted, i) =!= element_at(sorted, i - 1)))
      bound(startsE, starts => {
        // (negcnt, gram) per run — negated count so the default struct
        // sort yields (cnt desc, gram asc), the training tiebreak
        val runs = transform(starts, (s, j) => struct(
          (s - coalesce(try_element_at(starts, j + lit(2)), n + 1))
            .as("negcnt"),
          element_at(sorted, s).as("gram")))
        bound(slice(array_sort(runs), 1, topK), ranked => {
          // one (distance, lang) struct per language, distance folded
          // in-row against that language's literal rank map; unseen
          // gram → topK penalty; argmin via struct ordering
          val distStructs = byLang.map { case (l, m) =>
            val mLit = typedlit(m)
            val terms = transform(ranked, (e, j) =>
              coalesce(
                abs(j + lit(1) - try_element_at(mLit, e.getField("gram")))
                  .cast("long"),
                lit(topK.toLong)))
            struct(
              aggregate(terms, lit(0L), (a, x) => a + x).as("distance"),
              lit(l).as("lang"))
          }
          array_min(array(distStructs: _*))
        })
      })
    })

    // the no-trigram guard must wrap `best`: on an empty gram array every
    // language folds to distance 0 and the argmin would "win" — the
    // contract is a NULL verdict for sub-trigram docs
    df.withColumn("__graft_li_best", when(size(grams) > 0, best))
      .withColumn("lang_guess", col("__graft_li_best.lang"))
      .withColumn("lang_distance", col("__graft_li_best.distance"))
      .drop("__graft_li_best")
  }
}
