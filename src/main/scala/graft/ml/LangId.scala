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
    * Plan: per-doc rank window (WindowGroupLimit-pruned like training) →
    * cross join the tiny language list (broadcast — |langs| rows) →
    * left join profiles on (lang, gram) (profiles ≤ langs × topK rows,
    * AQE broadcasts) → one partial-agg'd groupBy(doc, lang) → argmin
    * window per doc. Document text dies at the explode; only gram-rank
    * rows shuffle. */
  def classify(df: DataFrame, textCol: String, idCol: String,
      profiles: DataFrame, topK: Int = 100): DataFrame = {
    val docRanks = df
      .select(col(s"`$idCol`"), explode(trigrams(col(s"`$textCol`"))).as("gram"))
      .groupBy(col(s"`$idCol`"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("doc_rank", row_number().over(
        Window.partitionBy(s"`$idCol`").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("doc_rank") <= topK).select(col(s"`$idCol`"), col("gram"),
        col("doc_rank"))
    val langs = profiles.select("lang").distinct()
    val dist = docRanks
      .crossJoin(broadcast(langs))
      .join(profiles.withColumnRenamed("rank", "prof_rank"),
        Seq("lang", "gram"), "left")
      .groupBy(col(s"`$idCol`"), col("lang"))
      .agg(sum(coalesce(abs(col("doc_rank") - col("prof_rank")),
        lit(topK.toLong))).as("distance"))
    dist.withColumn("__graft_li_best", row_number().over(
        Window.partitionBy(s"`$idCol`").orderBy(col("distance"), col("lang"))))
      .filter(col("__graft_li_best") === 1)
      .select(col(s"`$idCol`"), col("lang").as("lang_guess"), col("distance"))
  }
}
