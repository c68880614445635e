package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Everything is built from codegen'd built-ins (array/lambda functions,
  * hash, md5) — no UDFs — so the plans stay inside whole-stage codegen and
  * scale by shuffle on bounded keys:
  *
  *   - exact:        shuffle key = content hash           (1 row/group out)
  *   - fingerprint:  shuffle key = token-set fingerprint  (order-insensitive)
  *   - minhash LSH:  shuffle key = (band, band-hash); candidate pairs are
  *                   verified with exact shingle jaccard so output quality
  *                   is exact while cost stays near-linear
  *   - simhash:      single pass, one 32-bit fingerprint per doc
  */
object Dedup {

  def tokens(text: Column): Column = split(text, """\s+""")

  /** Distinct word n-gram shingles. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact dedup: one representative (min id) + count per identical value.
    * At scale the groupBy key should be a digest, not the full text — the
    * shuffle then carries 16 bytes + id per row. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("string")).as("content_hash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("cnt"))

  /** Order-insensitive token-set fingerprint (sorted distinct tokens). */
  def fingerprintCol(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprintCol(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("cnt"))

  /** MinHash signature: k independent permutations approximated by k seeded
    * re-hashes of the 64-bit shingle hashes; sig_i = min over shingles of
    * xxhash64(shingleHash, i). The string is hashed to a long ONCE; the k
    * permutations only touch 8-byte longs, so total cost is
    * O(|shingles| * (strlen + k)) not O(|shingles| * k * strlen). */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleHashes, h => xxhash64(h, seed))))

  /** LSH candidate generation + exact-jaccard verification.
    *
    * Bands the signature into `bands` groups of `numHashes/bands` rows;
    * docs sharing any (band, hash-of-band-slice) bucket become candidates;
    * candidates are verified with exact shingle jaccard ≥ `threshold`.
    *
    * Plan shape (this is what makes it fast — see git history for the
    * 300s-at-sf0.1 version this replaces):
    *   - shingles are hashed to 64-bit longs in ONE pass over the strings;
    *     the k minhash permutations re-hash only the longs. Without this,
    *     Catalyst's CollapseProject inlines the whole shingle expression
    *     into every one of the k lambda bodies → k× string re-tokenization.
    *   - a `repartition(id)` barrier right after shingling both (a)
    *     materializes the shingle arrays once and (b) spreads rows over all
    *     cores — the testdata parquet is a single row-group, so without it
    *     every hash runs on one core. At cluster scale the input has many
    *     splits and the same shuffle co-locates the verify join.
    *   - band bucket hashes are computed directly from the shingle hashes
    *     (min over xxhash64(h, band*r+j)), so no wide intermediate
    *     signature column gets re-inlined per band.
    *   - both sides of the bucket self-join and of the verify join are the
    *     same repartitioned subplan → Spark's ReuseExchange scans and
    *     shingles the corpus once.
    *
    * Scale: explode factor = `bands` per doc; the bucket join shuffles on
    * (band, bandHash) whose cardinality ~ distinct near-dup clusters.
    * With r = numHashes/bands rows per band, P(candidate | j) =
    * 1-(1-j^r)^bands — with the 64/32 default, j ≥ 0.9 pairs are caught
    * with probability 1 - 5e-24, so verified output equals the exact
    * all-pairs result while never materializing the O(n²) cross join.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 32,
      threshold: Double = 0.9): DataFrame = {
    val rows = numHashes / bands
    require(rows * bands == numHashes, "bands must divide numHashes")

    val docs = df.select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), h => xxhash64(h)))
      .repartition(col("id"))

    val banded = docs.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            hash((0 until rows).map(j =>
              array_min(transform(col("hs"), h => xxhash64(h, b * rows + j))))
              : _*).as("bh")))).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    val cand = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val a = docs.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-token 32-bit hashes: low 8 hex chars of md5 — deliberately
    * reproducible in any engine (the oracle recomputes it in SQL). */
  def simhashTokenHashes(text: Column): Column =
    transform(array_distinct(tokens(text)),
      t => conv(substring(md5(t), 25, 8), 16, 10).cast("long"))

  /** 32-bit SimHash from pre-computed token hashes. The 32 bit-votes are
    * statically unrolled Scala-side (not a `sequence` lambda), so each
    * vote is a codegen'd shift+mod over a long array — the expensive md5
    * pass over the strings happens once, upstream. */
  def simhashFromHashes(hs: Column): Column =
    (0 until 32).map { j =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, j) % 2 === 1, 1).otherwise(-1))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def simhash32(text: Column): Column =
    simhashFromHashes(simhashTokenHashes(text))

  /** Near-dup via identical simhash fingerprint (hamming-0 buckets; banded
    * hamming-k search is a straightforward extension on chunked bits).
    * The md5 token-hash array is materialized behind a repartition barrier
    * so (a) it is computed once, not once per bit-vote, and (b) the work
    * spreads across all cores even when the input is a single split. */
  def simhashGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("__id"), simhashTokenHashes(col(textCol)).as("__hs"))
      .repartition(col("__id"))
      .groupBy(simhashFromHashes(col("__hs")).as("simhash"))
      .agg(min(col("__id")).as("rep_id"), count(lit(1)).as("cnt"))

  /** Exact n-gram jaccard pairs within a blocking column (e.g. a source or
    * length bucket) — the quadratic fallback, kept sub-quadratic by the
    * block. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), n).as("sh")).filter(size(col("sh")) > 0)
    val l = docs.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = docs.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Keep one representative row per near-dup cluster: pairs → connected
    * components via min-id propagation (bounded iterations), then
    * anti-join. For the common "drop anything matching an earlier doc"
    * policy a single pass suffices: drop every id_b. */
  def dropDuplicates(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")
}
