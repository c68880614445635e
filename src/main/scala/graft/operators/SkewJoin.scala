package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * A shuffled equi-join hashes every row of one key to ONE reducer; at
  * 100 TB a single hot key (the null-ish user, the default URL, the
  * catch-all category) turns that reducer into the job's straggler.
  * Salting splits the hot key's rows across `salt` reducers *before* the
  * shuffle: the probe (left) side gets a deterministic salt in
  * [0, salt), the build (right) side is replicated once per salt value,
  * and the join key becomes (key, salt). The result is row-for-row the
  * plain equi-join — the oracle for the gate IS the unsalted SQL join.
  *
  * When to reach for this instead of AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`): AQE splits oversized
  * *partitions* after the map stage and only for sort-merge joins; a
  * single hot KEY still lands in one (split-resistant) partition-key
  * group, and shuffled-hash joins get no help at all. Salting moves the
  * fix into the data itself, works for any shuffle join, and composes
  * with bucketed / pre-partitioned layouts.
  *
  * Cost model: the right side is scanned once and exploded `salt`× into
  * the shuffle (choose `salt` ≈ hot-key rows ÷ target-partition rows;
  * 8–32 covers most skews — the right side's shuffle volume grows
  * linearly in `salt`, so don't default it high). The left side pays one
  * extra codegen'd hash column, no extra shuffle volume.
  *
  * Determinism: the left salt is `xxhash64(all left columns) mod salt`,
  * a pure function of row content — re-runs produce identical
  * placement (the house rule: never `rand()`). Fully duplicated left
  * rows therefore share a salt; exact-dedup first if hot keys carry
  * byte-identical duplicate payloads.
  *
  * Join types: inner / left / left_outer / left_semi / left_anti — the
  * types whose semantics survive right-side replication (each left row
  * still sees exactly the right rows of its key, because every key is
  * present under every salt). right/full outer are rejected: an
  * UNMATCHED right row would surface once per replica.
  *
  * Null keys behave exactly as in the plain join (using-join equi
  * semantics: null never matches null).
  *
  * The reference enriches per-event via in-process dictionaries
  * (reference: filter/translate_filter.go) and never joins at corpus
  * scale; this operator exists for the 100 TB case its users hit when
  * the dictionary outgrows a broadcast.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Join `left` with `right` on `leftKey` = `rightKey`, spreading each
    * left key's rows over `salt` shuffle partitions. Output schema is
    * the using-join's: one key column (named `leftKey`), then the
    * remaining left columns, then the remaining right columns. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"saltedJoin: salt must be positive, got $salt")
    val jt = joinType.toLowerCase.replaceAll("[_ ]|outer", "")
    require(Set("inner", "left", "leftsemi", "leftanti", "semi", "anti")(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType'" +
        " (right/full outer would emit unmatched right rows once per replica)")
    require(left.columns.contains(leftKey), s"left key '$leftKey' missing")
    require(right.columns.contains(rightKey), s"right key '$rightKey' missing")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"saltedJoin: input already carries the scratch column '$SaltCol'")
    require(rightKey == leftKey || !right.columns.contains(leftKey),
      s"saltedJoin: right side has both '$rightKey' and a '$leftKey' column — " +
        s"renaming the key would collide; rename the right-side '$leftKey' first")

    val l = left.withColumn(SaltCol,
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    // one replica of every right row per salt value; explode of a small
    // literal array is codegen'd and never materializes the replication
    // outside the shuffle write
    val rKeyed = if (rightKey == leftKey) right
      else right.withColumnRenamed(rightKey, leftKey)
    val r = rKeyed.withColumn(SaltCol,
      explode(array((0 until salt).map(i => lit(i)): _*)))
    l.join(r, Seq(leftKey, SaltCol), joinType).drop(SaltCol)
  }
}
