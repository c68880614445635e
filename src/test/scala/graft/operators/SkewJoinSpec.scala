package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // hot key 7 carries half the probe side — the shape salting exists for
  lazy val left = ((0L until 50L).map(i => (7L, i, s"hot$i")) ++
    (0L until 50L).map(i => (i % 5, i + 100L, s"cold$i")))
    .toDF("k", "row_id", "payload")
  lazy val right = (0L until 10L).map(i => (i, s"dim$i")).toDF("k", "dim")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "row_id", "payload", "dim")
      .as[(Long, Long, String, String)].collect().toSet

  test("salted inner join equals the plain join row-for-row") {
    val plain = left.join(right, Seq("k"))
    val salted = SkewJoin.saltedJoin(left, right, "k", "k", salt = 4)
    assert(rows(salted) == rows(plain))
    assert(salted.columns.toSeq == plain.columns.toSeq) // schema too
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val l2 = left.union(Seq((99L, 999L, "orphan")).toDF("k", "row_id", "payload"))
    val plain = l2.join(right, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(l2, right, "k", "k", 4, "left")
    assert(salted.count() == plain.count())
    assert(salted.filter($"k" === 99L).count() == 1) // once, not once-per-salt
    assert(salted.filter($"k" === 99L && $"dim".isNull).count() == 1)
  }

  test("salted semi and anti joins match their plain forms") {
    val l2 = left.union(Seq((99L, 999L, "orphan")).toDF("k", "row_id", "payload"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("row_id").as[Long].collect().toSet
    assert(ids(SkewJoin.saltedJoin(l2, right, "k", "k", 4, "left_semi")) ==
      ids(l2.join(right, Seq("k"), "left_semi")))
    assert(ids(SkewJoin.saltedJoin(l2, right, "k", "k", 4, "left_anti")) ==
      ids(l2.join(right, Seq("k"), "left_anti")))
  }

  test("differing key names: right key is renamed into the left's") {
    val r2 = right.withColumnRenamed("k", "dim_key")
    val out = SkewJoin.saltedJoin(left, r2, "k", "dim_key", 4)
    assert(rows(out) == rows(left.join(right, Seq("k"))))
  }

  test("null keys never match (plain equi-join semantics)") {
    val ln = Seq((Some(1L), 1L, "a"), (None, 2L, "b"))
      .toDF("k", "row_id", "payload")
    val rn = Seq((Some(1L), "d1"), (None, "dnull")).toDF("k", "dim")
    val inner = SkewJoin.saltedJoin(ln, rn, "k", "k", 4)
    assert(inner.select("row_id").as[Long].collect().toSeq == Seq(1L))
    val lj = SkewJoin.saltedJoin(ln, rn, "k", "k", 4, "left")
    assert(lj.filter($"row_id" === 2L && $"dim".isNull).count() == 1)
  }

  test("right/full outer and bad salt are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, right, "k", "k", 4, "right")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, right, "k", "k", 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, right, "k", "k", 0)
    }
  }

  test("scratch-column and rename collisions are rejected up front") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left.withColumn("__graft_salt", lit(1)),
        right, "k", "k", 4)
    }
    // right carries BOTH its key and a column named like the left key —
    // the rename would silently produce two 'k' columns
    val clash = right.withColumnRenamed("k", "rk").withColumn("k", lit(0L))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, clash, "k", "rk", 4)
    }
  }

  test("the physical join keys carry the salt (the skew spread is real)") {
    // force the shuffled path — a broadcast join has no shuffle to salt
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = SkewJoin.saltedJoin(left, right, "k", "k", salt = 4)
      val phys = salted.queryExecution.executedPlan.toString
      assert(phys.contains("__graft_salt"),
        s"expected the salt in the physical join keys:\n$phys")
      // and the left side's salt values genuinely spread the hot key
      val l = left.withColumn("s",
        pmod(xxhash64(left.columns.map(col): _*), lit(4L)).cast("int"))
      val spread = l.filter($"k" === 7L).select("s").distinct().count()
      assert(spread > 1, s"hot key landed on $spread salt value(s)")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("deterministic: re-running places every row identically") {
    def salts = left.withColumn("s",
        pmod(xxhash64(left.columns.map(col): _*), lit(4L)).cast("int"))
      .select("row_id", "s").as[(Long, Int)].collect().toMap
    assert(salts == salts)
    val a = rows(SkewJoin.saltedJoin(left, right, "k", "k", 4))
    val b = rows(SkewJoin.saltedJoin(left, right, "k", "k", 4))
    assert(a == b)
  }
}
