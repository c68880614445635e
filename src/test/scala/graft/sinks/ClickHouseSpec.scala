package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.types._
import ClickHouseWriter._

class ClickHouseSpec extends SparkSpec {
  import spark.implicits._

  test("type mapping covers the reference's desc-table universe") {
    assert(sparkType("String") == StringType)
    assert(sparkType("Nullable(Int64)") == LongType)
    assert(sparkType("Array(Float32)") == ArrayType(FloatType))
    assert(sparkType("LowCardinality(String)") == StringType)
    assert(sparkType("DateTime64(3)") == TimestampType)
    assert(sparkType("Enum8('a'=1)") == StringType)
    assert(sparkType("UInt64") == LongType)
    assert(sparkType("Decimal(18, 4)") == DecimalType(18, 4))
    assert(sparkType("Array(Nullable(Int32))") == ArrayType(IntegerType))
  }

  test("desc-table parse skips MATERIALIZED/ALIAS columns") {
    val cols = parseDescTable(Seq(
      "id\tUInt64\t\t",
      "name\tString\t\t",
      "derived\tString\tMATERIALIZED\tupper(name)",
      "alias_col\tString\tALIAS\tname"))
    assert(cols.map(_.name) == Seq("id", "name"))
  }

  test("conform casts existing fields and defaults missing/uncastable ones") {
    val schema = Seq(
      ChColumn("id", "UInt64"),
      ChColumn("name", "String"),
      ChColumn("score", "Float64"),
      ChColumn("missing_int", "Int32"),
      ChColumn("opt", "Nullable(String)"),
      ChColumn("tags", "Array(String)"))
    val df = Seq((1L, "x", "not_a_number")).toDF("id", "name", "score")
    val out = conform(df, schema).collect().head
    assert(out.getLong(0) == 1L)
    assert(out.getString(1) == "x")
    assert(out.getDouble(2) == 0.0)          // failed cast → default
    assert(out.getInt(3) == 0)               // missing → default
    assert(out.isNullAt(4))                  // Nullable → null default
    assert(out.getSeq[String](5) == Seq())   // Array default = empty
    assert(conform(df, schema).columns.toSeq ==
      Seq("id", "name", "score", "missing_int", "opt", "tags"))
  }

  test("insertSql renders the prepared statement") {
    assert(insertSql("t", Seq(ChColumn("a", "String"), ChColumn("b", "Int64"))) ==
      "INSERT INTO t (a,b) VALUES (?,?)")
  }

  test("sink router dispatches ClickHouse output through the JDBC batch path") {
    // Derby in-memory stands in for the ClickHouse server: the dispatch,
    // conform projection, prepared-statement batching, and commit all run
    // for real; only the SQL dialect at the far end differs.
    val url = "jdbc:derby:memory:chroute;create=true"
    val setup = java.sql.DriverManager.getConnection(url)
    try setup.createStatement().executeUpdate(
      "CREATE TABLE events_out (name VARCHAR(64), v BIGINT, missing_col BIGINT)")
    finally setup.close()

    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("name", "v")
    Sinks.writeBatch("ClickHouse", Map(
      "table" -> "events_out",
      "hosts" -> Seq(url),
      "bulk_actions" -> 2, // force a mid-stream executeBatch + the tail flush
      "columns" -> Seq("name String", "v Int64", "missing_col Int64")), df)

    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT name, v, missing_col FROM events_out ORDER BY v")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toList
      assert(rows == List(("a", 1L, 0L), ("b", 2L, 0L), ("c", 3L, 0L)))
    } finally conn.close()
  }

  test("unknown output still errors so typos don't silently drop events") {
    val df = Seq(1).toDF("x")
    val e = intercept[RuntimeException](Sinks.writeBatch("Clickhouse", Map.empty, df))
    assert(e.getMessage.contains("unknown output"))
  }
}
