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
}
