package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ClickHouse sink (reference: output/clickhouse_output.go).
  *
  * The reference's one genuinely schema-ful component: at startup it runs
  * `desc table`, derives a per-column default value, and auto-converts
  * event fields to the column types before batch-inserting
  * (clickhouse_output.go:65-248, 406-445). Here that becomes a plan-time
  * PROJECTION: `conform` builds one `coalesce(cast(col), default)` per
  * ClickHouse column, so the conversion is codegen'd and Catalyst prunes
  * every unreferenced event field out of the scan. The JDBC write itself
  * runs `foreachPartition`, batching `bulk_actions` rows per
  * `executeBatch` inside a transaction per batch
  * (clickhouse_output.go:447-507) — micro-batch boundaries replace the
  * reference's 30 s flush ticker.
  */
object ClickHouseWriter {

  /** One `desc table` row: column name + ClickHouse type text. */
  final case class ChColumn(name: String, chType: String)

  /** Spark type for a ClickHouse type (clickhouse_output.go:156-248). */
  def sparkType(chType: String): DataType = chType match {
    case t if t.startsWith("Nullable(") =>
      sparkType(t.stripPrefix("Nullable(").stripSuffix(")"))
    case t if t.startsWith("LowCardinality(") =>
      sparkType(t.stripPrefix("LowCardinality(").stripSuffix(")"))
    case t if t.startsWith("Array(") =>
      ArrayType(sparkType(t.stripPrefix("Array(").stripSuffix(")")))
    case "String" | "UUID" | "IPv4" | "IPv6" => StringType
    case t if t.startsWith("FixedString") => StringType
    case t if t.startsWith("Enum") => StringType
    case "Int8" => ByteType
    case "Int16" => ShortType
    case "Int32" => IntegerType
    case "Int64" | "UInt32" | "UInt64" => LongType
    case "UInt8" => ShortType
    case "UInt16" => IntegerType
    case "Float32" => FloatType
    case "Float64" => DoubleType
    case "Date" => DateType
    case t if t.startsWith("DateTime") => TimestampType
    case t if t.startsWith("Decimal(") =>
      val Array(p, sc) = t.stripPrefix("Decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      DecimalType(p, sc)
    case other => sys.error(s"unsupported ClickHouse type: $other")
  }

  /** Non-null default literal per type (clickhouse_output.go:156-248):
    * empty string, 0, epoch date/time, empty array; Nullable(T) → null. */
  def defaultFor(chType: String): Column = chType match {
    case t if t.startsWith("Nullable(") => lit(null)
    case t if t.startsWith("LowCardinality(") =>
      defaultFor(t.stripPrefix("LowCardinality(").stripSuffix(")"))
    case t if t.startsWith("Array(") =>
      array().cast(sparkType(t))
    case "String" | "UUID" => lit("")
    case t if t.startsWith("FixedString") => lit("") // always FixedString(N)
    case t if t.startsWith("Enum") => lit("")
    case "IPv4" => lit("0.0.0.0")
    case "IPv6" => lit("::")
    case "Date" => to_date(lit("1970-01-01"))
    case t if t.startsWith("DateTime") => to_timestamp(lit("1970-01-01 00:00:00"))
    case _ => lit(0).cast(sparkType(chType))
  }

  /** Conform `df` to the table schema: cast what exists, default what is
    * missing or fails to cast. One declarative projection — this is the
    * reference's per-event convert loop turned into codegen. */
  def conform(df: DataFrame, schema: Seq[ChColumn]): DataFrame =
    df.select(schema.map { c =>
      val target = sparkType(c.chType)
      val v =
        if (df.columns.contains(c.name)) coalesce(col(s"`${c.name}`").try_cast(target), defaultFor(c.chType).cast(target))
        else defaultFor(c.chType).cast(target)
      v.as(c.name)
    }: _*)

  /** Prepared-statement SQL (clickhouse_output.go:350-359). */
  def insertSql(table: String, schema: Seq[ChColumn]): String = {
    // plain identifiers render bare (the Derby round-trip spec drives
    // this SQL through a non-ClickHouse parser); anything else — dotted
    // (`a.b`) or exotic desc-table names — gets ClickHouse backticks so
    // it still inserts instead of breaking the statement
    val cols = schema.map { c =>
      if (c.name.matches("[A-Za-z_][A-Za-z0-9_]*")) c.name
      else "`" + c.name.replace("`", "\\`") + "`"
    }.mkString(",")
    val marks = schema.map(_ => "?").mkString(",")
    s"INSERT INTO $table ($cols) VALUES ($marks)"
  }

  /** Parse `desc table` output lines ("name\ttype\t...") into columns,
    * skipping MATERIALIZED/ALIAS columns like the reference
    * (clickhouse_output.go:120-134). */
  def parseDescTable(lines: Seq[String]): Seq[ChColumn] =
    lines.flatMap { l =>
      val parts = l.split("\t")
      if (parts.length >= 2 &&
          !(parts.length >= 3 && Set("MATERIALIZED", "ALIAS").contains(parts(2))))
        Some(ChColumn(parts(0), parts(1)))
      else None
    }

  /** Run `desc table` over JDBC against the first live host and parse the
    * result set into columns (reference: clickhouse_output.go:65-153 runs
    * this once at startup). Driver-side, once per writeBatch — the schema
    * is then frozen into the conform projection. */
  def descTable(jdbcUrls: Seq[String], table: String): Seq[ChColumn] = {
    val url = new HostSelector(jdbcUrls).select()
      .getOrElse(sys.error("no live ClickHouse host"))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"desc table $table")
      val lines = scala.collection.mutable.ArrayBuffer[String]()
      val nCols = rs.getMetaData.getColumnCount
      while (rs.next()) {
        val extra = if (nCols >= 3) Option(rs.getString(3)).getOrElse("") else ""
        lines += s"${rs.getString(1)}\t${rs.getString(2)}\t$extra"
      }
      parseDescTable(lines.toSeq)
    } finally conn.close()
  }

  /** JDBC batch write with per-partition round-robin over hosts. The
    * ClickHouse JDBC driver must be on the executor classpath; everything
    * above this point (schema conform, SQL, batching policy) is
    * driver-independent and tested without a server. */
  def write(df: DataFrame, jdbcUrls: Seq[String], table: String,
      schema: Seq[ChColumn], bulkActions: Int = 1000): Unit = {
    val sql = insertSql(table, schema)
    val conformed = conform(df, schema)
    conformed.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      // partition-staggered start: a fixed start would point every
      // partition's connection at the first host
      val selector = new HostSelector(jdbcUrls,
        startIdx = Option(org.apache.spark.TaskContext.get())
          .map(_.partitionId()).getOrElse(0))
      val url = selector.select().getOrElse(sys.error("no live ClickHouse host"))
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val ps = conn.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          (0 until r.length).foreach(i => ps.setObject(i + 1, r.get(i)))
          ps.addBatch()
          n += 1
          if (n % bulkActions == 0) { ps.executeBatch(); conn.commit() }
        }
        if (n % bulkActions != 0) { ps.executeBatch(); conn.commit() }
      } finally conn.close()
    }
  }
}
