package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.render.Render

/** Go reference-time layout ("2006-01-02 15:04:05") → JDK
  * DateTimeFormatter pattern translation (reference Date filter accepts Go
  * layouts: filter/date.go:139-240). Longest-token-first scan. */
object GoTimeLayout {
  private val table: Seq[(String, String)] = Seq(
    "2006" -> "yyyy",
    "January" -> "MMMM", "Jan" -> "MMM",
    "Monday" -> "EEEE", "Mon" -> "EEE",
    "15" -> "HH",
    "01" -> "MM", "02" -> "dd", "03" -> "hh", "04" -> "mm", "05" -> "ss",
    "06" -> "yy",
    ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
    ".999999999" -> "[.SSSSSSSSS]", ".999999" -> "[.SSSSSS]", ".999" -> "[.SSS]",
    "Z07:00" -> "XXX", "Z0700" -> "XX",
    "-07:00" -> "xxx", "-0700" -> "xx", "-07" -> "x",
    "MST" -> "zzz",
    "PM" -> "a", "pm" -> "a",
    "_2" -> "d", "1" -> "M", "2" -> "d", "3" -> "h", "4" -> "m", "5" -> "s",
  )

  /** The table's letter-only tokens — the complement of a digit
    * heuristic when DISPATCHING a layout string that might be Go or
    * Joda (Render's `%{+…}` index parts). Derived from the table so a
    * future token cannot drift out of the dispatch (r18 review
    * finding: a hand-copied list in Render would silently miss it). */
  val letterTokens: Seq[String] =
    table.map(_._1).filter(t => t.nonEmpty && t.forall(_.isLetter))

  def translate(goLayout: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = goLayout.length
    while (i < n) {
      table.find { case (go, _) => goLayout.startsWith(go, i) } match {
        case Some((go, java)) => out.append(java); i += go.length
        case None =>
          val ch = goLayout.charAt(i)
          // quote literal letters so DateTimeFormatter doesn't eat them
          if (ch.isLetter) out.append('\'').append(ch).append('\'')
          else out.append(ch)
          i += 1
      }
    }
    out.toString
  }
}

/** Date: try N formats in order, first success wins, write a timestamp to
  * `target` (default `@timestamp`). Formats: Go layouts, `UNIX`,
  * `UNIX_MS`, `RFC3339`, `ISO8601`. (reference: filter/date.go)
  *
  * Compiles to a `coalesce(try_to_timestamp…)` chain — codegen'd, no UDF,
  * and Catalyst evaluates laziy left-to-right exactly like the
  * reference's first-match-wins loop. */
final case class DateFilter(
    src: String,
    formats: Seq[String],
    target: String = "@timestamp",
    location: Option[String] = None,
    addYear: Boolean = false,
    overwrite: Boolean = true) extends EventFilter {

  private def parsed(df: DataFrame): Column = {
    val c = Render.compileFieldRef(src)(df)
    val attempts = formats.map {
      case "UNIX" => timestamp_seconds(c.try_cast("double"))
      case "UNIX_MS" => timestamp_millis(c.try_cast("long"))
      case "RFC3339" =>
        coalesce(
          try_to_timestamp(c.cast("string"), lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS]XXX")),
          try_to_timestamp(c.cast("string"), lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS]'Z'")))
      case "ISO8601" => try_to_timestamp(c.cast("string"))
      case goLayout =>
        val fmt = GoTimeLayout.translate(goLayout)
        val t = try_to_timestamp(c.cast("string"), lit(fmt))
        val withYear =
          if (addYear)
            make_timestamp(year(current_date()), month(t), dayofmonth(t),
              hour(t), minute(t), second(t).cast("decimal(8,6)"))
          else t
        location match {
          case Some(tz) if !goLayout.exists("ZX-".contains(_)) =>
            to_utc_timestamp(withYear, tz)
          case _ => withYear
        }
    }
    coalesce(attempts: _*)
  }

  override def success(df: DataFrame): Column = parsed(df).isNotNull

  def transform(df: DataFrame, cond: Column): DataFrame =
    StageCols.setField(df, target, parsed(df), cond && parsed(df).isNotNull, overwrite)
}
