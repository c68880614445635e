package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.paths.FieldPath

/** Json: parse a string field as JSON (reference: filter/json.go:36-123).
  *
  * Three modes, all plan-time typed:
  *   - `schema` given → `from_json` with that schema; fields merge to root
  *     (overwrite / no-overwrite) or under `target`.
  *   - no schema + `target` → parse to `MapType(String, String)`.
  *   - no schema + `infer=true` → sample the column once at plan time to
  *     infer a schema (driver-side read of a few rows, then a normal typed
  *     `from_json` — the 100 TB path still does a single pass).
  *
  * `include`/`exclude` project keys before merging.
  */
final case class JsonFilter(
    field: String,
    target: Option[String] = None,
    schema: Option[StructType] = None,
    include: Seq[String] = Nil,
    exclude: Seq[String] = Nil,
    overwrite: Boolean = true,
    infer: Boolean = false) extends EventFilter {

  private def resolveSchema(df: DataFrame): Option[StructType] = schema.orElse {
    if (!infer) None
    else {
      val sample = df.select(FieldPath.resolve(df, field).getOrElse(lit(null)).cast("string"))
        .na.drop().limit(100)
      val inferred = df.sparkSession.read.json(
        sample.as(org.apache.spark.sql.Encoders.STRING))
      Some(inferred.schema)
    }
  }

  private def keep(name: String): Boolean =
    (include.isEmpty || include.contains(name)) && !exclude.contains(name)

  private def parsedCol(df: DataFrame): (Column, DataType) = {
    val c = FieldPath.resolve(df, field).getOrElse(lit(null)).cast("string")
    resolveSchema(df) match {
      case Some(st) =>
        val pruned = StructType(st.fields.filter(f => keep(f.name)))
        (from_json(c, pruned), pruned)
      case None =>
        val mt = MapType(StringType, StringType)
        var m = from_json(c, mt)
        if (include.nonEmpty || exclude.nonEmpty)
          m = map_filter(m, (k, _) => {
            val inc = if (include.isEmpty) lit(true)
              else k.isin(include.map(lit(_)): _*)
            val exc = if (exclude.isEmpty) lit(false)
              else k.isin(exclude.map(lit(_)): _*)
            inc && !exc
          })
        (m, mt)
    }
  }

  override def success(df: DataFrame): Column = {
    // from_json with a STRUCT schema is PERMISSIVE: malformed JSON comes
    // back as a row of nulls, NOT null — `.isNotNull` called garbage a
    // success, so failTag never fired and transform nulled every schema
    // field on the corrupt row. Probe with try_parse_json (the
    // Codecs.jsonDecode contract) instead.
    val c = FieldPath.resolve(df, field).getOrElse(lit(null)).cast("string")
    // the object probe (Codecs.jsonDecode contract): a bare array/scalar
    // is valid JSON but can't become an event — the reference's
    // Unmarshal-into-map fails on it too
    c.isNotNull && try_parse_json(c).isNotNull &&
      c.rlike("""^\s*\{""") && parsedCol(df)._1.isNotNull
  }

  def transform(df: DataFrame, cond: Column): DataFrame = {
    val (parsed, tpe) = parsedCol(df)
    target match {
      case Some(t) => StageCols.setField(df, t, parsed, cond, overwrite)
      case None => tpe match {
        case st: StructType =>
          val tmp = "__graft_json"
          val withP = df.withColumn(tmp, when(cond, parsed))
          val out = st.fields.foldLeft(withP) { (d, f) =>
            StageCols.setField(d, f.name, col(tmp).getField(f.name),
              cond && col(tmp).isNotNull, overwrite)
          }
          out.drop(tmp)
        case _ =>
          sys.error("Json without schema/infer needs a target column " +
            "(dynamic keys cannot merge into a static schema)")
      }
    }
  }
}
