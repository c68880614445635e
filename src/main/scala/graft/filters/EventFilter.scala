package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}

import graft.conditions.ConditionFilter
import graft.paths.FieldPath
import graft.render.Render

/** A per-event transform operator. The whole chain is declarative: each
  * filter contributes `when(cond, …)` column expressions, so Catalyst sees
  * one flat projection per pipeline and can fuse, prune and push down
  * across operator boundaries — the single biggest structural win over the
  * reference's per-event interpreter loop at scale.
  *
  * `success` is the reference's `(event, bool)` second return: evaluated
  * against the *input* columns, materialized once by the FilterBox so
  * fail-tagging and conditional post-processing agree with it.
  */
trait EventFilter {
  /** Parse/convert success predicate over the input frame. */
  def success(df: DataFrame): Column = lit(true)

  /** Apply the transform for rows where `cond`; leave others untouched. */
  def transform(df: DataFrame, cond: Column): DataFrame

  /** Unconditional fast path (lets Remove/Rename drop real columns). */
  def transformAll(df: DataFrame): DataFrame = transform(df, lit(true))
}

/** The reference's FilterBox wrapper: `if` guards (AND-ed), the filter,
  * then add_fields/remove_fields on success and failure tagging
  * (reference: topology/filter.go:69-110). */
final case class FilterBox(
    filter: EventFilter,
    ifConds: Seq[String] = Nil,
    addFields: Map[String, String] = Map.empty,
    removeFields: Seq[String] = Nil,
    failTag: Option[String] = None) {

  def apply(df: DataFrame): DataFrame = stage(df)

  def stage: DataFrame => DataFrame = { df0 =>
    val unconditional = ifConds.isEmpty
    val guard = ifConds.map(c => ConditionFilter.compile(c, df0))
      .reduceOption(_ && _).getOrElse(lit(true))

    if (unconditional && addFields.isEmpty && removeFields.isEmpty && failTag.isEmpty) {
      // common case: no wrapper work at all — keep the plan minimal
      filter.transformAll(df0)
    } else {
      // materialize success once so post-processing sees a stable value
      val df1 = df0.withColumn(StageCols.Succ, guard && filter.success(df0))
      val succ = col(StageCols.Succ)
      var out = filter.transform(df1, succ)
      addFields.foreach { case (k, v) =>
        out = StageCols.setField(out, k, Render.compile(v)(out), succ, overwrite = true)
      }
      removeFields.foreach { f =>
        val name = StageCols.topLevel(f)
        if (out.columns.contains(name))
          out = out.withColumn(name, when(succ, lit(null)).otherwise(col(s"`$name`")))
      }
      failTag.foreach { tag =>
        out = StageCols.appendTag(out, tag, guard && !succ)
      }
      out.drop(StageCols.Succ)
    }
  }
}

/** Helpers shared by filter implementations. */
object StageCols {
  val Succ = "__graft_succ"

  /** `[a]` / bare → top-level column name. */
  def topLevel(target: String): String = {
    val t = target.trim
    if (t.startsWith("[") && t.endsWith("]") && !t.drop(1).contains("["))
      t.substring(1, t.length - 1)
    else t
  }

  /** Multi-level bracket TARGET (`[a][b]…`) → its key segments; None for
    * bare names and one-level `[a]` (those take the top-level path). */
  private[filters] def multiSegs(target: String): Option[Seq[String]] = {
    val t = target.trim
    if (t.startsWith("[") && t.matches("""^(\[[^\[\]]+\])+$""")) {
      val segs = """\[([^\[\]]+)\]""".r.findAllMatchIn(t).map(_.group(1)).toSeq
      if (segs.length >= 2) Some(segs) else None
    } else None
  }

  /** Append `tag` to the `tags` array for rows where `failed` holds
    * (reference: topology/filter.go:81-91 failure tagging). */
  def appendTag(df: DataFrame, tag: String, failed: Column): DataFrame = {
    val tagCol =
      if (df.columns.contains("tags"))
        when(failed, array_union(
          coalesce(col("tags"), array()), array(lit(tag)))).otherwise(col("tags"))
      else when(failed, array(lit(tag))).cast(ArrayType(StringType))
    df.withColumn("tags", tagCol)
  }

  /** Reference FieldSetter semantics: set k→v for rows where cond holds;
    * `overwrite=false` keeps an existing non-null value. A multi-level
    * bracket target (`[a][b]`) sets a NESTED struct field like the
    * reference's MultiLevelFieldSetter builds nested maps
    * (field_setter/mfields_field_setter.go:23-38) — the r17
    * reference-parity e2e spec caught `'[a][b]'` landing as a literal
    * top-level column named "[a][b]". */
  def setField(df: DataFrame, target: String, value: Column, cond: Column,
      overwrite: Boolean): DataFrame =
    multiSegs(target) match {
      case Some(segs) => setNested(df, segs, value, cond, overwrite)
      case None =>
        val name = topLevel(target)
        if (df.columns.contains(name)) {
          val cur = col(s"`$name`")
          val v =
            if (overwrite) when(cond, value).otherwise(cur)
            else when(cond && cur.isNull, value).otherwise(cur)
          df.withColumn(name, v)
        } else df.withColumn(name, when(cond, value))
    }

  /** Multi-level field DELETE (reference field_deleter semantics,
    * field_deleter/mfields_field_deleter.go: descend EXISTING struct
    * levels; a missing or non-struct level makes the whole delete a
    * no-op). Unconditional (`cond = None`) really removes the key via
    * `dropFields`; a conditional delete NULLs the leaf instead (a
    * columnar schema cannot branch shape per row — the same
    * approximation the one-level conditional remove has always used).
    * A leaf that is its struct's ONLY field is nulled rather than
    * dropped (Spark structs cannot be empty, where the reference keeps
    * an empty map). */
  def deleteField(df: DataFrame, target: String, cond: Option[Column]): DataFrame =
    multiSegs(target) match {
      case None =>
        val f = topLevel(target)
        if (!df.columns.contains(f)) df
        else cond match {
          case None => df.drop(f)
          case Some(c) =>
            df.withColumn(f, when(c, lit(null)).otherwise(col(s"`$f`")))
        }
      case Some(segs) =>
        val topField = df.schema.fields.find(_.name.equalsIgnoreCase(segs.head))
        val parent = segs.tail.dropRight(1)
          .foldLeft(topField.map(_.dataType)) {
            case (Some(st: StructType), k) =>
              st.fields.find(_.name.equalsIgnoreCase(k)).map(_.dataType)
            case _ => None
          }
        parent match {
          case Some(pst: StructType)
              if pst.fields.exists(_.name.equalsIgnoreCase(segs.last)) =>
            cond match {
              case None if pst.fields.length > 1 =>
                val nested = segs.tail.map(s => s"`$s`").mkString(".")
                df.withColumn(topField.get.name,
                  col(s"`${topField.get.name}`").dropFields(nested))
              case None =>
                setField(df, target, lit(null), lit(true), overwrite = true)
              case Some(c) =>
                setField(df, target, lit(null), c, overwrite = true)
            }
          case _ => df // missing / non-struct level: reference no-op
        }
    }

  /** Nested set through struct columns: existing struct levels update
    * with `withField` (sibling fields preserved); a missing or
    * non-struct level is rebuilt as a fresh struct holding only the new
    * path (the reference descends existing maps and creates missing
    * ones; its quirk of silently writing to the PARENT when a level
    * exists as a non-map is not replicated — replacing the scalar with
    * the struct the config asked for is the least surprising reading). */
  private def setNested(df: DataFrame, segs: Seq[String], value: Column,
      cond: Column, overwrite: Boolean): DataFrame = {
    val top = segs.head
    val leafVal = FieldPath.resolveSegs(df, segs.map(FieldPath.Key)) match {
      case Some((cur, _)) =>
        if (overwrite) when(cond, value).otherwise(cur)
        else when(cond && cur.isNull, value).otherwise(cur)
      case None => when(cond, value)
    }
    def build(curType: Option[DataType], curCol: Option[Column],
        path: Seq[String]): Column =
      path match {
        case Seq(last) => (curType, curCol) match {
          case (Some(_: StructType), Some(c)) => c.withField(s"`$last`", leafVal)
          case _ => struct(leafVal.as(last))
        }
        case head +: tail => (curType, curCol) match {
          case (Some(st: StructType), Some(c)) =>
            val childField = st.fields.find(_.name.equalsIgnoreCase(head))
            c.withField(s"`$head`", build(childField.map(_.dataType),
              childField.map(f => c.getField(f.name)), tail))
          case _ => struct(build(None, None, tail).as(head))
        }
      }
    val topField = df.schema.fields.find(_.name.equalsIgnoreCase(top))
    df.withColumn(topField.map(_.name).getOrElse(top),
      build(topField.map(_.dataType),
        topField.map(f => col(s"`${f.name}`")), segs.tail))
  }
}
