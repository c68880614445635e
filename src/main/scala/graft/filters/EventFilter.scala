package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.conditions.ConditionFilter
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

  /** `[a]` / bare → top-level column name (nested targets are round-2). */
  def topLevel(target: String): String = {
    val t = target.trim
    if (t.startsWith("[") && t.endsWith("]") && !t.drop(1).contains("["))
      t.substring(1, t.length - 1)
    else t
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
    * `overwrite=false` keeps an existing non-null value. */
  def setField(df: DataFrame, target: String, value: Column, cond: Column,
      overwrite: Boolean): DataFrame = {
    val name = topLevel(target)
    if (df.columns.contains(name)) {
      val cur = col(s"`$name`")
      val v =
        if (overwrite) when(cond, value).otherwise(cur)
        else when(cond && cur.isNull, value).otherwise(cur)
      df.withColumn(name, v)
    } else df.withColumn(name, when(cond, value))
  }
}
