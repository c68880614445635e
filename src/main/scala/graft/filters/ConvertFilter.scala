package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.paths.FieldPath

/** Convert: cast fields to int/uint/float/bool/string/array(T) with the
  * reference's failure handling (reference: filter/convert.go:138-237):
  *
  *   - `removeIfFail`  null the field when the cast fails
  *   - `settoIfFail`   substitute a constant when the cast fails
  *   - `settoIfNil`    substitute a constant when the source is null
  *
  * All casts are ANSI-free `try`-style (`cast` returns null on failure),
  * fully codegen'd; array casts use the `transform` higher-order function.
  */
object ConvertFilter {
  final case class Spec(
      to: String,
      removeIfFail: Boolean = false,
      settoIfFail: Option[Any] = None,
      settoIfNil: Option[Any] = None)

  private def targetType(to: String): DataType = to match {
    case "int" | "uint" => LongType
    case "float" => DoubleType
    case "bool" => BooleanType
    case "string" => StringType
    case "array(int)" => ArrayType(LongType)
    case "array(float)" => ArrayType(DoubleType)
    case "array(string)" => ArrayType(StringType)
    case other => sys.error(s"Convert: unsupported target type '$other'")
  }
}

final case class ConvertFilter(fields: Map[String, ConvertFilter.Spec])
    extends EventFilter {
  import ConvertFilter._

  private def castOf(src: Column, spec: Spec): (Column, Column) = {
    val t = targetType(spec.to)
    val casted = t match {
      case ArrayType(et, _) =>
        org.apache.spark.sql.functions.transform(src, x => x.try_cast(et))
      case LongType if spec.to == "uint" =>
        val c = src.try_cast(LongType)
        when(c >= 0, c) // negative → fail, like Go ParseUint
      case dt => src.try_cast(dt)
    }
    val failed = src.isNotNull && casted.isNull
    (casted, failed)
  }

  override def success(df: DataFrame): Column =
    fields.map { case (f, spec) =>
      FieldPath.resolve(df, f) match {
        case None => lit(true)
        case Some(src) =>
          val (_, failed) = castOf(src, spec)
          !failed || lit(spec.settoIfFail.isDefined || spec.removeIfFail)
      }
    }.reduceOption(_ && _).getOrElse(lit(true))

  def transform(df: DataFrame, cond: Column): DataFrame =
    fields.foldLeft(df) { case (d, (f, spec)) =>
      FieldPath.resolve(d, f) match {
        case None => d
        case Some(src) =>
          val (casted, failed) = castOf(src, spec)
          val t = targetType(spec.to)
          var v: Column = casted
          spec.settoIfFail.foreach(x => v = when(failed, lit(x).cast(t)).otherwise(v))
          if (spec.removeIfFail && spec.settoIfFail.isEmpty)
            v = when(failed, lit(null).cast(t)).otherwise(v)
          spec.settoIfNil.foreach(x => v = when(src.isNull, lit(x).cast(t)).otherwise(v))
          // DOCUMENTED DIVERGENCE from the reference's dynamic-map
          // semantics: one Spark column has ONE type, so rows excluded
          // by an `if` guard (or failed with no failure handler) cannot
          // keep an original value whose type clashes with the target —
          // they go through try_cast, which nulls uncastable values.
          // The reference would leave the original (string) value in
          // place. Pipelines that need keep-original-on-unmatched must
          // convert into a DIFFERENT target field (Add + Convert) or run
          // Convert unguarded; the gate fixtures and MIGRATION.md state
          // this contract.
          d.withColumn(StageCols.topLevel(f), when(cond, v).otherwise(src.try_cast(t)))
      }
    }
}
