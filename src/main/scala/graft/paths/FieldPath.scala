package graft.paths

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field addressing for the engine, mirroring the reference's "value render
  * protocol" (reference: value_render/value_render.go:28-56) on top of a
  * schema-ful DataFrame:
  *
  *   - bare name          `fieldA`
  *   - multi-level path   `[a][b]`       (reference: mfields_value_render.go)
  *   - jsonpath           `$.a.b[0].c`   (reference: jsonpath_render.go)
  *
  * Resolution is schema-aware and happens once at plan time:
  *   - struct step  → `getField`
  *   - map step     → `getItem` (null when absent, like the reference's
  *                    failed lookup)
  *   - array step   → `[idx]` (jsonpath only)
  *   - string step  → the remaining path is evaluated with
  *                    `get_json_object` (the event overflow convention:
  *                    unparsed JSON rides in a string column)
  *
  * A path whose head column does not exist in the schema resolves to None —
  * the planner turns that into constant-false / null, which matches the
  * reference's missing-key behaviour exactly and lets Catalyst fold the
  * whole predicate away.
  */
object FieldPath {

  sealed trait Seg
  final case class Key(name: String) extends Seg
  final case class Idx(i: Int) extends Seg

  private val MultiLevel = """^(\[[-\w@.]+\])+$""".r

  /** Parse any of the three syntaxes into segments. */
  def parse(path: String): Seq[Seg] = {
    val p = path.trim
    if (p.startsWith("$.")) parseJsonPath(p)
    else if (MultiLevel.matches(p))
      """\[([^\]]+)\]""".r.findAllMatchIn(p).map(m => Key(m.group(1))).toSeq
    else Seq(Key(p))
  }

  private def parseJsonPath(p: String): Seq[Seg] = {
    // $.a.b[0].c  — dotted keys with optional [n] indexes
    val body = p.stripPrefix("$.")
    body.split('.').toSeq.flatMap { part =>
      val idxs = """\[(\d+)\]""".r.findAllMatchIn(part).map(_.group(1).toInt).toSeq
      val key = part.takeWhile(_ != '[')
      (if (key.nonEmpty) Seq(Key(key)) else Nil) ++ idxs.map(Idx)
    }
  }

  /** Resolve segments against a DataFrame's schema. None = statically
    * absent (reference: lookup failure → condition false). */
  def resolve(df: DataFrame, path: String): Option[Column] =
    resolveTyped(df, path).map(_._1)

  /** Like [[resolve]] but also returns the static type of the result.
    * A path that descends into a JSON string column yields StringType
    * (the `get_json_object` result). */
  def resolveTyped(df: DataFrame, path: String): Option[(Column, DataType)] =
    resolveSegs(df, parse(path))

  def resolveSegs(df: DataFrame, segs: Seq[Seg]): Option[(Column, DataType)] =
    resolveSegsDetailed(df, segs).map(t => (t._1, t._2))

  /** Like [[resolveSegs]], plus whether the path descended INTO a JSON
    * overflow string column — the result is then the STRING IMAGE of a
    * parsed-json scalar (get_json_object), not a typed column, which
    * matters to consumers applying type-based semantics (template
    * truthiness treats the image "0" as the number zero, not as a
    * non-empty string). */
  def resolveSegsDetailed(df: DataFrame, segs: Seq[Seg]): Option[(Column, DataType, Boolean)] = {
    // a degenerate user path ("$.", "[]") parses to zero segments —
    // unresolvable, and the contract for unresolvable is None (missing
    // field), never a plan-time crash from a template string
    if (segs.isEmpty) return None
    segs.head match {
      case Idx(_) => None
      case Key(head) =>
        df.schema.fields.find(_.name.equalsIgnoreCase(head)) match {
          case None => None
          case Some(f) => walk(col(s"`${f.name}`"), f.dataType, segs.tail)
        }
    }
  }

  private def walk(cur: Column, tpe: DataType, rest: Seq[Seg]): Option[(Column, DataType, Boolean)] =
    if (rest.isEmpty) Some((cur, tpe, false))
    else (tpe, rest.head) match {
      case (st: StructType, Key(k)) =>
        st.fields.find(_.name.equalsIgnoreCase(k)) match {
          case None => None
          case Some(f) => walk(cur.getField(f.name), f.dataType, rest.tail)
        }
      case (mt: MapType, Key(k)) => walk(cur.getItem(k), mt.valueType, rest.tail)
      case (at: ArrayType, Idx(i)) => walk(cur.getItem(i), at.elementType, rest.tail)
      case (StringType, _) =>
        // JSON overflow column: finish the path with get_json_object.
        // Keys go in BRACKET-QUOTED form: a bracket-syntax key may
        // itself contain '.' ([attrs][a.b]), and the dotted form would
        // descend into nested objects instead of looking up the literal
        // key — wrong field, silently
        val jp = "$" + rest.map {
          case Key(k) => s"['${k.replace("'", "\\'")}']"
          case Idx(i) => s"[$i]"
        }.mkString
        Some((get_json_object(cur, jp), StringType, true))
      case _ => None
    }
}
