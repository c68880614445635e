package graft.conditions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (reference test style: condition_filter/filter_test.go's
  * exhaustive DSL cases, generalized with generators). */
class DslPropertySpec extends SparkSpec {

  /** Deterministic sampling (scalatestplus isn't on the offline
    * classpath; raw ScalaCheck generators + a fixed seed are enough). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
  import spark.implicits._

  // one-row frame with known values; each property evaluates the compiled
  // predicate against a Scala-side reference evaluator
  private lazy val df = Seq((1L, "app", 20L, "", Option.empty[Long]))
    .toDF("id", "name", "age", "blank", "nval")

  private sealed trait Node
  private case class Leaf(atom: String, truth: Boolean) extends Node
  private case class And(l: Node, r: Node) extends Node
  private case class Or(l: Node, r: Node) extends Node
  private case class Not(c: Node) extends Node

  private val leaves = Seq(
    Leaf("""EQ(name,"app")""", true),
    Leaf("""EQ(name,"web")""", false),
    Leaf("EQ(age,20)", true),
    Leaf("EQ(age,21)", false),
    Leaf("Exist(name)", true),
    Leaf("Exist(missing_col)", false),
    Leaf("""HasPrefix(name,"a")""", true),
    Leaf("""Contains(name,"zz")""", false),
    Leaf("""Match(name,"^a.*p$")""", true))

  private def genNode(depth: Int): Gen[Node] =
    if (depth <= 0) Gen.oneOf(leaves)
    else Gen.frequency(
      3 -> Gen.oneOf(leaves),
      2 -> (for { l <- genNode(depth - 1); r <- genNode(depth - 1) } yield And(l, r)),
      2 -> (for { l <- genNode(depth - 1); r <- genNode(depth - 1) } yield Or(l, r)),
      1 -> genNode(depth - 1).map(Not(_)))

  private def render(n: Node): String = n match {
    case Leaf(a, _) => a
    case And(l, r) => s"(${render(l)} && ${render(r)})"
    case Or(l, r) => s"(${render(l)} || ${render(r)})"
    case Not(c) => s"!(${render(c)})"
  }

  private def truth(n: Node): Boolean = n match {
    case Leaf(_, t) => t
    case And(l, r) => truth(l) && truth(r)
    case Or(l, r) => truth(l) || truth(r)
    case Not(c) => !truth(c)
  }

  test("random boolean trees compile to predicates matching reference semantics") {
    samples(genNode(4), 60).foreach { node =>
      val dsl = render(node)
      val rows = df.filter(ConditionFilter.compile(dsl, df)).count()
      assert((rows == 1) == truth(node), s"dsl: $dsl")
    }
  }

  // --- Go-template prefix-call pipelines ({{if and/or/not (...)}}) ----------

  /** Template-atom truth under Go semantics: Some(b) = evaluates to b,
    * None = the atom ERRORS (a nil comparison aborts the whole render;
    * Go ≥1.18 and/or short-circuit, so an un-reached error is no error).
    * Nil TRUTHINESS (`.nval`) is falsy, not an error. */
  private val tplAtomTruth: Map[String, Option[Boolean]] = Map(
    """eq .name "app"""" -> Some(true),
    """eq .name "web"""" -> Some(false),
    "gt .age 10" -> Some(true),
    "lt .age 10" -> Some(false),
    ".name" -> Some(true),
    ".blank" -> Some(false),
    """hasprefix .name "a"""" -> Some(true),
    """contains .name "zz"""" -> Some(false),
    "lt .nval 10" -> None,
    """eq .nval "app"""" -> None,
    ".nval" -> Some(false))
  private val tplLeaves =
    tplAtomTruth.keys.toSeq.sorted.map(a => Leaf(a, tplAtomTruth(a).contains(true)))

  /** Three-valued reference evaluator: Go's short-circuit and/or with
    * error-abort — an error in any REACHED arm poisons the whole
    * condition (the reference's Render returns err → not "y" → drop,
    * value_render/template_value_render.go:154). */
  private def truthTpl(n: Node): Option[Boolean] = n match {
    case Leaf(a, _) => tplAtomTruth(a)
    case And(l, r) => truthTpl(l) match {
      case Some(true) => truthTpl(r)
      case other => other // false short-circuits; None propagates
    }
    case Or(l, r) => truthTpl(l) match {
      case Some(false) => truthTpl(r)
      case other => other // true short-circuits; None propagates
    }
    case Not(c) => truthTpl(c).map(!_)
  }

  private def genTplNode(depth: Int): Gen[Node] =
    if (depth <= 0) Gen.oneOf(tplLeaves)
    else Gen.frequency(
      3 -> Gen.oneOf(tplLeaves),
      2 -> (for { l <- genTplNode(depth - 1); r <- genTplNode(depth - 1) }
        yield And(l, r)),
      2 -> (for { l <- genTplNode(depth - 1); r <- genTplNode(depth - 1) }
        yield Or(l, r)),
      1 -> genTplNode(depth - 1).map(Not(_)))

  /** Render as a Go prefix call. Bare paths may ride un-parenthesized as
    * and/or arguments (Go allows both); comparisons must parenthesize. */
  private def renderTpl(n: Node): String = n match {
    case Leaf(a, _) => a
    case And(l, r) => s"and ${arg(l)} ${arg(r)}"
    case Or(l, r) => s"or ${arg(l)} ${arg(r)}"
    case Not(c) => s"not ${arg(c)}"
  }
  private def arg(n: Node): String = n match {
    case Leaf(a, _) if a.startsWith(".") => a
    case other => s"(${renderTpl(other)})"
  }

  test("random template and/or/not pipelines match reference semantics") {
    samples(genTplNode(4), 60).foreach { node =>
      val tpl = s"{{if ${renderTpl(node)}}}y{{end}}"
      val rows = df.filter(ConditionFilter.compile(tpl, df)).count()
      assert((rows == 1) == truthTpl(node).contains(true), s"template: $tpl")
    }
  }

  test("go time layouts round-trip random timestamps") {
    import org.apache.spark.sql.functions._
    // day-of-week layouts (Mon/Monday → EEE/EEEE) format fine but Spark's
    // post-3.0 parser rejects them for PARSING; users needing them set
    // spark.sql.legacy.timeParserPolicy=LEGACY (documented limitation)
    val layouts = Seq("2006-01-02 15:04:05", "02/Jan/2006:15:04:05",
      "2006/01/02 03:04:05 PM")
    // seconds in 1990..2030, avoiding sub-second precision (layouts above are second-granular)
    val gen = for {
      epoch <- Gen.choose(631152000L, 1893456000L)
      layout <- Gen.oneOf(layouts)
    } yield (epoch, layout)
    samples(gen, 40).foreach { case (epoch, layout) =>
      val fmt = graft.filters.GoTimeLayout.translate(layout)
      val out = spark.range(1).select(
        timestamp_seconds(lit(epoch)).as("ts"))
        .select(col("ts"), to_timestamp(date_format(col("ts"), fmt), fmt).as("rt"))
        .collect().head
      assert(out.getTimestamp(0) == out.getTimestamp(1), s"layout: $layout fmt: $fmt")
    }
  }
}
