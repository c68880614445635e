package graft.pipeline

import scala.jdk.CollectionConverters._

/** YAML pipeline config → typed spec (reference:
  * internal/config/yaml_config_parser.go + config_parser.go:18-25).
  * `${ENV}` placeholders are expanded like the reference
  * (yaml_config_parser.go:48). */
object PipelineConfig {

  final case class Spec(
      inputs: Seq[(String, Map[String, Any])],
      filters: Seq[(String, Map[String, Any])],
      outputs: Seq[(String, Map[String, Any])])

  def parseFile(path: String): Spec =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def parse(yamlText: String): Spec = {
    val expanded = expandEnv(yamlText)
    val yaml = new org.yaml.snakeyaml.Yaml()
    // yaml.load returns null for an empty/comment-only document — a
    // truncated file mid-editor-save under --watch must surface as a
    // named config error, not an NPE from getOrElse on null
    val root = Option(toScala(yaml.load[Object](expanded)))
      .map(_.asInstanceOf[Map[String, Any]])
      .getOrElse(sys.error("pipeline config is empty — expected " +
        "inputs/filters/outputs sections"))
    def section(name: String): Seq[(String, Map[String, Any])] =
      root.getOrElse(name, Seq.empty) match {
        case xs: Seq[_] => xs.map {
          case m: Map[_, _] if m.size == 1 =>
            val (k, v) = m.head
            (k.toString, Option(v).map(_.asInstanceOf[Map[String, Any]])
              .getOrElse(Map.empty[String, Any]))
          case other => sys.error(s"bad $name entry: $other")
        }
        case null => Nil
        case other => sys.error(s"'$name' must be a list, got $other")
      }
    Spec(section("inputs"), section("filters"), section("outputs"))
  }

  /** Redact likely-secret values for logging (reference:
    * internal/config/config_parser.go:28-52 scrubs before logging). */
  def scrub(conf: Map[String, Any]): Map[String, Any] = {
    val sensitive = """(?i).*(password|secret|token|key|credential).*""".r
    conf.map {
      case (k, _) if sensitive.matches(k) => k -> "***"
      case (k, v: Map[_, _]) => k -> scrub(v.asInstanceOf[Map[String, Any]])
      case kv => kv
    }
  }

  private def expandEnv(text: String): String =
    """\$\{(\w+)\}""".r.replaceAllIn(text,
      m => java.util.regex.Matcher.quoteReplacement(
        sys.env.getOrElse(m.group(1), m.matched)))

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  // typed accessors for filter/sink configs
  implicit final class ConfigOps(private val m: Map[String, Any]) extends AnyVal {
    def str(k: String): Option[String] = m.get(k).map(_.toString)
    def strReq(k: String): String =
      str(k).getOrElse(sys.error(s"missing required config key '$k' in $m"))
    def int(k: String, default: Int): Int =
      m.get(k).map(_.toString.toInt).getOrElse(default)
    def long(k: String, default: Long): Long =
      m.get(k).map(_.toString.toLong).getOrElse(default)
    def bool(k: String, default: Boolean): Boolean =
      m.get(k).map(_.toString.toBoolean).getOrElse(default)
    def dbl(k: String, default: Double): Double =
      m.get(k).map(_.toString.toDouble).getOrElse(default)
    def strSeq(k: String): Seq[String] =
      m.get(k).map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Nil)
    def anyMap(k: String): Map[String, Any] =
      m.get(k).map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)
    def strMap(k: String): Map[String, String] =
      anyMap(k).map { case (a, b) => a -> String.valueOf(b) }
  }
}
