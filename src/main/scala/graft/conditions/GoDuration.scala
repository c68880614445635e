package graft.conditions

/** Parser for Go `time.ParseDuration` strings ("300ms", "-1.5h", "2h45m").
  * Used by the Before/After condition atoms (reference:
  * condition_filter/filter.go:588-626). Returns seconds. */
object GoDuration {
  private val unitSeconds: Map[String, Double] = Map(
    "ns" -> 1e-9, "us" -> 1e-6, "µs" -> 1e-6, "μs" -> 1e-6,
    "ms" -> 1e-3, "s" -> 1.0, "m" -> 60.0, "h" -> 3600.0)

  private val Part = """(\d+(?:\.\d*)?|\.\d+)(ns|us|µs|μs|ms|s|m|h)""".r

  def parseSeconds(s: String): Double = {
    val t = s.trim
    val (sign, body) =
      if (t.startsWith("-")) (-1.0, t.drop(1))
      else if (t.startsWith("+")) (1.0, t.drop(1))
      else (1.0, t)
    if (body == "0") return 0.0
    val parts = Part.findAllMatchIn(body).toSeq
    val consumed = parts.map(_.matched.length).sum
    require(parts.nonEmpty && consumed == body.length,
      s"invalid Go duration: '$s'")
    sign * parts.map(m => m.group(1).toDouble * unitSeconds(m.group(2))).sum
  }
}
