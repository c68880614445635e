package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Static guards over src/main: anti-patterns that are invisible to unit
  * tests at test scale but fatal at cluster scale (the brief's "works on
  * 60k rows" trap). Runs as a plain file scan so a regression fails CI
  * even if no behavioural test covers the offending path. */
class SourceGuardSpec extends AnyFunSuite {

  private def mainSources: Seq[(Path, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => p -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq
  }

  test("no driver-side collect() in main sources") {
    // collect() pulls the whole distributed result into the driver — any
    // sink or operator doing it OOMs at real scale. toLocalIterator /
    // foreachPartition are the bounded alternatives.
    val offenders = mainSources.collect {
      case (p, text) if text.contains(".collect()") || text.contains("collectAsList") => p
    }
    assert(offenders.isEmpty,
      s"driver-side collect in main sources: ${offenders.mkString(", ")}")
  }

  test("no NUL or other raw control bytes in main sources") {
    // a raw control byte makes git treat the file as binary (no diff or
    // review); escape sequences express the same value as text
    val offenders = mainSources.collect {
      case (p, text) if text.exists(c => c < ' ' && c != '\n' && c != '\r' && c != '\t') => p
    }
    assert(offenders.isEmpty,
      s"raw control bytes in main sources: ${offenders.mkString(", ")}")
  }
}
