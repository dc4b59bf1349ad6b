package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Repo-hygiene gate: no Scala source file may contain raw control
  * bytes (anything < 0x20 other than tab/LF/CR). A single NUL or
  * PK-ZIP-style magic byte materialized literally in a
  * string makes git treat the whole file as binary — no diffs, no
  * blame, unreviewable history (bit ParserFuzzSpec twice; see
  * CLAUDE.md's plain-text-source gotcha). Magic bytes in fixtures
  * belong in `\uXXXX` escapes or byte-array literals. */
class SourceHygieneSpec extends AnyFunSuite {

  private val allowed = Set[Byte](0x09, 0x0a, 0x0d)

  test("no raw control bytes in any .scala source under src/") {
    val root = Paths.get("src")
    val offenders = Files
      .walk(root)
      .iterator()
      .asScala
      .filter(p => p.toString.endsWith(".scala") && Files.isRegularFile(p))
      .flatMap { p =>
        val bytes = Files.readAllBytes(p)
        val bad = bytes.iterator.zipWithIndex.collect {
          case (b, i) if b >= 0 && b < 0x20 && !allowed.contains(b) => i
        }.take(3).toList
        if (bad.isEmpty) None else Some(s"$p at byte offsets $bad")
      }
      .toList
    assert(offenders.isEmpty, s"control bytes found in: ${offenders.mkString("; ")}")
  }
}
