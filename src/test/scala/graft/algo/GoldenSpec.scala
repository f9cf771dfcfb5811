package graft.algo

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Golden span-sequence suite: per-row (kind, text, media_ref, order)
  * equality + metadata fields vs the reference's fixture corpora
  * (FIXTURES.md §1–2). test-pages must ALL pass; the other corpora are
  * tracked pass-lists that must not regress (site rules land per tier,
  * SURVEY.md §5).
  */
class GoldenSpec extends AnyFunSuite {

  private def run(corpus: String): Map[String, FixtureRunner.FixtureResult] =
    FixtureRunner.corpusDirs(corpus).map { d =>
      val r = try FixtureRunner.runOne(d) catch {
        case e: Throwable => FixtureRunner.FixtureResult(
          d.getFileName.toString, spansMatch = false,
          List(s"EXCEPTION $e"), None, 0, 0, "exception")
      }
      r.name -> r
    }.toMap

  test("test-pages: all 52 fixtures pass spans + metadata") {
    val results = run("test-pages")
    val failures = results.values.filter(r => !r.spansMatch || r.metaDiffs.nonEmpty)
    assert(failures.isEmpty,
      "\n" + failures.map(f => s"${f.name}: ${f.metaDiffs.mkString("; ")} ${f.firstSpanDiff.getOrElse("")}").mkString("\n"))
  }

  // Pass-lists: fixtures that currently pass fully; must never regress.
  private val realworldPassList = Set(
    // regenerate with: sbt "runMain graft.algo.FixtureRunner realworld-pages"
  )

  test("realworld-pages: tracked pass rate does not regress") {
    val results = run("realworld-pages")
    val fullPass = results.values.count(r => r.spansMatch && r.metaDiffs.isEmpty)
    val contentPass = results.values.count(_.spansMatch)
    info(s"realworld-pages: $fullPass/${results.size} full, $contentPass/${results.size} content")
    assert(fullPass >= 78, s"regression: $fullPass full passes < 78")
    assert(contentPass >= 78, s"regression: $contentPass content passes < 78")
  }

  test("ex-pages: tracked pass rate does not regress") {
    val results = run("ex-pages")
    val fullPass = results.values.count(r => r.spansMatch && r.metaDiffs.isEmpty)
    info(s"ex-pages: $fullPass/${results.size} full")
    assert(fullPass >= 44, s"regression: $fullPass full passes < 44")
  }
}
