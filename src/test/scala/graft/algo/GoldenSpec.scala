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

  // Named pass-lists (regenerate with:
  // sbt "runMain graft.algo.FixtureRunner <corpus>"): every fixture in both
  // corpora currently passes fully, and the suite asserts SET EQUALITY so a
  // simultaneous one-pass/one-fail swap (or a fixture vanishing from the
  // corpus dir) cannot hide behind a count floor.
  private val realworldPassList = Set(
    "aclu", "aktualne", "archive-of-our-own", "ars-1", "bbc-1", "blogger", "breitbart",
    "buzzfeed-1", "citylab-1", "cnet", "cnet-svg-classes", "cnn", "daringfireball-1", "dev418",
    "dropbox-blog", "ebb-org", "ehow-1", "ehow-2", "engadget", "firefox-nightly-blog", "folha",
    "gitlab-blog", "gmw", "google-sre-book-1", "guardian-1", "heise", "herald-sun-1",
    "hukumusume", "iab-1", "ietf-1", "la-nacion", "lemonde-1", "liberation-1",
    "lifehacker-post-comment-load", "lifehacker-working", "lwn-1", "medicalnewstoday",
    "medium-1", "medium-2", "medium-3", "mercurial", "mozilla-1", "mozilla-2", "msn",
    "nytimes-1", "nytimes-2", "nytimes-3", "nytimes-4", "nytimes-5", "pixnet", "qq",
    "quanta-1", "royal-road", "salon-1", "seattletimes-1", "simplyfound-1", "spiceworks",
    "telegraph", "theverge", "tmz-1", "topicseed-1", "tumblr", "v8-blog", "wapo-1", "wapo-2",
    "webmd-1", "webmd-2", "wikia", "wikipedia", "wikipedia-2", "wikipedia-3", "wikipedia-4",
    "wordpress", "yahoo-1", "yahoo-2", "yahoo-3", "yahoo-4", "youth")

  private val exPassList = Set(
    "1a23-1", "1a23-2", "1a23-3", "antirez-1", "antirez-2", "antirez-3", "berthub",
    "buttondown", "dfarq", "eof-hr", "fabiensanglard", "garymarcus-1", "garymarcus-2",
    "garymarcus-3", "gilesthomas", "idiallo", "joanwestenberg", "johndcook-1", "johndcook-2",
    "macrumors", "macscene", "mariozechner", "matklad", "maurycyz-1", "maurycyz-2",
    "maurycyz-3", "maurycyz-4", "maurycyz-5", "raymondchen-1", "raymondchen-2", "seangoedecke",
    "simonwillison-1", "simonwillison-2", "simonwillison-3", "simonwillison-4",
    "simonwillison-5", "soulhacker", "tomrenner", "xeiaso-1", "xeiaso-2", "xeiaso-3",
    "xeiaso-4", "xeiaso-5", "xkcd")

  private def assertPassSet(corpus: String, expected: Set[String]): Unit = {
    val results = run(corpus)
    val fullPass = results.values.filter(r => r.spansMatch && r.metaDiffs.isEmpty)
      .map(_.name).toSet
    info(s"$corpus: ${fullPass.size}/${results.size} full pass")
    val newlyFailing = expected -- fullPass
    val unlisted = fullPass -- expected
    assert(newlyFailing.isEmpty,
      s"$corpus regressions: ${newlyFailing.toSeq.sorted.mkString(", ")}")
    assert(unlisted.isEmpty,
      s"$corpus fixtures passing but missing from the pass-list (add them): " +
        unlisted.toSeq.sorted.mkString(", "))
  }

  test("realworld-pages: all 78 named fixtures pass fully") {
    assertPassSet("realworld-pages", realworldPassList)
  }

  test("ex-pages: all 44 named fixtures pass fully") {
    assertPassSet("ex-pages", exPassList)
  }
}
