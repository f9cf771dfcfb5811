package graft.algo

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for extraction paths no golden fixture exercises. */
class ReadabilitySpec extends AnyFunSuite {

  test("wikipedia government-portrait caption rule: columns normalized, captions pruned, TeAra hosts lowercased") {
    import graft.html.{Parser, Select}
    val html =
      """<body><div id="art">
        |<h2>Government and politics</h2>
        |<div><div><p><a href="/f1"><img src="g1.jpg"></a></p><p>caption one</p></div>
        |<div><p><a href="/f2"><img src="g2.jpg"></a></p><p>caption two</p></div></div>
        |<div><p><img src="seddon.jpg"></p><div>A statue of Richard Seddon, the Beehive, and Parliament House, Wellington</div></div>
        |<p>Aoraki / Mount Cook is the highest point of New Zealand, at 3724 metres</p>
        |<p><a href="https://www.TeAra.govt.nz/en/x">link</a></p>
        |</div></body>""".stripMargin
    val dom = Parser.parse(html)
    val art = Select.selectFirst(dom, dom.bodyEl, "div#art")
    SiteRules.applySerializationRules(art, SiteRules.Ctx(dom, Some("https://en.wikipedia.org/wiki/New_Zealand")))
    val out = graft.html.Serialize.html(dom, art)
    // portrait columns reduced to just the image paragraph
    assert(!out.contains("caption one") && !out.contains("caption two"), out)
    assert(out.contains("g1.jpg") && out.contains("g2.jpg"))
    // seddon thumb caption pruned, image kept
    assert(!out.toLowerCase.contains("statue of richard seddon"))
    assert(out.contains("seddon.jpg"))
    // aoraki paragraph removed
    assert(!out.toLowerCase.contains("aoraki"))
    // TeAra host lowercased
    assert(out.contains("https://www.teara.govt.nz/en/x"))
  }

  test("orphan <td> root content is wrapped in an anonymous div (Z5, Readability.swift:1185-1209)") {
    // a page whose only scoring content lives in one bare table cell, so
    // the top candidate is the <td> itself and the merged article content
    // starts with a cell-rooted fragment
    val para = "This is a long paragraph of body prose, with commas, clauses, " +
      "and enough characters to score well past every acceptance threshold. " * 6
    // the second cell/row stop the single-child promotions so the top
    // candidate stays the content <td> itself
    val html =
      s"""<html><head><title>Cell page</title></head><body>
         |<table><tr><td>
         |<p>$para</p><p>$para</p><p>$para</p>
         |</td><td>sidebar note</td></tr>
         |<tr><td>footer cell</td><td>x</td></tr></table>
         |</body></html>""".stripMargin
    Readability.parse(html, "https://example.org/a.html") match {
      case Readability.Ok(r) =>
        assert(r.contentHtml.startsWith("<div id=\"readability-page-1\" class=\"page\">"))
        val inner = r.contentHtml.stripPrefix("<div id=\"readability-page-1\" class=\"page\">")
        // with the wrap the cell fragment is nested under an anonymous div
        assert(!inner.trim.startsWith("<td"),
          s"cell-rooted fragment leaked: ${inner.take(120)}")
        if (inner.contains("<td")) {
          assert(inner.trim.startsWith("<div><td") || inner.trim.startsWith("<div>\n<td"),
            s"expected anonymous div wrapper, got: ${inner.take(120)}")
        }
        assert(r.textContent.contains("long paragraph of body prose"))
      case Readability.Failed(status, err) => fail(s"extraction failed: $status $err")
    }
  }
}
