package graft.html

import org.scalatest.funsuite.AnyFunSuite

/** Direct coverage of the CSS-selector engine (the hottest predicate in
  * the extraction engine; previously exercised only through fixtures).
  */
class SelectSpec extends AnyFunSuite {

  private val dom = Parser.parse(
    """<body>
      |  <div id="main" class="wrap outer">
      |    <p class="lead intro">first</p>
      |    <p data-x="abc def">second</p>
      |    <span><a href="#frag">hash</a></span>
      |    <div class="inner">
      |      <a href="https://x/author/jane" rel="author" class="author-link">Jane</a>
      |      <img src="pic.jpg">
      |    </div>
      |  </div>
      |  <section id="s1"><p>in section</p></section>
      |</body>""".stripMargin)

  private def sel(s: String): Seq[String] =
    Select.select(dom, dom.bodyEl, s).map { n =>
      val id = dom.idAttr(n)
      val cls = dom.className(n)
      dom.tag(n) + (if (id.nonEmpty) "#" + id else "") +
        (if (cls.nonEmpty) "." + cls.replace(' ', '.') else "")
    }.toSeq

  test("tag / id / class / compound selectors") {
    assert(sel("p").size == 3)
    assert(sel("div#main") == Seq("div#main.wrap.outer"))
    assert(sel(".inner") == Seq("div.inner"))
    assert(sel("p.lead") == Seq("p.lead.intro"))
    assert(sel("p.lead.intro") == Seq("p.lead.intro"))
    assert(sel("p.missing").isEmpty)
    assert(sel("*.inner") == Seq("div.inner"))
  }

  test("attribute operators") {
    assert(sel("[data-x]").size == 1)
    assert(sel("[data-x=abc def]").size == 1)
    assert(sel("[data-x*=bc d]").size == 1)
    assert(sel("[data-x^=abc]").size == 1)
    assert(sel("[data-x$=def]").size == 1)
    assert(sel("[data-x~=def]").size == 1)
    assert(sel("[data-x~=bc]").isEmpty) // token match, not substring
    assert(sel("a[href^=#]").size == 1)
    assert(sel("a[href*=/author/]").size == 1)
    assert(sel("a[rel=author]").size == 1)
  }

  test("descendant, child, and root-child combinators") {
    assert(sel("div a").size == 2)
    assert(sel("div.inner > a").size == 1)
    assert(sel("span > a").size == 1)
    assert(sel("section > p").size == 1)
    assert(sel("div > p").size == 2) // both ps are direct children of #main
    // leading ">" anchors to the query root (body)
    assert(sel("> div") == Seq("div#main.wrap.outer"))
    assert(sel("> p").isEmpty)
  }

  test("comma groups and root exclusion") {
    assert(sel("section, .inner").map(_.takeWhile(_ != '.')).sorted == Seq("div", "section#s1").map(_.takeWhile(_ != '.')).sorted)
    // select() excludes the query root itself
    assert(Select.select(dom, dom.bodyEl, "body").isEmpty)
    // but matches() tests the node itself
    assert(Select.matches(dom, dom.bodyEl, "body"))
  }

  test("selectFirst returns the first match in document order") {
    val first = Select.selectFirst(dom, dom.bodyEl, "p")
    assert(dom.className(first) == "lead intro")
    assert(Select.selectFirst(dom, dom.bodyEl, "video") == -1)
  }

  test("hasClassToken: exact whitespace-delimited tokens") {
    assert(Select.hasClassToken("wrap outer", "wrap"))
    assert(Select.hasClassToken("wrap outer", "outer"))
    assert(!Select.hasClassToken("wrap outer", "out"))
    assert(!Select.hasClassToken("wrapouter", "wrap"))
    assert(Select.hasClassToken("  padded\ttoken ", "token"))
  }
}
