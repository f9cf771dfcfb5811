package graft.html

import org.scalatest.funsuite.AnyFunSuite

class ParserSpec extends AnyFunSuite {

  private def body(html: String): (Dom, Int) = {
    val d = Parser.parse(html)
    (d, d.bodyEl)
  }

  test("basic structure: implied html/head/body") {
    val d = Parser.parse("<p>hello</p>")
    assert(d.htmlEl != -1 && d.headEl != -1 && d.bodyEl != -1)
    val ps = d.getElementsByTag(d.bodyEl, "p")
    assert(ps.size == 1)
    assert(d.textContent(ps(0)) == "hello")
  }

  test("head elements land in head; body content in body") {
    val d = Parser.parse(
      "<html><head><title>T</title><meta name=\"a\" content=\"b\"></head><body><div>x</div></body></html>")
    assert(d.getElementsByTag(d.headEl, "title").size == 1)
    assert(d.getElementsByTag(d.headEl, "meta").size == 1)
    assert(d.getElementsByTag(d.bodyEl, "div").size == 1)
  }

  test("attributes: quoted, unquoted, boolean, entities, duplicates") {
    val d = Parser.parse("""<div id=main class="a b" hidden data-x='q' dup=1 dup=2 href=/a/b?x=1&amp;y=2>t</div>""")
    val div = d.getElementsByTag(d.bodyEl, "div")(0)
    assert(d.attr(div, "id") == "main")
    assert(d.attr(div, "class") == "a b")
    assert(d.attr(div, "hidden") == "")
    assert(d.attr(div, "data-x") == "q")
    assert(d.attr(div, "dup") == "1")
    assert(d.attr(div, "href") == "/a/b?x=1&y=2")
  }

  test("entity decoding in text incl numeric and legacy no-semicolon") {
    val (d, b) = body("<p>a &amp; b &lt;c&gt; &#65;&#x42; &nbsp; &rsquo; &amp x</p>")
    val p = d.getElementsByTag(b, "p")(0)
    assert(d.textContent(p) == "a & b <c> AB   ’ & x")
  }

  test("p auto-close on block start and </p> synthesis") {
    val (d, b) = body("<p>one<p>two<div>three</div></p>four")
    val ps = d.getElementsByTag(b, "p")
    assert(ps.size == 3) // one, two, synthesized empty from stray </p>
    assert(d.textContent(ps(0)) == "one")
    assert(d.textContent(ps(1)) == "two")
    assert(d.textContent(ps(2)) == "")
  }

  test("li auto-close") {
    val (d, b) = body("<ul><li>a<li>b<li>c</ul>")
    val lis = d.getElementsByTag(b, "li")
    assert(lis.size == 3)
    assert(lis.map(d.textContent).toList == List("a", "b", "c"))
  }

  test("raw text: script content not parsed, style kept") {
    val (d, b) = body("<script>if (a < b) { x = '<div>'; }</script><p>t</p>")
    val s = d.getElementsByTag(d.headEl, "script") ++ d.getElementsByTag(b, "script")
    assert(s.size == 1)
    assert(d.textContent(d.parent(s(0))) != null)
    assert(d.text(d.firstChild(s(0))) == "if (a < b) { x = '<div>'; }")
  }

  test("rcdata: title decodes entities, no markup") {
    val d = Parser.parse("<title>A &amp; B <b>not bold</b></title>")
    val t = d.getElementsByTag(d.headEl, "title")(0)
    assert(d.text(d.firstChild(t)) == "A & B <b>not bold</b>")
  }

  test("comments and doctype") {
    val d = Parser.parse("<!DOCTYPE html><!-- c1 --><html><body><!-- c2 --><p>x</p></body></html>")
    assert(d.kind(d.firstChild(d.document)) == Dom.Doctype)
    val p = d.getElementsByTag(d.bodyEl, "p")(0)
    assert(d.textContent(p) == "x")
  }

  test("table: implied tbody and cells") {
    val (d, b) = body("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
    val tb = d.getElementsByTag(b, "tbody")
    assert(tb.size == 1)
    val trs = d.getElementsByTag(tb(0), "tr")
    assert(trs.size == 2)
    assert(d.getElementsByTag(trs(0), "td").size == 2)
  }

  test("table: foster parenting of stray text") {
    val (d, b) = body("<table>oops<tr><td>a</td></tr></table>")
    // "oops" must appear before the table, not inside it
    val table = d.getElementsByTag(b, "table")(0)
    assert(!d.textContent(table).contains("oops"))
    assert(d.textContent(b).contains("oops"))
  }

  test("void elements: br img do not nest") {
    val (d, b) = body("<p>a<br>b<img src=x.png>c</p>")
    val p = d.getElementsByTag(b, "p")(0)
    assert(d.textContent(p) == "abc")
    assert(d.getElementsByTag(p, "br").size == 1)
    assert(d.getElementsByTag(p, "img").size == 1)
  }

  test("self-closing honored (jsoup behavior)") {
    val (d, b) = body("<div/><span>in span?</span>")
    val div = d.getElementsByTag(b, "div")(0)
    // jsoup/SwiftSoup treat <div/> as empty element
    assert(d.getElementsByTag(div, "span").isEmpty)
  }

  test("</br> becomes <br>") {
    val (d, b) = body("<p>a</br>b</p>")
    assert(d.getElementsByTag(b, "br").size == 1)
  }

  test("pre: leading newline stripped, whitespace preserved in text") {
    val (d, b) = body("<pre>\nline1\n  line2</pre>")
    val pre = d.getElementsByTag(b, "pre")(0)
    assert(d.textContent(pre) == "line1\n  line2")
  }

  test("noscript children parsed as markup (scripting disabled)") {
    val (d, b) = body("<div><noscript><img src=\"a.png\"></noscript></div>")
    val ns = d.getElementsByTag(b, "noscript")(0)
    assert(d.getElementsByTag(ns, "img").size == 1)
  }

  test("base href captured") {
    val d = Parser.parse("<head><base href=\"http://ex.com/dir/\"></head><body>x</body>")
    assert(d.baseHref == "http://ex.com/dir/")
  }

  test("misnesting recovery: stray end tags ignored") {
    val (d, b) = body("<div>a</span>b</div>")
    val div = d.getElementsByTag(b, "div")(0)
    assert(d.textContent(div) == "ab")
  }

  test("headings auto-close each other") {
    val (d, b) = body("<h1>one<h2>two</h2>")
    assert(d.getElementsByTag(b, "h1").size == 1)
    assert(d.getElementsByTag(b, "h2").size == 1)
    assert(d.textContent(d.getElementsByTag(b, "h1")(0)) == "one")
  }

  test("serialize round trip basics") {
    val (d, b) = body("<div id=\"a\"><p>x &amp; y</p><img src=\"i.png\"></div>")
    val html = Serialize.innerHtml(d, b)
    assert(html == """<div id="a"><p>x &amp; y</p><img src="i.png"></div>""")
  }

  test("selector engine") {
    val (d, b) = body(
      """<div id="top" class="a b"><p class="x">1</p><section><p data-k="v">2</p></section></div>""")
    assert(Select.select(d, b, "p").size == 2)
    assert(Select.select(d, b, "#top").size == 1)
    assert(Select.select(d, b, ".a").size == 1)
    assert(Select.select(d, b, "div > p").size == 1)
    assert(Select.select(d, b, "div p").size == 2)
    assert(Select.select(d, b, "p[data-k=v]").size == 1)
    assert(Select.select(d, b, "[data-k]").size == 1)
    assert(Select.select(d, b, "p.x, section").size == 2)
    assert(Select.selectFirst(d, b, "section > p") != -1)
  }

  test("spans: block-level runs with media") {
    val (d, b) = body("<p>one <b>bold</b></p><img src=\"m.jpg\"><p>two</p>")
    val sp = Serialize.spans(d, b)
    assert(sp.toList == List(
      Serialize.Span("text", "one bold", null),
      Serialize.Span("img", null, "m.jpg"),
      Serialize.Span("text", "two", null)))
  }

  test("dom mutation: unwrap, replace, move") {
    val (d, b) = body("<div><span>a</span><em>b</em></div>")
    val div = d.getElementsByTag(b, "div")(0)
    val span = d.getElementsByTag(div, "span")(0)
    d.unwrap(span)
    assert(Serialize.innerHtml(d, div) == "a<em>b</em>")
    val p = d.newElement("p")
    val em = d.getElementsByTag(div, "em")(0)
    d.replaceWith(em, p)
    d.appendChild(p, d.newText("c"))
    assert(Serialize.innerHtml(d, div) == "a<p>c</p>")
  }

  test("snapshot and restore") {
    val (d, b) = body("<div><p>keep</p></div>")
    val snap = d.snapshot()
    val p = d.getElementsByTag(b, "p")(0)
    d.remove(p)
    assert(d.getElementsByTag(b, "p").isEmpty)
    d.restore(snap)
    assert(d.getElementsByTag(d.bodyEl, "p").size == 1)
  }

  // ------------------------------------------- adoption agency (WHATWG)

  test("adoption agency: misnested <b><i></b></i> (jsoup parity)") {
    val (d, b) = body("<p>1<b>2<i>3</b>4</i>5</p>")
    // jsoup: <p>1<b>2<i>3</i></b><i>4</i>5</p>
    assert(Serialize.innerHtml(d, b) == "<p>1<b>2<i>3</i></b><i>4</i>5</p>")
  }

  test("adoption agency: <a> across a block is reparented (jsoup parity)") {
    val (d, b) = body("<a>1<p>2</a>3</p>")
    // jsoup: <a>1</a><p><a>2</a>3</p>
    assert(Serialize.innerHtml(d, b) == "<a>1</a><p><a>2</a>3</p>")
  }

  test("formatting reconstruction: bold spans paragraphs (jsoup parity)") {
    val (d, b) = body("<b>1<p>2</p>3")
    // per WHATWG <p> nests inside the open <b> (no reconstruction needed);
    // if an implementation closes b at the block boundary instead, the
    // reconstructed form <b>1</b><p><b>2</b></p><b>3</b> is the other
    // conforming-parser shape — "3" must be bold either way
    val out = Serialize.innerHtml(d, b)
    assert(out == "<b>1<p>2</p>3</b>" || out == "<b>1</b><p><b>2</b></p><b>3</b>", out)
  }

  test("new <a> start tag closes an open <a> via the agency") {
    val (d, b) = body("<a href=\"x\">one<a href=\"y\">two</a>")
    val as = d.getElementsByTag(b, "a")
    assert(as.size == 2)
    assert(d.textContent(as(0)) == "one")
    assert(d.textContent(as(1)) == "two")
  }

  test("noah's ark: at most three identical formatting entries reopen") {
    val (d, b) = body("<b><b><b><b><p>x")
    // four opened, but reconstruction inside <p> is capped at 3 clones
    val p = d.getElementsByTag(b, "p")(0)
    var depth = 0
    var cur = d.firstChild(p)
    while (cur != -1 && d.kind(cur) == Dom.Element && d.tag(cur) == "b") {
      depth += 1
      cur = d.firstChild(cur)
    }
    assert(depth <= 3, s"depth=$depth")
  }
}
