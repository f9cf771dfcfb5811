package graft.algo

import graft.html.{Dom, Select}
import DomOps._
import scala.collection.mutable.ArrayBuffer

/** Serialization-stage passes Z2–Z5 (SURVEY.md §2.5).
  * Behavior anchor: `Readability.swift:1142-1512`.
  */
final class Post(dom: Dom, opts: Options, docLocation: String) {

  /** Effective base for relative resolution: <base href> resolved against
    * the document location, else the document location.
    */
  private val effectiveBase: String = {
    val docUrl = Option(docLocation).map(_.trim).filter(_.nonEmpty).orNull
    val baseHref = Option(dom.baseHref).map(_.trim).filter(_.nonEmpty).orNull
    if (baseHref == null) docUrl
    else if (docUrl != null) Urls.resolve(docUrl, baseHref)
    else baseHref
  }
  private val baseMatchesDocument =
    effectiveBase != null && docLocation != null && effectiveBase == docLocation.trim
  // parse the base ONCE per document — resolve() runs per link/src/srcset
  private val effectiveBaseParts: Urls.Parts =
    if (effectiveBase != null) Urls.parse(effectiveBase) else null

  def toAbsoluteUri(rawUri: String): String = {
    val uri = rawUri.trim
    if (uri.isEmpty) return rawUri
    if (uri.toLowerCase.startsWith("data:")) return uri
    if (uri.startsWith("#") && baseMatchesDocument) return uri
    if (effectiveBase != null) return Urls.resolve(effectiveBaseParts, uri)
    // no base: keep absolute URIs (normalized), leave relative untouched
    val p = Urls.parse(uri)
    if (p.scheme != null) {
      val t = if (p.authority != null && p.path.isEmpty) p.copy(path = "/") else p
      t.render
    } else uri
  }

  // ------------------------------------------------------------------ Z2

  def fixRelativeUris(articleContent: Int): Unit = {
    // links
    val links = Select.select(dom, articleContent, "a[href]")
    var i = 0
    while (i < links.length) {
      val link = links(i)
      if ((dom.parent(link) != -1)) {
        val href = Option(dom.attr(link, "href")).getOrElse("")
        if (href.nonEmpty) {
          val normalized = href.trim
          if (normalized.toLowerCase.startsWith("javascript:")) {
            // single text child → text node; else span (`Readability.swift:1320-1345`)
            if (dom.childCount(link) == 1 && dom.kind(dom.firstChild(link)) == Dom.Text) {
              val t = dom.newText(dom.text(dom.firstChild(link)))
              dom.replaceWith(link, t)
            } else {
              val span = dom.newElement("span")
              dom.moveChildren(link, span)
              dom.replaceWith(link, span)
            }
          } else {
            dom.setAttr(link, "href", toAbsoluteUri(normalized))
          }
        }
      }
      i += 1
    }
    // media
    val media = Select.select(dom, articleContent, "img, picture, figure, video, audio, source")
    i = 0
    while (i < media.length) {
      val m = media(i)
      val src = Option(dom.attr(m, "src")).getOrElse("")
      if (src.nonEmpty) dom.setAttr(m, "src", toAbsoluteUri(src))
      val poster = Option(dom.attr(m, "poster")).getOrElse("")
      if (poster.nonEmpty) dom.setAttr(m, "poster", toAbsoluteUri(poster))
      val srcset = Option(dom.attr(m, "srcset")).getOrElse("")
      if (srcset.nonEmpty) {
        val matcher = Config.srcsetUrl.matcher(srcset)
        val sb = new StringBuffer()
        while (matcher.find()) {
          val url = matcher.group(1)
          val descriptor = Option(matcher.group(2)).getOrElse("")
          val trailing = Option(matcher.group(3)).getOrElse("")
          matcher.appendReplacement(sb,
            java.util.regex.Matcher.quoteReplacement(toAbsoluteUri(url) + descriptor + trailing))
        }
        matcher.appendTail(sb)
        dom.setAttr(m, "srcset", sb.toString)
      }
      i += 1
    }
  }

  // ------------------------------------------------------------------ Z3

  def simplifyNestedElements(articleContent: Int): Unit = {
    var node = articleContent
    while (node != -1) {
      val next = dom.nextInTree(node, articleContent)
      if (dom.kind(node) == Dom.Element) {
        val t = dom.tag(node)
        if (dom.parent(node) != -1 && (t == "div" || t == "section") &&
            !dom.idAttr(node).startsWith("readability")) {
          var handled = false
          // NYTimes-ish short-paragraph stack merge under article>div>div
          if (t == "div") {
            val parent = dom.parent(node)
            if (parent != -1 && dom.kind(parent) == Dom.Element && dom.tag(parent) == "div") {
              val gp = dom.parent(parent)
              if (gp != -1 && dom.kind(gp) == Dom.Element && dom.tag(gp) == "article") {
                val children = dom.childElements(node)
                if (children.size >= 3 && children.forall(c => dom.tag(c) == "p")) {
                  val prefix = children.take(math.min(6, children.size))
                  val shortCount = prefix.count(p => Config.charLen(sTrim(innerText(dom, p))) <= 24)
                  if (shortCount >= 3) {
                    val merged = dom.newElement("p")
                    children.foreach(p => dom.moveChildren(p, merged))
                    dom.replaceWith(node, merged)
                    handled = true
                  }
                }
              }
            }
          }
          if (!handled) {
            if (isElementWithoutContent(dom, node)) dom.remove(node)
            else if (hasSingleTagInsideElement(dom, node, "div") ||
                hasSingleTagInsideElement(dom, node, "section")) {
              val child = dom.childElements(node)(0)
              val a = dom.attrs(node)
              if (a != null) {
                var j = 0
                while (j < a.length) {
                  val key = a(j).toLowerCase
                  if (!(dom.tag(child) == "p" && key == "dir"))
                    dom.setAttr(child, a(j), a(j + 1))
                  j += 2
                }
              }
              dom.replaceWith(node, child)
            }
          }
        }
      }
      node = next
    }
  }

  // ------------------------------------------------------------------ Z4

  def cleanClasses(el: Int, preserved: Set[String]): Unit = {
    if (dom.kind(el) == Dom.Element) {
      val cls = dom.className(el)
      // allocation-free common case: no preserved token present → drop the
      // attribute without split/filter/mkString (this runs on EVERY element
      // of the final article; the split-based form was a measured top-15
      // allocation site)
      var any = false
      if (cls.nonEmpty && preserved.nonEmpty) {
        val n = cls.length
        var i = 0
        while (!any && i < n) {
          while (i < n && cls.charAt(i) == ' ') i += 1
          val start = i
          while (i < n && cls.charAt(i) != ' ') i += 1
          if (i > start)
            any = preserved.exists(p => p.length == i - start && cls.startsWith(p, start))
        }
      }
      if (!any) dom.removeAttr(el, "class")
      else {
        val kept = cls.split(" ").filter(_.nonEmpty).filter(preserved.contains).mkString(" ")
        if (kept.isEmpty) dom.removeAttr(el, "class")
        else dom.setAttr(el, "class", kept)
      }
    }
    // recurse over raw children (childElements allocated an array per node)
    var c = dom.firstChild(el)
    while (c != -1) { cleanClasses(c, preserved); c = dom.nextSib(c) }
  }

  // ------------------------------------------------------------------ Z5

  def normalizeSplitPrintInfo(articleContent: Int): Unit = {
    val candidates = Select.select(dom, articleContent, "article > div > div")
    var i = candidates.length - 1
    while (i >= 0) {
      val container = candidates(i)
      if ((dom.parent(container) != -1)) {
        val text = innerText(dom, container).toLowerCase
        if (text.contains("a version of this article appears in print on")) {
          val children = dom.childElements(container)
          val paragraphs = children.filter(c => dom.tag(c) == "p")
          if (paragraphs.size == 1 && children.size == 1) {
            dom.replaceWith(container, paragraphs(0))
          } else if (paragraphs.size >= 3) {
            val merged = dom.newElement("p")
            paragraphs.foreach { p => dom.moveChildren(p, merged); dom.remove(p) }
            dom.replaceWith(container, merged)
          }
        }
      }
      i -= 1
    }
  }

  /** Whitespace set for paragraph-boundary text-node removal: ASCII
    * whitespace + U+200B (observed reference behavior: a trailing
    * zero-width-space node is dropped, a trailing NBSP node is kept —
    * macscene vs article-author-tag fixtures).
    */
  private def isBoundaryWs(c: Char): Boolean =
    c <= ' ' || c == '\u200b'

  private def boundaryBlank(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (!isBoundaryWs(s.charAt(i))) return false
      i += 1
    }
    true
  }

  def trimParagraphBoundaryWhitespace(articleContent: Int): Unit = {
    val ps = Select.select(dom, articleContent, "p")
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      var first = dom.firstChild(p)
      while (first != -1 && dom.kind(first) == Dom.Text && boundaryBlank(dom.text(first))) {
        dom.remove(first)
        first = dom.firstChild(p)
      }
      var last = dom.lastChild(p)
      while (last != -1 && dom.kind(last) == Dom.Text && boundaryBlank(dom.text(last))) {
        dom.remove(last)
        last = dom.lastChild(p)
      }
      i += 1
    }
  }

  def restoreFigureWrapperMetadata(articleContent: Int): Unit = {
    val wrappers = Select.select(dom, articleContent, "figure[contenteditable=false] > div")
    var i = 0
    while (i < wrappers.length) {
      val w = wrappers(i)
      if (Select.selectFirst(dom, w, "img") != -1) {
        if (Option(dom.attr(w, "contenteditable")).getOrElse("").isEmpty)
          dom.setAttr(w, "contenteditable", "false")
        if (Option(dom.attr(w, "data-syndicationrights")).getOrElse("").isEmpty)
          dom.setAttr(w, "data-syndicationrights", "false")
      }
      i += 1
    }
  }
}
