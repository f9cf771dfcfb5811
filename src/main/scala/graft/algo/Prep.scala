package graft.algo

import graft.html.{Dom, Select}
import DomOps._

/** Document preparation passes P2–P8 (SURVEY.md §2.1).
  * Behavior anchors: `Readability.swift:565-960`.
  */
object Prep {

  private val imgExtPattern = java.util.regex.Pattern.compile(
    "\\.(jpg|jpeg|png|webp)", java.util.regex.Pattern.CASE_INSENSITIVE)

  /** P2: canonical link → og:url → document location. */
  def detectSourceUrl(dom: Dom, docLocation: String): Option[String] = {
    val canonical = Select.selectFirst(dom, dom.document, "link[rel=canonical]")
    if (canonical != -1) {
      val href = dom.attr(canonical, "href")
      if (href != null && href.trim.nonEmpty) return Some(href.trim)
    }
    val og = Select.selectFirst(dom, dom.document, "meta[property=og:url]")
    if (og != -1) {
      val c = dom.attr(og, "content")
      if (c != null && c.trim.nonEmpty) return Some(c.trim)
    }
    if (docLocation != null && docLocation.trim.nonEmpty) Some(docLocation.trim) else None
  }

  /** P3: noscript image unwrap (`Readability.swift:589-634, 746-801`). */
  def unwrapNoscriptImages(dom: Dom): Unit = {
    // 1. drop imgs with no usable source hints
    val imgs = dom.getElementsByTag(dom.document, "img")
    var i = 0
    while (i < imgs.length) {
      val img = imgs(i)
      var keep = false
      val a = dom.attrs(img)
      if (a != null) {
        var j = 0
        while (j < a.length && !keep) {
          val key = a(j)
          if (key == "src" || key == "srcset" || key == "data-src" || key == "data-srcset") keep = true
          else if (a(j + 1) != null && imgExtPattern.matcher(a(j + 1)).find()) keep = true
          j += 2
        }
      }
      if (!keep) dom.remove(img)
      i += 1
    }
    // 2. replace single-image prev sibling with the noscript image
    val noscripts = dom.getElementsByTag(dom.document, "noscript")
    i = 0
    while (i < noscripts.length) {
      val ns = noscripts(i)
      if (dom.isAttached(ns)) {
        val newImg = extractSingleImage(dom, ns)
        if (newImg != -1) {
          val prev = prevElementSibling(dom, ns)
          if (prev != -1 && isSingleImage(dom, prev)) {
            val oldImg =
              if (dom.tag(prev) == "img") prev
              else {
                val found = dom.getElementsByTag(prev, "img")
                if (found.nonEmpty) found(0) else -1
              }
            if (oldImg != -1) {
              copyLegacyImageAttributes(dom, oldImg, newImg)
              dom.replaceWith(prev, newImg)
            }
          }
        }
      }
      i += 1
    }
  }

  private def prevElementSibling(dom: Dom, id: Int): Int = {
    var cur = dom.prevSib(id)
    while (cur != -1) {
      if (dom.kind(cur) == Dom.Element) return cur
      cur = dom.prevSib(cur)
    }
    -1
  }

  /** True if the subtree is exactly one img possibly wrapped in single-child
    * chains with no text (`Readability.swift:758-775`).
    */
  private def isSingleImage(dom: Dom, id: Int): Boolean = {
    var cur = id
    while (cur != -1) {
      if (dom.tag(cur) == "img") return true
      val els = dom.childElements(cur)
      if (els.size != 1) return false
      if (innerText(dom, cur).nonEmpty) return false
      cur = els(0)
    }
    false
  }

  /** Returns the noscript's single img (node id, still inside noscript) or -1. */
  private def extractSingleImage(dom: Dom, ns: Int): Int = {
    if (!isSingleImage(dom, ns)) return -1
    val found = dom.getElementsByTag(ns, "img")
    if (found.nonEmpty) found(0) else -1
  }

  private def copyLegacyImageAttributes(dom: Dom, oldImg: Int, newImg: Int): Unit = {
    val a = dom.attrs(oldImg)
    if (a == null) return
    var j = 0
    while (j < a.length) {
      val key = a(j)
      val value = a(j + 1)
      if (value != null && value.nonEmpty) {
        val looksLikeImage = imgExtPattern.matcher(value).find()
        if (key == "src" || key == "srcset" || looksLikeImage) {
          val existing = dom.attr(newImg, key)
          if (existing != value) {
            val targetKey = if (dom.hasAttr(newImg, key)) "data-old-" + key else key
            dom.setAttr(newImg, targetKey, value)
          }
        }
      }
      j += 2
    }
  }

  /** P4 (reference deviation): promote full readable articles out of
    * noscript (`Readability.swift:643-728`).
    */
  def promoteReadableNoscriptFallbacks(dom: Dom, charThreshold: Int): Unit = {
    val noscripts = dom.getElementsByTag(dom.document, "noscript")
    var i = 0
    while (i < noscripts.length) {
      val ns = noscripts(i)
      if (dom.isAttached(ns)) {
        val promoted = promotedRoot(dom, ns, charThreshold)
        if (promoted != -1) dom.replaceWith(ns, promoted)
      }
      i += 1
    }
  }

  private val warningPhrases = Seq(
    "enable javascript", "javascript enabled", "without javascript",
    "full functionality", "modern browser")

  private def promotedRoot(dom: Dom, ns: Int, charThreshold: Int): Int = {
    if (extractSingleImage(dom, ns) != -1) return -1
    val warningText = innerText(dom, ns).toLowerCase
    if (warningText.isEmpty) return -1
    if (warningPhrases.exists(warningText.contains)) return -1
    // semantic root: article, main, or itemprop*=articlebody
    var semanticRoot = Select.selectFirst(dom, ns, "article")
    if (semanticRoot == -1) semanticRoot = Select.selectFirst(dom, ns, "main")
    if (semanticRoot == -1) {
      var cur = ns
      while (cur != -1 && semanticRoot == -1) {
        if (dom.kind(cur) == Dom.Element) {
          val ip = dom.attr(cur, "itemprop")
          if (ip != null && ip.toLowerCase.contains("articlebody")) semanticRoot = cur
        }
        cur = dom.nextInTree(cur, ns)
      }
    }
    if (semanticRoot == -1) return -1
    val threshold = math.max(charThreshold, Config.DefaultCharThreshold)
    if (textLength(dom, semanticRoot) < threshold) return -1
    if (dom.getElementsByTag(semanticRoot, "p").size < 5) return -1
    if (linkDensity(dom, semanticRoot) >= 0.35) return -1
    val els = dom.childElements(ns)
    if (els.size == 1) els(0) else semanticRoot
  }

  /** P5–P8: prepDocument (`Readability.swift:803-812`). */
  def prepDocument(dom: Dom): Unit = {
    // strip script/style/noscript/object/embed/template
    val toRemove = dom.getElementsByTags(dom.document,
      Set("script", "style", "noscript", "object", "embed", "template"))
    var i = 0
    while (i < toRemove.length) { dom.remove(toRemove(i)); i += 1 }
    removeHiddenElements(dom)
    replaceBrs(dom)
    replaceFontTags(dom)
  }

  /** P6 (`VisibilityRules.swift:51-59`). */
  def removeHiddenElements(dom: Dom): Unit = {
    var cur = dom.nextInTree(dom.document, dom.document)
    while (cur != -1) {
      if (dom.kind(cur) == Dom.Element &&
          (dom.hasAttr(cur, "hidden") || dom.hasAttr(cur, "aria-hidden") || dom.hasAttr(cur, "style")) &&
          shouldRemoveAsHidden(dom, cur)) {
        cur = removeAndGetNext(dom, cur, dom.document)
      } else {
        cur = dom.nextInTree(cur, dom.document)
      }
    }
  }

  /** P7: <br><br> chains → <p> (`Readability.swift:823-885`). */
  def replaceBrs(dom: Dom): Unit = {
    val brs = dom.getElementsByTag(dom.document, "br")
    var i = 0
    while (i < brs.length) {
      val br = brs(i)
      if (dom.isAttached(br)) {
        var next = nextNonWsNode(dom, dom.nextSib(br))
        var replaced = false
        while (next != -1 && dom.kind(next) == Dom.Element && dom.tag(next) == "br") {
          replaced = true
          val sib = dom.nextSib(next)
          dom.remove(next)
          next = nextNonWsNode(dom, sib)
        }
        if (replaced) {
          val p = dom.newElement("p")
          dom.replaceWith(br, p)
          next = dom.nextSib(p)
          var done = false
          while (next != -1 && !done) {
            // stop at the next <br><br> chain
            if (dom.kind(next) == Dom.Element && dom.tag(next) == "br") {
              val after = nextNonWsNode(dom, dom.nextSib(next))
              if (after != -1 && dom.kind(after) == Dom.Element && dom.tag(after) == "br") done = true
            }
            if (!done) {
              if (!isPhrasingContent(dom, next)) done = true
              else {
                val sib = dom.nextSib(next)
                dom.appendChild(p, next)
                next = sib
              }
            }
          }
          // trim trailing whitespace children
          var last = dom.lastChild(p)
          while (last != -1 && isWhitespaceNode(dom, last)) {
            val prev = dom.prevSib(last)
            dom.remove(last)
            last = prev
          }
          val parent = dom.parent(p)
          if (parent != -1 && dom.kind(parent) == Dom.Element && dom.tag(parent) == "p")
            setNodeTag(dom, parent, "div")
        }
      }
      i += 1
    }
  }

  private def nextNonWsNode(dom: Dom, start: Int): Int = {
    var cur = start
    while (cur != -1) {
      if (dom.kind(cur) == Dom.Element) return cur
      if (dom.kind(cur) == Dom.Text && !dom.text(cur).forall(Dom.isWhitespace)) return cur
      cur = dom.nextSib(cur)
    }
    -1
  }

  /** P8: font → span keeping attrs/children (`Readability.swift:938-959`). */
  def replaceFontTags(dom: Dom): Unit = {
    val fonts = dom.getElementsByTag(dom.document, "font")
    var i = 0
    while (i < fonts.length) {
      setNodeTag(dom, fonts(i), "span")
      i += 1
    }
  }
}
