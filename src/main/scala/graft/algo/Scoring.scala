package graft.algo

import graft.html.Dom

/** Node score sidecar: scores live outside the DOM in arrays indexed by
  * arena node id (`NodeScoring.swift:5-49` uses an identity map; arrays are
  * the arena equivalent).
  */
final class Scoring(initialCapacity: Int) {
  private var score = new Array[Double](initialCapacity)
  private var init = new Array[Boolean](initialCapacity)

  private def ensure(id: Int): Unit = {
    if (id >= score.length) {
      val cap = math.max(score.length * 2, id + 1)
      score = java.util.Arrays.copyOf(score, cap)
      init = java.util.Arrays.copyOf(init, cap)
    }
  }

  def isInitialized(id: Int): Boolean = id < init.length && init(id)

  def contentScore(id: Int): Double = if (id < score.length) score(id) else 0.0

  def setContentScore(id: Int, v: Double): Unit = { ensure(id); score(id) = v }

  def addToScore(id: Int, v: Double): Unit = {
    ensure(id)
    score(id) += v
    init(id) = true
  }

  /** Base tag score ± class weight (`NodeScoring.swift:56-76`). */
  def initializeNode(dom: Dom, id: Int, flagWeightClasses: Boolean): Unit = {
    ensure(id)
    var s = 0.0
    dom.tag(id) match {
      case "div" => s += 5
      case "pre" | "td" | "blockquote" => s += 3
      case "address" | "ol" | "ul" | "dl" | "dd" | "dt" | "li" | "form" => s -= 3
      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "th" => s -= 5
      case _ =>
    }
    s += DomOps.classWeight(dom, id, flagWeightClasses)
    score(id) = s
    init(id) = true
  }

  def initializeNodeIfNeeded(dom: Dom, id: Int, flagWeightClasses: Boolean = true): Unit =
    if (!isInitialized(id)) initializeNode(dom, id, flagWeightClasses)

  /** Link density with per-link Int truncation and '#'-prefix coefficient
    * (`NodeScoring.swift:139-159` — differs from the Double-accumulating
    * variant in Readability.swift).
    */
  def linkDensity(dom: Dom, id: Int): Double = {
    val total = DomOps.textLength(dom, id)
    if (total == 0) return 0.0
    var linkLen = 0L
    @inline def addLink(a: Int): Unit = {
      val href = dom.attr(a, "href")
      val coeff = if (href != null && href.startsWith("#")) 0.3 else 1.0
      linkLen += (DomOps.textLength(dom, a) * coeff).toInt
    }
    // jsoup/SwiftSoup `select("a")` includes the receiver: an element that
    // IS an anchor counts its own text (its link density is ~1, so e.g.
    // fully-linked embed cards scale to score 0 and never become
    // candidates). Nested anchors can't exist post-parse, so no
    // double-count. (`NodeScoring.swift:142-159`)
    if (dom.tag(id) == "a") addLink(id)
    val links = dom.getElementsByTag(id, "a")
    var i = 0
    while (i < links.length) {
      addLink(links(i))
      i += 1
    }
    linkLen.toDouble / total
  }
}
