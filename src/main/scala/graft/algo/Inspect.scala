package graft.algo

import graft.html.Dom

/** Minimal inspection/trace mode (reference: `InspectionReport.swift:10-180`,
  * `InspectionContext.swift`): when enabled, extraction phases append
  * human-readable decision lines (candidate scores, promotions, sibling
  * merge verdicts) that `FixtureRunner inspect <corpus> <fixture>` dumps.
  *
  * Debug-only: disabled in production (a plain `@volatile` flag read per
  * event; zero allocation when off). Not thread-safe by design — enable it
  * only from single-threaded harnesses.
  */
object Inspect {
  @volatile var enabled = false
  private val lines = new scala.collection.mutable.ArrayBuffer[String]()

  def reset(): Unit = lines.clear()

  def log(phase: String)(msg: => String): Unit =
    if (enabled) lines += s"[$phase] $msg"

  def dump(): Seq[String] = lines.toSeq

  /** Compact node descriptor: tag#id.class(score) */
  def describe(dom: Dom, node: Int, scoring: Scoring = null): String = {
    if (node == -1) return "<none>"
    if (dom.kind(node) != Dom.Element) return s"<${dom.kind(node)}>"
    val id = dom.idAttr(node)
    val cls = dom.className(node)
    val sb = new StringBuilder(dom.tag(node))
    if (id.nonEmpty) sb.append('#').append(id)
    if (cls.nonEmpty) sb.append('.').append(cls.trim.replaceAll("\\s+", "."))
    if (scoring != null && scoring.isInitialized(node))
      sb.append(f"(${scoring.contentScore(node)}%.2f)")
    sb.toString
  }
}
