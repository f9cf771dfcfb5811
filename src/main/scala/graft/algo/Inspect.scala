package graft.algo

import graft.html.Dom
import scala.collection.mutable.ArrayBuffer

/** Structured inspection/trace mode (reference: `InspectionReport.swift:10-180`,
  * `InspectionContext.swift`): when enabled, extraction appends BOTH
  * human-readable decision lines (candidate scores, promotions, sibling
  * merge verdicts — dumped by `FixtureRunner inspect <corpus> <fixture>`)
  * and typed per-pass records that [[toJson]] serializes for diff tooling
  * (per-attempt flags, candidate score breakdowns, promotion chains,
  * sibling decisions, cleaner removals, acceptance outcomes).
  *
  * Debug-only: disabled in production (a plain `@volatile` flag read per
  * event; zero allocation when off). Not thread-safe by design — enable it
  * only from single-threaded harnesses.
  */
object Inspect {
  @volatile var enabled = false
  private val lines = new ArrayBuffer[String]()

  // ------------------------------------------------- typed per-pass model

  /** Candidate with the reference's score decomposition
    * (`InspectionContext.RawCandidateInfo`): finalScore = base(tag) +
    * classWeight + children-propagated (then link-density scaled).
    */
  final case class CandidateInfo(descriptor: String, finalScore: Double,
      baseScore: Double, classWeight: Double, childrenScore: Double)

  final case class PromotionStep(step: String, from: String, to: String)

  final case class SiblingDecision(descriptor: String, score: Double,
      threshold: Double, appended: Boolean, reason: String)

  final case class CleanerRemoval(phase: String, descriptor: String, reason: String)

  final class Pass(val number: Int, val flags: Int) {
    var topCandidates: Seq[CandidateInfo] = Nil
    var finalCandidate: Option[CandidateInfo] = None
    val promotions = new ArrayBuffer[PromotionStep]()
    val siblings = new ArrayBuffer[SiblingDecision]()
    val removals = new ArrayBuffer[CleanerRemoval]()
    var contentLength: Int = -1
    var accepted: Boolean = false
  }

  private val passes = new ArrayBuffer[Pass]()
  private var current: Pass = null

  def reset(): Unit = { lines.clear(); passes.clear(); current = null }

  def beginPass(flags: Int): Unit = if (enabled) {
    current = new Pass(passes.length + 1, flags)
    passes += current
  }

  def endPass(contentLength: Int, accepted: Boolean): Unit =
    if (enabled && current != null) {
      current.contentLength = contentLength
      current.accepted = accepted
    }

  def recordTopCandidates(cs: => Seq[CandidateInfo]): Unit =
    if (enabled && current != null) current.topCandidates = cs

  def recordFinalCandidate(c: => CandidateInfo): Unit =
    if (enabled && current != null) current.finalCandidate = Some(c)

  def recordPromotion(step: String, from: => String, to: => String): Unit =
    if (enabled && current != null) current.promotions += PromotionStep(step, from, to)

  def recordSibling(descriptor: => String, score: Double, threshold: Double,
      appended: Boolean, reason: => String): Unit =
    if (enabled && current != null)
      current.siblings += SiblingDecision(descriptor, score, threshold, appended, reason)

  def recordRemoval(phase: String, descriptor: => String, reason: => String): Unit =
    if (enabled && current != null)
      current.removals += CleanerRemoval(phase, descriptor, reason)

  /** Score decomposition for a candidate (requires the pass's weight flag
    * to recompute classWeight the way initializeNode applied it).
    */
  def candidateInfo(dom: Dom, node: Int, scoring: Scoring,
      flagWeightClasses: Boolean): CandidateInfo = {
    val fin = scoring.contentScore(node)
    val base = dom.tag(node) match {
      case "div" => 5.0
      case "pre" | "td" | "blockquote" => 3.0
      case "address" | "ol" | "ul" | "dl" | "dd" | "dt" | "li" | "form" => -3.0
      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "th" => -5.0
      case _ => 0.0
    }
    val cw = DomOps.classWeight(dom, node, flagWeightClasses)
    CandidateInfo(describe(dom, node), fin, base, cw, fin - base - cw)
  }

  // ------------------------------------------------------------ line log

  def log(phase: String)(msg: => String): Unit =
    if (enabled) lines += s"[$phase] $msg"

  def dump(): Seq[String] = lines.toSeq

  // ------------------------------------------------------------- to JSON

  /** Locale-independent decimal (the f"" interpolator uses the default
    * locale — comma decimal separators would corrupt the JSON).
    */
  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def cJson(c: CandidateInfo): String =
    s"""{"descriptor":"${esc(c.descriptor)}","finalScore":${num(c.finalScore)},""" +
    s""""baseScore":${num(c.baseScore)},"classWeight":${num(c.classWeight)},""" +
    s""""childrenScore":${num(c.childrenScore)}}"""

  /** Machine-readable report of the recorded passes. */
  def toJson: String = {
    val ps = passes.map { p =>
      s"""{"pass":${p.number},"flags":${p.flags},""" +
      s""""topCandidates":[${p.topCandidates.map(cJson).mkString(",")}],""" +
      s""""finalCandidate":${p.finalCandidate.map(cJson).getOrElse("null")},""" +
      s""""promotions":[${p.promotions.map(x =>
        s"""{"step":"${esc(x.step)}","from":"${esc(x.from)}","to":"${esc(x.to)}"}""").mkString(",")}],""" +
      s""""siblings":[${p.siblings.map(x =>
        s"""{"descriptor":"${esc(x.descriptor)}","score":${num(x.score)},""" +
        s""""threshold":${num(x.threshold)},"appended":${x.appended},""" +
        s""""reason":"${esc(x.reason)}"}""").mkString(",")}],""" +
      s""""removals":[${p.removals.map(x =>
        s"""{"phase":"${esc(x.phase)}","descriptor":"${esc(x.descriptor)}","reason":"${esc(x.reason)}"}""").mkString(",")}],""" +
      s""""contentLength":${p.contentLength},"accepted":${p.accepted}}"""
    }
    s"""{"passes":[${ps.mkString(",")}]}"""
  }

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
