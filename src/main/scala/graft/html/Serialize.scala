package graft.html

import scala.collection.mutable.ArrayBuffer

/** HTML serialization + span emission for the arena DOM.
  *
  * [[html]] produces non-pretty-printed markup (the reference serializes
  * with pretty-print off, `Readability.swift:1165-1183`), used for golden
  * HTML comparison and debugging.
  *
  * [[spans]] flattens a subtree into the output span sequence — the
  * engine's actual output format (SURVEY.md §1): each maximal run of text
  * becomes one `text` span (whitespace-normalized, whitespace-only runs
  * dropped except under pre/textarea), each media element becomes a media
  * span carrying its resolved src.
  */
object Serialize {

  private val voidTags = Set(
    "area", "base", "basefont", "bgsound", "br", "col", "embed", "hr",
    "img", "input", "keygen", "link", "meta", "param", "source", "track", "wbr")

  val mediaTags = Set("img", "video", "audio", "iframe", "embed", "object")

  private val preserveWsTags = Set("pre", "textarea")

  /** Per-thread size memory for output builders: geometric growth from a
    * fixed 1 KB start re-copied every serialized document (a measured
    * top-3 allocation site); consecutive docs in a partition are
    * similar-sized, so presizing to ~1.25× the previous output removes
    * most growth copies. A misprediction costs at most one copy.
    */
  private val lastOutSize = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 1024
  }
  private def newOutBuilder(): java.lang.StringBuilder = {
    val last = lastOutSize.get().intValue()
    new java.lang.StringBuilder(math.max(1024, last + (last >> 2)))
  }
  private def rememberSize(sb: java.lang.StringBuilder): Unit =
    lastOutSize.set(Integer.valueOf(math.min(sb.length, 8 << 20)))

  def html(dom: Dom, root: Int): String = {
    val sb = newOutBuilder()
    appendHtml(dom, root, sb, includeRoot = true)
    rememberSize(sb)
    sb.toString
  }

  def innerHtml(dom: Dom, root: Int): String = {
    val sb = newOutBuilder()
    var c = dom.firstChild(root)
    while (c != -1) {
      appendHtml(dom, c, sb, includeRoot = true)
      c = dom.nextSib(c)
    }
    rememberSize(sb)
    sb.toString
  }

  private def appendHtml(dom: Dom, id: Int, sb: java.lang.StringBuilder, includeRoot: Boolean): Unit = {
    dom.kind(id) match {
      case Dom.Text =>
        Entities.escapeText(dom.text(id), sb)
      case Dom.Data =>
        sb.append(dom.text(id))
      case Dom.Comment =>
        sb.append("<!--").append(dom.text(id)).append("-->")
      case Dom.Doctype =>
        sb.append("<!").append(dom.text(id)).append('>')
      case Dom.Document =>
        var c = dom.firstChild(id)
        while (c != -1) { appendHtml(dom, c, sb, includeRoot = true); c = dom.nextSib(c) }
      case Dom.Element =>
        val t = dom.tag(id)
        if (includeRoot) {
          sb.append('<').append(t)
          val a = dom.attrs(id)
          if (a != null) {
            var i = 0
            while (i < a.length) {
              sb.append(' ').append(a(i))
              sb.append("=\"")
              Entities.escapeAttr(a(i + 1), sb)
              sb.append('"')
              i += 2
            }
          }
          sb.append('>')
        }
        if (!voidTags.contains(t)) {
          var c = dom.firstChild(id)
          while (c != -1) { appendHtml(dom, c, sb, includeRoot = true); c = dom.nextSib(c) }
          if (includeRoot) sb.append("</").append(t).append('>')
        }
      case _ =>
    }
  }

  /** One output span: kind is "text" or a media tag name. */
  final case class Span(kind: String, text: String, mediaRef: String)

  /** Tags whose boundaries do NOT break a text run (phrasing content). */
  private val inlineTags = Set(
    "a", "abbr", "acronym", "b", "bdi", "bdo", "big", "br", "button",
    "cite", "code", "data", "datalist", "del", "dfn", "em", "font", "i",
    "ins", "kbd", "label", "mark", "math", "meter", "nobr", "output",
    "progress", "q", "rp", "rt", "ruby", "s", "samp", "small", "span",
    "strike", "strong", "sub", "sup", "svg", "time", "tt", "u", "var", "wbr")

  /** Flatten subtree to spans. Text merges across inline elements into one
    * span per block run; block boundaries and media elements flush the
    * run; whitespace is normalized except under pre/textarea.
    */
  def spans(dom: Dom, root: Int): ArrayBuffer[Span] = {
    val out = new ArrayBuffer[Span]()
    val buf = new java.lang.StringBuilder()

    def flush(): Unit = {
      if (buf.length > 0) {
        val s = Dom.normalizeWhitespace(buf) // no intermediate toString copy
        if (s.nonEmpty) out += Span("text", s, null)
        buf.setLength(0)
      }
    }

    def walk(id: Int, inPre: Boolean): Unit = {
      dom.kind(id) match {
        case Dom.Text =>
          if (inPre) {
            // flush any pending normalized run, emit preserved text as-is
            val s = dom.text(id)
            if (s.nonEmpty) buf.append(s)
          } else buf.append(dom.text(id))
        case Dom.Element =>
          val t = dom.tag(id)
          if (mediaTags.contains(t)) {
            flush()
            val src = {
              val v = dom.attr(id, "src")
              if (v != null) v
              else {
                val d = dom.attr(id, "data")
                if (d != null) d else ""
              }
            }
            out += Span(t, null, src)
          } else {
            val pre = inPre || preserveWsTags.contains(t)
            if (pre && !inPre) {
              flush()
              var c = dom.firstChild(id)
              while (c != -1) { walk(c, inPre = true); c = dom.nextSib(c) }
              if (buf.length > 0) {
                val s = buf.toString
                if (s.exists(ch => !Dom.isWhitespace(ch))) out += Span("text", s, null)
                buf.setLength(0)
              }
            } else {
              val block = !pre && !inlineTags.contains(t)
              if (block) flush()
              var c = dom.firstChild(id)
              while (c != -1) { walk(c, pre); c = dom.nextSib(c) }
              if (block) flush()
            }
          }
        case _ => // comments, data, doctype: not content
      }
    }

    if (dom.kind(root) == Dom.Element && mediaTags.contains(dom.tag(root))) {
      walk(root, inPre = false)
    } else {
      var c = dom.firstChild(root)
      while (c != -1) { walk(c, inPre = false); c = dom.nextSib(c) }
    }
    flush()
    out
  }
}
