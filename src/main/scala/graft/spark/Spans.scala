package graft.spark

import graft.html.{Dom, Parser, Serialize}

/** Input span: one row of docs.spans (BASELINE.json input_hint schema). */
final case class SpanIn(kind: String, text: String, media_ref: String, offset: Int)

/** One interleaved text+media document. */
final case class Doc(doc_id: String, spans: Seq[SpanIn])

/** Output span with 0-based order. */
final case class SpanOut(kind: String, text: String, media_ref: String, order: Int)

final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[SpanOut],
    title: String,
    byline: String,
    dir: String,
    lang: String,
    excerpt: String,
    site_name: String,
    published_time: String,
    text_length: Int,
    status: String,
    error: String)

/** Span-sequence ↔ HTML reassembly (SURVEY.md §1): document HTML is the
  * concatenation of spans in offset order; media spans materialize as the
  * corresponding element with src=media_ref at their position so the
  * extractor sees one coherent DOM and media survives inline.
  */
object Spans {

  def assembleHtml(spans: Seq[SpanIn]): String = {
    val sorted = spans.sortBy(_.offset)
    val sb = new java.lang.StringBuilder(spans.map(s =>
      (if (s.text != null) s.text.length else 0) + 64).sum)
    for (s <- sorted) {
      s.kind match {
        case "text" =>
          if (s.text != null) sb.append(s.text)
        case "img" =>
          sb.append("<img src=\"").append(esc(s.media_ref)).append("\">")
        case "video" | "audio" | "iframe" =>
          sb.append('<').append(s.kind).append(" src=\"").append(esc(s.media_ref))
            .append("\"></").append(s.kind).append('>')
        case "embed" =>
          sb.append("<embed src=\"").append(esc(s.media_ref)).append("\">")
        case "object" =>
          sb.append("<object data=\"").append(esc(s.media_ref)).append("\"></object>")
        case _ => // unknown media kind: ignore
      }
    }
    sb.toString
  }

  private def esc(s: String): String =
    if (s == null) "" else s.replace("&", "&amp;").replace("\"", "&quot;")

  /** Decompose an HTML string into the input span sequence (generator /
    * fixture-import path): markup split around top-level media elements.
    * Media elements become media spans; everything else stays one text
    * span per contiguous run of markup.
    */
  def decomposeHtml(html: String): Seq[SpanIn] = {
    val out = Seq.newBuilder[SpanIn]
    val mediaOpen = "(?i)<(img|video|audio|iframe|embed|object)\\b[^>]*>".r
    val srcAttr = "(?i)(?:src|data)\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r
    var pos = 0
    var offset = 0
    val matches = mediaOpen.findAllMatchIn(html).toVector
    for (m <- matches) {
      // skip matches inside script/style? generator output has none
      if (m.start >= pos) {
        val tag = m.group(1).toLowerCase
        val src = srcAttr.findFirstMatchIn(m.matched)
          .map(sm => Option(sm.group(2)).orElse(Option(sm.group(3))).getOrElse(sm.group(4)))
          .getOrElse("")
        // end of element: for container media skip to close tag
        val end = if (tag == "video" || tag == "audio" || tag == "iframe" || tag == "object") {
          val close = html.toLowerCase.indexOf(s"</$tag>", m.end)
          if (close >= 0) close + tag.length + 3 else m.end
        } else m.end
        if (m.start > pos) {
          out += SpanIn("text", html.substring(pos, m.start), null, offset)
          offset += 1
        }
        out += SpanIn(tag, null, src, offset)
        offset += 1
        pos = end
      }
    }
    if (pos < html.length) {
      out += SpanIn("text", html.substring(pos), null, offset)
    }
    out.result()
  }

  /** Run the full extraction on one doc. Never throws — poison rows yield
    * status/error columns (a bad row must not kill a 10^12-doc job).
    */
  def extractOne(doc: Doc, baseUrl: String, opts: graft.algo.Options,
      maxHtmlBytes: Int = 0): ExtractedDoc =
    extractFromHtml(doc.doc_id, assembleHtml(doc.spans), baseUrl, opts, maxHtmlBytes)

  def extractFromHtml(docId: String, html: String, baseUrl: String,
      opts: graft.algo.Options, maxHtmlBytes: Int = 0): ExtractedDoc = {
    val doc = Doc(docId, Nil) // id carrier for error paths
    try {
      if (maxHtmlBytes > 0 && html != null && html.length > maxHtmlBytes) {
        return ExtractedDoc(doc.doc_id, Nil, null, null, null, null, null, null, null,
          0, "oversize_skipped", s"html_chars=${html.length}")
      }
      graft.algo.Readability.parse(html, baseUrl, opts) match {
        case graft.algo.Readability.Ok(r) =>
          val spans = r.spans.zipWithIndex.map { case (s, i) =>
            SpanOut(s.kind, s.text, s.mediaRef, i)
          }
          ExtractedDoc(doc.doc_id, spans, r.title, r.byline.orNull, r.dir.orNull,
            r.lang.orNull, r.excerpt.orNull, r.siteName.orNull,
            r.publishedTime.orNull, r.length, "ok", null)
        case graft.algo.Readability.Failed(status, error) =>
          ExtractedDoc(doc.doc_id, Nil, null, null, null, null, null, null, null,
            0, status, error)
      }
    } catch {
      case e: Throwable =>
        ExtractedDoc(doc.doc_id, Nil, null, null, null, null, null, null, null,
          0, "error", String.valueOf(e).take(500))
    }
  }
}
