package graft.algo

/** RFC 3986 §5 reference resolution (from scratch; `java.net.URI` diverges
  * on several edge cases the fixtures exercise — SURVEY.md §7.4 item 7).
  * Plus the reference's explicit normalization: resolved URL with empty
  * path gets path "/" (`Readability.swift:1266-1297`).
  */
object Urls {

  final case class Parts(scheme: String, authority: String, path: String,
      query: String, fragment: String) {
    def render: String = {
      val sb = new StringBuilder()
      if (scheme != null) { sb.append(scheme).append(':') }
      if (authority != null) { sb.append("//").append(authority) }
      sb.append(path)
      if (query != null) { sb.append('?').append(query) }
      if (fragment != null) { sb.append('#').append(fragment) }
      sb.toString
    }
  }

  private val schemePattern = java.util.regex.Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*):")

  def parse(s: String): Parts = {
    var rest = s
    var scheme: String = null
    var authority: String = null
    var query: String = null
    var fragment: String = null
    val m = schemePattern.matcher(rest)
    if (m.find()) {
      scheme = m.group(1)
      rest = rest.substring(m.end())
    }
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { fragment = rest.substring(hashIdx + 1); rest = rest.substring(0, hashIdx) }
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) { query = rest.substring(qIdx + 1); rest = rest.substring(0, qIdx) }
    if (rest.startsWith("//")) {
      val end = {
        val i = rest.indexOf('/', 2)
        if (i < 0) rest.length else i
      }
      authority = rest.substring(2, end)
      rest = rest.substring(end)
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }

  private def mergePaths(base: Parts, refPath: String): String = {
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val idx = base.path.lastIndexOf('/')
      if (idx < 0) refPath else base.path.substring(0, idx + 1) + refPath
    }
  }

  /** RFC 3986 §5.2.2 transform references. Returns the resolved string. */
  def resolve(baseStr: String, refStr: String): String =
    resolve(parse(baseStr), refStr)

  /** Pre-parsed-base variant: callers resolving many refs against one
    * document base (fixRelativeUris) parse the base once.
    */
  def resolve(base: Parts, refStr: String): String = {
    val ref = parse(refStr)
    var t: Parts = null
    if (ref.scheme != null) {
      t = Parts(ref.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    } else if (ref.authority != null) {
      t = Parts(base.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    } else if (ref.path.isEmpty) {
      val q = if (ref.query != null) ref.query else base.query
      t = Parts(base.scheme, base.authority, base.path, q, ref.fragment)
    } else if (ref.path.startsWith("/")) {
      t = Parts(base.scheme, base.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    } else {
      t = Parts(base.scheme, base.authority, removeDotSegments(mergePaths(base, ref.path)), ref.query, ref.fragment)
    }
    // reference's normalization: empty path with authority → "/"
    if (t.authority != null && t.path.isEmpty) t = t.copy(path = "/")
    // WHATWG file-URL drive-letter normalization: /C| → /C:
    if (t.scheme != null && t.scheme.equalsIgnoreCase("file") &&
        t.path.length >= 3 && t.path.charAt(0) == '/' && t.path.charAt(2) == '|' &&
        Character.isLetter(t.path.charAt(1)))
      t = t.copy(path = "/" + t.path.charAt(1) + ":" + t.path.substring(3))
    t.render
  }
}
