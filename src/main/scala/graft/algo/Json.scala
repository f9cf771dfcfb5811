package graft.algo

/** Minimal recursive-descent JSON parser for JSON-LD metadata (M1).
  * Values map to: Map[String, Any], List[Any], String, Double, Boolean, null.
  * Lenient: returns None on any syntax error (a broken ld+json block must
  * never fail extraction — `Readability.swift:472-480` skips bad blocks).
  */
object Json {

  def parse(s: String): Option[Any] = {
    try {
      val p = new P(s)
      p.skipWs()
      val v = p.value()
      Some(v)
    } catch { case _: Exception => None }
  }

  private final class P(s: String) {
    var i = 0

    def skipWs(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    }

    def value(): Any = {
      skipWs()
      if (i >= s.length) throw new IllegalArgumentException("eof")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) throw new IllegalArgumentException(word)
      i += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      i += 1 // {
      val b = Map.newBuilder[String, Any]
      skipWs()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return b.result() }
      while (true) {
        skipWs()
        val k = str()
        skipWs()
        if (i >= s.length || s.charAt(i) != ':') throw new IllegalArgumentException(":")
        i += 1
        val v = value()
        b += (k -> v)
        skipWs()
        if (i >= s.length) throw new IllegalArgumentException("eof")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; return b.result()
          case _ => throw new IllegalArgumentException(",}")
        }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      i += 1 // [
      val b = List.newBuilder[Any]
      skipWs()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
      while (true) {
        b += value()
        skipWs()
        if (i >= s.length) throw new IllegalArgumentException("eof")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; return b.result()
          case _ => throw new IllegalArgumentException(",]")
        }
      }
      b.result()
    }

    private def str(): String = {
      if (s.charAt(i) != '"') throw new IllegalArgumentException("\"")
      i += 1
      val sb = new java.lang.StringBuilder()
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        if (c == '\\') {
          i += 1
          if (i >= s.length) throw new IllegalArgumentException("esc")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) throw new IllegalArgumentException("u")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case _ => throw new IllegalArgumentException("esc")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      throw new IllegalArgumentException("eof-str")
    }

    private def num(): Any = {
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      var seen = false
      while (i < s.length && { val c = s.charAt(i)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '-' || c == '+' }) {
        seen = true; i += 1
      }
      if (!seen) throw new IllegalArgumentException("num")
      java.lang.Double.valueOf(s.substring(start, i))
    }
  }
}
