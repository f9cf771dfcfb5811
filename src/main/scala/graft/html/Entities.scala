package graft.html

/** HTML character-reference decoding (from scratch).
  *
  * Covers the numeric forms plus the named entities that occur in practice
  * (full Latin-1 set, typographic punctuation, common symbols, Greek).
  * Legacy HTML4 names are also decoded without a trailing semicolon, the
  * way browsers (and jsoup/SwiftSoup, which the reference's fixtures were
  * serialized through) do.
  *
  * Reference behavior anchor: swift-readability relies on its HTML library
  * for decoding (SwiftSoup); only a 5-entity escape map exists in the
  * algorithm itself (`Sources/Readability/Internal/Configuration.swift:258`).
  */
object Entities {

  /** name (no & or ;) → replacement string */
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](512)
    def p(n: String, cp: Int): Unit = m.put(n, new String(Character.toChars(cp)))
    // core
    p("lt", '<'); p("gt", '>'); p("amp", '&'); p("quot", '"'); p("apos", '\'')
    // Latin-1 (160..255), HTML4 names
    val latin1 = Seq(
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
      "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
      "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
      "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
      "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
      "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
      "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
      "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
      "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
      "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    latin1.zipWithIndex.foreach { case (n, i) => p(n, 160 + i) }
    // typographic / symbols
    p("OElig", 0x152); p("oelig", 0x153); p("Scaron", 0x160); p("scaron", 0x161)
    p("Yuml", 0x178); p("fnof", 0x192); p("circ", 0x2c6); p("tilde", 0x2dc)
    p("ensp", 0x2002); p("emsp", 0x2003); p("thinsp", 0x2009)
    p("zwnj", 0x200c); p("zwj", 0x200d); p("lrm", 0x200e); p("rlm", 0x200f)
    p("ndash", 0x2013); p("mdash", 0x2014); p("horbar", 0x2015)
    p("lsquo", 0x2018); p("rsquo", 0x2019); p("sbquo", 0x201a)
    p("ldquo", 0x201c); p("rdquo", 0x201d); p("bdquo", 0x201e)
    p("dagger", 0x2020); p("Dagger", 0x2021); p("bull", 0x2022)
    p("hellip", 0x2026); p("permil", 0x2030); p("prime", 0x2032); p("Prime", 0x2033)
    p("lsaquo", 0x2039); p("rsaquo", 0x203a); p("oline", 0x203e); p("frasl", 0x2044)
    p("euro", 0x20ac); p("image", 0x2111); p("weierp", 0x2118); p("real", 0x211c)
    p("trade", 0x2122); p("alefsym", 0x2135)
    p("larr", 0x2190); p("uarr", 0x2191); p("rarr", 0x2192); p("darr", 0x2193)
    p("harr", 0x2194); p("crarr", 0x21b5)
    p("lArr", 0x21d0); p("uArr", 0x21d1); p("rArr", 0x21d2); p("dArr", 0x21d3); p("hArr", 0x21d4)
    p("forall", 0x2200); p("part", 0x2202); p("exist", 0x2203); p("empty", 0x2205)
    p("nabla", 0x2207); p("isin", 0x2208); p("notin", 0x2209); p("ni", 0x220b)
    p("prod", 0x220f); p("sum", 0x2211); p("minus", 0x2212); p("lowast", 0x2217)
    p("radic", 0x221a); p("prop", 0x221d); p("infin", 0x221e); p("ang", 0x2220)
    p("and", 0x2227); p("or", 0x2228); p("cap", 0x2229); p("cup", 0x222a); p("int", 0x222b)
    p("there4", 0x2234); p("sim", 0x223c); p("cong", 0x2245); p("asymp", 0x2248)
    p("ne", 0x2260); p("equiv", 0x2261); p("le", 0x2264); p("ge", 0x2265)
    p("sub", 0x2282); p("sup", 0x2283); p("nsub", 0x2284); p("sube", 0x2286); p("supe", 0x2287)
    p("oplus", 0x2295); p("otimes", 0x2297); p("perp", 0x22a5); p("sdot", 0x22c5)
    p("lceil", 0x2308); p("rceil", 0x2309); p("lfloor", 0x230a); p("rfloor", 0x230b)
    p("lang", 0x2329); p("rang", 0x232a); p("loz", 0x25ca)
    p("spades", 0x2660); p("clubs", 0x2663); p("hearts", 0x2665); p("diams", 0x2666)
    p("percnt", '%'); p("num", '#'); p("sol", '/'); p("bsol", '\\'); p("semi", ';')
    p("colon", ':'); p("comma", ','); p("period", '.'); p("lpar", '('); p("rpar", ')')
    p("ast", '*'); p("plus", '+'); p("equals", '='); p("quest", '?'); p("excl", '!')
    p("lowbar", '_'); p("lbrace", '{'); p("rbrace", '}'); p("lbrack", '['); p("rbrack", ']')
    p("vert", '|'); p("grave", '`'); p("dollar", '$'); p("commat", '@')
    // Greek
    val greekU = Seq("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta", "Eta",
      "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron", "Pi",
      "Rho", "", "Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
    greekU.zipWithIndex.foreach { case (n, i) => if (n.nonEmpty) p(n, 0x391 + i) }
    val greekL = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi",
      "rho", "sigmaf", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")
    greekL.zipWithIndex.foreach { case (n, i) => p(n, 0x3b1 + i) }
    p("thetasym", 0x3d1); p("upsih", 0x3d2); p("piv", 0x3d6)
    m
  }

  /** HTML4 names browsers accept without a trailing semicolon. */
  private val legacyNoSemi: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    val it = named.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      // legacy set ≈ HTML4 entities; our table is almost exactly that set
      if (k.forall(_.isLetter)) s.add(k)
    }
    s
  }

  private val maxNameLen = 10

  /** Decode entities in `s` from `start` until `end`; appends to `sb`.
    * Missing/invalid references are passed through verbatim (browser rule).
    */
  def decode(s: String, start: Int, end: Int, sb: java.lang.StringBuilder): Unit = {
    var i = start
    while (i < end) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val consumed = decodeOne(s, i, end, sb)
        if (consumed == 0) { sb.append('&'); i += 1 } else i += consumed
      }
    }
  }

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    decode(s, 0, s.length, sb)
    sb.toString
  }

  /** Attempt to decode one reference at s(i)=='&'. Returns chars consumed
    * (0 if not a reference).
    */
  private def decodeOne(s: String, i: Int, end: Int, sb: java.lang.StringBuilder): Int = {
    if (i + 1 >= end) return 0
    val c1 = s.charAt(i + 1)
    if (c1 == '#') {
      // numeric
      var j = i + 2
      var cp = 0
      var any = false
      if (j < end && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        while (j < end && isHex(s.charAt(j)) && cp <= 0x10ffff) {
          cp = cp * 16 + hexVal(s.charAt(j)); any = true; j += 1
        }
      } else {
        while (j < end && s.charAt(j).isDigit && cp <= 0x10ffff) {
          cp = cp * 10 + (s.charAt(j) - '0'); any = true; j += 1
        }
      }
      if (!any) return 0
      if (j < end && s.charAt(j) == ';') j += 1
      appendCp(cp, sb)
      j - i
    } else if (Character.isLetter(c1)) {
      var j = i + 1
      val lim = math.min(end, i + 1 + maxNameLen)
      while (j < lim && Character.isLetterOrDigit(s.charAt(j))) j += 1
      // longest match first, with semicolon; then legacy prefix without
      var k = j
      while (k > i + 1) {
        val name = s.substring(i + 1, k)
        val rep = named.get(name)
        if (rep != null) {
          if (k < end && s.charAt(k) == ';') { sb.append(rep); return k + 1 - i }
          else if (legacyNoSemi.contains(name)) { sb.append(rep); return k - i }
        }
        k -= 1
      }
      0
    } else 0
  }

  private def appendCp(cp0: Int, sb: java.lang.StringBuilder): Unit = {
    // windows-1252 remapping of C1 range, per HTML5 spec
    val cp = cp0 match {
      case 0x80 => 0x20ac; case 0x82 => 0x201a; case 0x83 => 0x192
      case 0x84 => 0x201e; case 0x85 => 0x2026; case 0x86 => 0x2020
      case 0x87 => 0x2021; case 0x88 => 0x2c6; case 0x89 => 0x2030
      case 0x8a => 0x160; case 0x8b => 0x2039; case 0x8c => 0x152
      case 0x8e => 0x17d; case 0x91 => 0x2018; case 0x92 => 0x2019
      case 0x93 => 0x201c; case 0x94 => 0x201d; case 0x95 => 0x2022
      case 0x96 => 0x2013; case 0x97 => 0x2014; case 0x98 => 0x2dc
      case 0x99 => 0x2122; case 0x9a => 0x161; case 0x9b => 0x203a
      case 0x9c => 0x153; case 0x9e => 0x17e; case 0x9f => 0x178
      case x if x == 0 || x > 0x10ffff || (x >= 0xd800 && x <= 0xdfff) => 0xfffd
      case x => x
    }
    sb.appendCodePoint(cp)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10

  /** Minimal escaping for serialization (text nodes). */
  def escapeText(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case ' ' => sb.append("&nbsp;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** Escaping for double-quoted attribute values. */
  def escapeAttr(s: String, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '"' => sb.append("&quot;")
        case ' ' => sb.append("&nbsp;")
        case c => sb.append(c)
      }
      i += 1
    }
  }
}
