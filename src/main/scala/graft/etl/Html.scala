package graft.etl

import scala.collection.mutable.ArrayBuffer

/** Minimal tolerant HTML parser + CSS-selector subset — the in-engine
  * substrate for the config-driven product field extractor
  * ([[ProductExtract]]; ref `scripts/extract/products_scraping.py:
  * 392-561`, which parses with BeautifulSoup/html5lib). No external
  * parser ships in this environment, so this is a small spec-subset
  * implementation: tolerant tag soup, void/raw-text elements, entity
  * decoding, and the selector forms the reference's
  * `utils/webs_config.yml` actually uses (`tag`, `.class`, `#id`,
  * `tag.class`, descendant chains like
  * `p.price span.woocommerce-Price-amount bdi`).
  *
  * Deliberately NOT a full HTML5 tree-construction algorithm: no
  * foster parenting, no active formatting elements, only the
  * implicit-close rules (`p`/`li`/`tr`/`td`/`th`/`option`) that real
  * product pages rely on. Corrupt input never throws — unmatched
  * closes are ignored, unclosed tags close at EOF — so the extractor's
  * quarantine path only fires on *semantic* failures, matching the
  * reference's behavior where html5lib also never throws.
  */
object Html {

  /** Locale-independent ASCII-ish lowercase: tag/attr names must not
    * go through the default locale (Turkish 'I' -> dotless 'ı' breaks
    * every comparison against the lowercase tables). */
  private[etl] def lc(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  sealed trait Node
  final case class TextNode(data: String) extends Node

  final case class Elem(
      tag: String,
      attrs: Map[String, String],
      children: Vector[Node]) extends Node {

    def attr(name: String): Option[String] = attrs.get(lc(name))

    def classes: Set[String] =
      attr("class").map(_.split("\\s+").filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)

    /** All descendant elements, document order (self excluded). */
    def descendants: Iterator[Elem] =
      children.iterator.flatMap {
        case e: Elem => Iterator.single(e) ++ e.descendants
        case _ => Iterator.empty
      }

    /** bs4 `.text`: concatenation of every descendant text node. */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case TextNode(d) => sb.append(d)
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      sb.toString
    }

    /** bs4 `.get_text(strip=True)`: each text chunk stripped, empties
      * dropped, joined with no separator. */
    def textStripped: String = {
      val parts = ArrayBuffer.empty[String]
      def walk(n: Node): Unit = n match {
        case TextNode(d) => val s = d.trim; if (s.nonEmpty) parts += s
        case e: Elem => e.children.foreach(walk)
      }
      children.foreach(walk)
      parts.mkString("")
    }

    /** Direct child TEXT content only (no descendants) — for the
      * reference's `'...' in tag` direct-contents membership check. */
    def directTexts: Seq[String] =
      children.collect { case TextNode(d) => d }

    /** bs4 `find(tag)`: first descendant with this tag, doc order. */
    def findFirst(tagName: String): Option[Elem] = {
      val t = lc(tagName)
      descendants.find(_.tag == t)
    }

    /** bs4 `find_all(tag)`: every descendant with this tag, doc order. */
    def findAll(tagName: String): Seq[Elem] = {
      val t = lc(tagName)
      descendants.filter(_.tag == t).toSeq
    }

    /** bs4 `find('meta', {'property': p})`. */
    def findMeta(property: String): Option[Elem] =
      descendants.find(e =>
        e.tag == "meta" && e.attr("property").contains(property))

    /** CSS select, document order (bs4 `select`): descendants of this
      * element matching the chain, where a multi-part chain's ancestor
      * selectors may match this element or any ancestor within its
      * subtree. */
    def select(css: String): Seq[Elem] = {
      val chain = Selector.parse(css)
      val out = ArrayBuffer.empty[Elem]
      def walk(e: Elem, ancestors: List[Elem]): Unit =
        e.children.foreach {
          case c: Elem =>
            if (Selector.matches(chain, c, e :: ancestors)) out += c
            walk(c, e :: ancestors)
          case _ => ()
        }
      walk(this, Nil)
      out.toSeq
    }

    /** bs4 `select_one`: first document-order match. */
    def selectOne(css: String): Option[Elem] = select(css).headOption
  }

  /** One compound selector (`tag.cls1.cls2#id:contains(text)`);
    * `None` fields match anything. `contains` is soupsieve's
    * `:contains()`/`:-soup-contains()` — substring match against the
    * element's full text (the reference's igloo pagination selector
    * `a.page-link:contains(Next)`). */
  final case class Simple(
      tag: Option[String], id: Option[String], classes: Seq[String],
      contains: Option[String] = None) {
    def matchesElem(e: Elem): Boolean =
      tag.forall(_ == e.tag) &&
        id.forall(i => e.attr("id").contains(i)) &&
        classes.forall(e.classes.contains) &&
        contains.forall(t => e.text.contains(t))
  }

  object Selector {
    private val ContainsRe = """^(.*):contains\(([^)]*)\)$""".r

    // selectors are config constants evaluated once per ROW in the
    // extractor's Dataset.map — memoize the parsed chains (bounded by
    // the distinct selector strings a config can hold). TrieMap:
    // executor tasks share the cache lock-free.
    private val parsed =
      scala.collection.concurrent.TrieMap.empty[String, Seq[Simple]]

    /** Space-separated descendant chain of simple selectors. Unsupported
      * CSS (child `>`, pseudo-classes other than `:contains`,
      * attributes `[..]`) throws — a selector silently matching
      * nothing would be a config-debugging trap. */
    def parse(css: String): Seq[Simple] =
      parsed.getOrElseUpdate(css, parseUncached(css))

    /** Split on whitespace at paren depth 0 only — a
      * `:contains(Next page)` label may legally contain spaces, and a
      * blind `\s+` split would shear it into two bogus "selectors". */
    private def topLevelParts(css: String): Seq[String] = {
      val out = ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var depth = 0
      css.trim.foreach { c =>
        if (c == '(') { depth += 1; sb.append(c) }
        else if (c == ')') { depth = math.max(0, depth - 1); sb.append(c) }
        else if (c.isWhitespace && depth == 0) {
          if (sb.nonEmpty) { out += sb.toString; sb.clear() }
        } else sb.append(c)
      }
      if (sb.nonEmpty) out += sb.toString
      out.toSeq
    }

    private def parseUncached(css: String): Seq[Simple] = {
      val parts = topLevelParts(css)
      require(parts.nonEmpty, s"empty selector: '$css'")
      parts.toSeq.map { p0 =>
        // peel one trailing :contains(...) before the feature gate
        val (p, contains) = {
          p0 match {
            case ContainsRe(head, text) =>
              (head, Some(text.stripPrefix("\"").stripSuffix("\"")
                .stripPrefix("'").stripSuffix("'")))
            case _ => (p0, None)
          }
        }
        require(!p.contains(">") && !p.contains("[") && !p.contains(":"),
          s"unsupported CSS feature in '$p0' (subset: tag, .class, #id, " +
            ":contains, descendant chains)")
        var tag: Option[String] = None
        var id: Option[String] = None
        val classes = ArrayBuffer.empty[String]
        var rest = p
        val lead = rest.takeWhile(c => c != '.' && c != '#')
        // the universal selector matches anything (tag = None), same
        // as an omitted tag — NOT a literal tag named "*"
        if (lead.nonEmpty) {
          if (lead != "*") tag = Some(lc(lead))
          rest = rest.drop(lead.length)
        }
        while (rest.nonEmpty) {
          val marker = rest.head
          rest = rest.tail
          val name = rest.takeWhile(c => c != '.' && c != '#')
          rest = rest.drop(name.length)
          require(name.nonEmpty, s"dangling '$marker' in selector '$p'")
          if (marker == '.') classes += name else id = Some(name)
        }
        Simple(tag, id, classes.toSeq, contains)
      }
    }

    /** `e` matches the chain's last simple selector, and the remaining
      * selectors match some subsequence of `ancestors`
      * (nearest-first), in order — the descendant combinator. Greedy
      * nearest-first matching is sufficient because ancestors form a
      * single chain. */
    def matches(chain: Seq[Simple], e: Elem, ancestors: List[Elem])
        : Boolean = {
      if (!chain.last.matchesElem(e)) return false
      var remaining = chain.dropRight(1).reverse // nearest-ancestor first
      var anc = ancestors
      while (remaining.nonEmpty && anc.nonEmpty) {
        if (remaining.head.matchesElem(anc.head))
          remaining = remaining.tail
        anc = anc.tail
      }
      remaining.isEmpty
    }
  }

  // ---- parsing ----

  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  /** Elements whose content is raw text until the matching close tag. */
  private val RawText = Set("script", "style", "textarea", "title")

  /** The RawText subset whose content still decodes character
    * references (the html5lib RCDATA state); script/style stay
    * byte-literal. */
  private val Rcdata = Set("textarea", "title")

  /** p/li/option/tr/td/th implicitly close a same-tag predecessor. */
  private val SelfClosing = Set("p", "li", "option", "tr", "td", "th")

  /** The HTML 4.01 named character references (Latin-1 block,
    * punctuation, common symbols) plus apos — the set bs4 resolves on
    * accented-language product pages. Numeric references (`&#...;`)
    * are handled separately in [[decodeEntities]]. */
  private val NamedEntities: Map[String, String] = {
    val latin1 = Seq( // &#160;..&#255; in HTML 4.01 order
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar",
      "sect", "uml", "copy", "ordf", "laquo", "not", "shy", "reg",
      "macr", "deg", "plusmn", "sup2", "sup3", "acute", "micro",
      "para", "middot", "cedil", "sup1", "ordm", "raquo", "frac14",
      "frac12", "frac34", "iquest", "Agrave", "Aacute", "Acirc",
      "Atilde", "Auml", "Aring", "AElig", "Ccedil", "Egrave",
      "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
      "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml",
      "times", "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml",
      "Yacute", "THORN", "szlig", "agrave", "aacute", "acirc",
      "atilde", "auml", "aring", "aelig", "ccedil", "egrave",
      "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
      "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml",
      "divide", "oslash", "ugrave", "uacute", "ucirc", "uuml",
      "yacute", "thorn", "yuml")
      .zipWithIndex.map { case (n, i) => n -> (160 + i).toChar.toString }
    val other = Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'",
      "OElig" -> "\u0152", "oelig" -> "\u0153", "Scaron" -> "\u0160",
      "scaron" -> "\u0161", "Yuml" -> "\u0178", "fnof" -> "\u0192",
      "circ" -> "\u02c6", "tilde" -> "\u02dc",
      "ensp" -> "\u2002", "emsp" -> "\u2003", "thinsp" -> "\u2009",
      "zwnj" -> "\u200c", "zwj" -> "\u200d", "lrm" -> "\u200e",
      "rlm" -> "\u200f",
      "ndash" -> "\u2013", "mdash" -> "\u2014",
      "lsquo" -> "\u2018", "rsquo" -> "\u2019", "sbquo" -> "\u201a",
      "ldquo" -> "\u201c", "rdquo" -> "\u201d", "bdquo" -> "\u201e",
      "dagger" -> "\u2020", "Dagger" -> "\u2021", "bull" -> "\u2022",
      "hellip" -> "\u2026", "permil" -> "\u2030", "prime" -> "\u2032",
      "Prime" -> "\u2033", "lsaquo" -> "\u2039", "rsaquo" -> "\u203a",
      "oline" -> "\u203e", "frasl" -> "\u2044", "euro" -> "\u20ac",
      "trade" -> "\u2122", "alefsym" -> "\u2135",
      "larr" -> "\u2190", "uarr" -> "\u2191", "rarr" -> "\u2192",
      "darr" -> "\u2193", "harr" -> "\u2194",
      "minus" -> "\u2212", "lowast" -> "\u2217", "radic" -> "\u221a",
      "prop" -> "\u221d", "infin" -> "\u221e", "asymp" -> "\u2248",
      "ne" -> "\u2260", "equiv" -> "\u2261", "le" -> "\u2264",
      "ge" -> "\u2265", "loz" -> "\u25ca", "spades" -> "\u2660",
      "clubs" -> "\u2663", "hearts" -> "\u2665", "diams" -> "\u2666")
    (latin1 ++ other).toMap
  }

  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          // toChars stays INSIDE the Try: an out-of-range reference
          // (&#x110000;, &#-1;) parses as an int but is not a valid
          // code point, and "corrupt input never throws" is the parse
          // contract — keep it literal text instead
          val rep: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              scala.util.Try(Character.toChars(
                Integer.parseInt(body.drop(2), 16)).mkString).toOption
            else if (body.startsWith("#"))
              scala.util.Try(Character.toChars(body.drop(1).toInt)
                .mkString).toOption
            else NamedEntities.get(body)
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private final class Builder(val tag: String,
      val attrs: Map[String, String]) {
    val children = ArrayBuffer.empty[Node]
    def finish(): Elem = Elem(tag, attrs, children.toVector)
  }

  /** Parse tag soup into a tree under a synthetic `[root]` element.
    * Never throws on malformed input. */
  def parse(html: String): Elem = {
    val s = if (html == null) "" else html
    val root = new Builder("[root]", Map.empty)
    val stack = ArrayBuffer(root)
    def top = stack.last
    def addText(raw: String): Unit =
      if (raw.nonEmpty) top.children += TextNode(decodeEntities(raw))
    def closeTag(t: String): Unit = {
      val idx = stack.lastIndexWhere(_.tag == t)
      if (idx > 0) { // never pop the synthetic root
        while (stack.length > idx) {
          val b = stack.remove(stack.length - 1)
          stack.last.children += b.finish()
        }
      } // unmatched close: ignored (html5lib drops it too)
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { addText(s.substring(i)); i = n }
      else {
        addText(s.substring(i, lt))
        if (lt + 1 >= n) { addText("<"); i = n }
        else s.charAt(lt + 1) match {
          case '!' =>
            // comment, doctype or CDATA — skip to the proper terminator
            if (s.startsWith("<!--", lt)) {
              val end = s.indexOf("-->", lt + 4)
              i = if (end < 0) n else end + 3
            } else {
              val end = s.indexOf('>', lt)
              i = if (end < 0) n else end + 1
            }
          case '?' => // processing instruction
            val end = s.indexOf('>', lt)
            i = if (end < 0) n else end + 1
          case '/' =>
            val end = s.indexOf('>', lt)
            if (end < 0) i = n
            else {
              // close on the TAG NAME only: tag soup like `</div id=x>`
              // must still close the div (html5lib drops the junk), not
              // silently no-op and swallow the rest of the page
              closeTag(lc(s.substring(lt + 2, end).trim
                .takeWhile(!_.isWhitespace)))
              i = end + 1
            }
          case c if c.isLetter =>
            val (elemEnd, tag, attrs, selfClosed) = parseTag(s, lt)
            i = elemEnd
            if (SelfClosing(tag) && top.tag == tag) closeTag(tag)
            // RawText is checked BEFORE the self-closing flag: HTML5
            // ignores that flag on non-void elements, so `<script/>`
            // still switches to script-data state — treating it as an
            // empty element would parse the script BODY as markup
            // (phantom elements from string literals, dropped
            // `</script>`), exactly what html5lib guards against.
            if (VoidTags(tag))
              top.children += Elem(tag, attrs, Vector.empty)
            else if (RawText(tag)) {
              // raw content until the case-insensitive close tag. Scan
              // with regionMatches on the ORIGINAL string — an
              // s.toLowerCase copy can change LENGTH (U+0130 'İ'
              // lowercases to 2 chars) and misalign every offset after
              // it. html5lib only closes on "</tag" followed by a
              // delimiter, so "</scripts>" inside a script must NOT
              // terminate it.
              val close = "</" + tag
              var idx = -1
              var j = i
              while (idx < 0 && j <= n - close.length) {
                if (s.regionMatches(true, j, close, 0, close.length)) {
                  val after = j + close.length
                  if (after >= n || s.charAt(after) == '>' ||
                    s.charAt(after) == '/' || s.charAt(after).isWhitespace)
                    idx = j
                  else j += 1
                } else j += 1
              }
              val (content, next) =
                if (idx < 0) (s.substring(i), n)
                else {
                  val gt = s.indexOf('>', idx)
                  (s.substring(i, idx), if (gt < 0) n else gt + 1)
                }
              // RCDATA (title/textarea) decodes character references
              // like ordinary text; true raw text (script/style) does
              // not — the html5lib tokenizer states differ exactly so
              val body =
                if (Rcdata(tag)) decodeEntities(content) else content
              top.children += Elem(tag, attrs,
                if (body.isEmpty) Vector.empty
                else Vector(TextNode(body)))
              i = next
            } else if (selfClosed)
              top.children += Elem(tag, attrs, Vector.empty)
            else stack += new Builder(tag, attrs)
          case _ => // stray '<' — literal text
            addText("<")
            i = lt + 1
        }
      }
    }
    while (stack.length > 1) { // unclosed tags close at EOF
      val b = stack.remove(stack.length - 1)
      stack.last.children += b.finish()
    }
    root.finish()
  }

  /** Parse one open tag starting at `lt` ('<'). Returns (index after
    * '>', tag, attrs, selfClosed). */
  private def parseTag(s: String, lt: Int)
      : (Int, String, Map[String, String], Boolean) = {
    var i = lt + 1
    val n = s.length
    val tagStart = i
    while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '-')) i += 1
    val tag = lc(s.substring(tagStart, i))
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') {
            selfClosed = true; i += 2; done = true
          } else i += 1
        case _ =>
          val nameStart = i
          while (i < n && !s.charAt(i).isWhitespace &&
            s.charAt(i) != '=' && s.charAt(i) != '>' &&
            s.charAt(i) != '/') i += 1
          val name = lc(s.substring(nameStart, i))
          while (i < n && s.charAt(i).isWhitespace) i += 1
          var value = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i)
              val end = s.indexOf(q, i + 1)
              if (end < 0) { value = s.substring(i + 1); i = n }
              else { value = s.substring(i + 1, end); i = end + 1 }
            } else {
              val vs = i
              while (i < n && !s.charAt(i).isWhitespace &&
                s.charAt(i) != '>') i += 1
              value = s.substring(vs, i)
            }
          }
          if (name.nonEmpty && !attrs.contains(name))
            attrs(name) = decodeEntities(value)
      }
    }
    (i, tag, attrs.toMap, selfClosed)
  }
}
