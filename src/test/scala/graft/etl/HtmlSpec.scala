package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the tolerant HTML parser + CSS subset that backs
  * [[ProductExtract]]. Expectations mirror BeautifulSoup/html5lib
  * behavior on the same snippets (the reference parses with html5lib,
  * `products_scraping.py:371`). */
class HtmlSpec extends AnyFunSuite {
  import Html._

  test("basic nesting, attributes and text") {
    val doc = parse(
      """<div class="a b" id=main><p>hello <b>world</b></p></div>""")
    val div = doc.selectOne("div").get
    assert(div.classes == Set("a", "b"))
    assert(div.attr("id").contains("main"))
    assert(div.text == "hello world")
    assert(doc.selectOne("b").get.text == "world")
  }

  test("void elements never swallow siblings") {
    val doc = parse("<div><img src=x.png><span>after</span></div>")
    val div = doc.selectOne("div").get
    assert(div.findFirst("img").flatMap(_.attr("src")).contains("x.png"))
    assert(div.findFirst("span").map(_.text).contains("after"))
    // img has no children — span is its SIBLING
    assert(doc.selectOne("img").get.children.isEmpty)
  }

  test("raw-text elements: script content is opaque text") {
    val doc = parse(
      "<script>if (a < b) { x = '<div>'; }</script><p>t</p>")
    assert(doc.selectOne("script").get.text.contains("a < b"))
    assert(doc.select("div").isEmpty) // the '<div>' inside script is text
    assert(doc.selectOne("p").get.text == "t")
  }

  test("self-closed raw-text tags still open raw-text state (HTML5 " +
      "ignores the / on non-void elements)") {
    val doc = parse("""<script src="a.js"/>var t = '<span class="sku">""" +
      """FAKE</span>';</script><span class="sku">REAL</span>""")
    // the script BODY must be opaque — no phantom span from the string
    // literal, and the real span after </script> must survive
    val spans = doc.select("span.sku")
    assert(spans.map(_.text) == Seq("REAL"), spans.map(_.text))
    assert(doc.selectOne("script").get.text.contains("FAKE"))
  }

  test("RCDATA (title/textarea) decodes entities; script/style stay " +
      "byte-literal") {
    val doc = parse("<title>Tom &amp; Jerry</title>" +
      "<textarea>5 &lt; 6</textarea>" +
      "<style>a::before { content: '&amp;'; }</style>")
    assert(doc.selectOne("title").get.text == "Tom & Jerry")
    assert(doc.selectOne("textarea").get.text == "5 < 6")
    assert(doc.selectOne("style").get.text.contains("'&amp;'"))
  }

  test("HTML 4.01 named entities decode (accented product names)") {
    val doc = parse("<h1>Caf&eacute; au lait &ndash; 5&deg; " +
      "&euro;2 &frac12; &Agrave;&szlig;&trade;</h1>")
    assert(doc.selectOne("h1").get.text ==
      "Café au lait – 5° €2 ½ Àß™")
    // unknown names still pass through as literal text
    assert(parse("<p>&notanentity;</p>").selectOne("p").get.text ==
      "&notanentity;")
  }

  test("entity decoding in text and attributes") {
    val doc = parse(
      """<p title="A &amp; B">x &lt; y&#33; gi&#225; 5&nbsp;&#x20ab;</p>""")
    val p = doc.selectOne("p").get
    assert(p.attr("title").contains("A & B"))
    assert(p.text == "x < y! gi\u00e1 5\u00a0\u20ab")
  }

  test("unmatched close tags are ignored; unclosed tags close at EOF") {
    val doc = parse("<div><span>a</b></span><p>tail")
    assert(doc.selectOne("span").get.text == "a")
    assert(doc.selectOne("p").get.text == "tail")
  }

  test("li implicitly closes a previous li") {
    val doc = parse("<ul><li>one<li>two<li>three</ul>")
    assert(doc.select("li").map(_.text.trim) == Seq("one", "two", "three"))
  }

  test("descendant chains match through intermediate levels") {
    val doc = parse(
      """<p class="price">from <span class="woocommerce-Price-amount">
        |<bdi>125,000<span>&#8363;</span></bdi></span></p>""".stripMargin)
    val hit = doc.selectOne("p.price span.woocommerce-Price-amount bdi")
    assert(hit.isDefined)
    assert(hit.get.textStripped == "125,000₫")
    // chain order matters: reversed ancestors must NOT match
    assert(doc.selectOne("bdi p.price").isEmpty)
  }

  test("select returns document order; select_one is the first") {
    val doc = parse(
      """<div class=c><i>1</i></div><div class=c><i>2</i></div>""")
    assert(doc.select(".c").map(_.text) == Seq("1", "2"))
    assert(doc.selectOne(".c").get.text == "1")
  }

  test("tag.class and #id compound selectors") {
    val doc = parse(
      """<a class="d-block x">link</a><span class=d-block>no</span>
        |<div id=gal class=wrap>g</div>""".stripMargin)
    assert(doc.selectOne("a.d-block").get.text == "link")
    assert(doc.select("#gal").map(_.text) == Seq("g"))
    assert(doc.selectOne("div#gal.wrap").get.text == "g")
  }

  test("unsupported CSS features fail loudly, not silently-empty") {
    val doc = parse("<a>x</a>")
    intercept[IllegalArgumentException](doc.select("a > b"))
    intercept[IllegalArgumentException](doc.select("a:hover"))
    intercept[IllegalArgumentException](doc.select("a[href]"))
  }

  test(":contains matches element text (igloo pagination selector)") {
    val doc = parse(
      """<a class="page-link" href="/p/1">Prev</a>
        |<a class="page-link" href="/p/3">Next</a>
        |<a class="other" href="/x">Next</a>""".stripMargin)
    val hit = doc.selectOne("a.page-link:contains(Next)")
    assert(hit.flatMap(_.attr("href")).contains("/p/3"))
    assert(doc.selectOne("a.page-link:contains(Last)").isEmpty)
    // quoted form too
    assert(doc.selectOne("""a:contains("Prev")""")
      .flatMap(_.attr("href")).contains("/p/1"))
  }

  test("get_text(strip=True) strips chunks and joins without separator") {
    val doc = parse("<p>  125.000\n  <b> VND </b>\n</p>")
    assert(doc.selectOne("p").get.textStripped == "125.000VND")
    // .text keeps raw whitespace
    assert(doc.selectOne("p").get.text.contains("\n"))
  }

  test("render→parse round-trips random trees (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def forAllG[A](g: Gen[A], n: Int = 30)(f: A => Unit): Unit =
      (1 to n).foreach(i =>
        g.apply(Gen.Parameters.default, Seed(7L + i)).foreach(f))
    val tagGen = Gen.oneOf("div", "span", "section", "article", "b", "em")
    // text draws include the chars that MUST round-trip through
    // entity escaping (& < > ") plus Vietnamese/currency codepoints
    val textGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcxyz &<>\"'áđ₫ộ".toSeq)).map(_.mkString))
    val attrGen = Gen.mapOfN(2, Gen.zip(
      Gen.oneOf("class", "id", "title", "data-x"), textGen))
    def nodeGen(depth: Int): Gen[Html.Node] =
      if (depth == 0) textGen.map(Html.TextNode)
      else Gen.frequency(
        3 -> textGen.map(Html.TextNode),
        2 -> elemGen(depth - 1))
    def elemGen(depth: Int): Gen[Html.Elem] = for {
      tag <- tagGen
      attrs <- attrGen
      n <- Gen.choose(0, 3)
      kids <- Gen.listOfN(n, nodeGen(depth))
    } yield Html.Elem(tag, attrs,
      // adjacent text nodes merge on parse — normalize the generated
      // tree the same way so equality is structural
      kids.foldLeft(Vector.empty[Html.Node]) {
        case (acc :+ Html.TextNode(a), Html.TextNode(b)) =>
          acc :+ Html.TextNode(a + b)
        case (acc, k) => acc :+ k
      })
    def esc(s: String) = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
    def render(n: Html.Node): String = n match {
      case Html.TextNode(d) => esc(d)
      case Html.Elem(t, attrs, kids) =>
        val a = attrs.map { case (k, v) =>
          s""" $k="${esc(v).replace("\"", "&quot;")}"""" }.mkString
        s"<$t$a>${kids.map(render).mkString}</$t>"
    }
    forAllG(elemGen(3)) { tree =>
      val parsed = parse(render(tree)).children
      assert(parsed == Vector(tree),
        s"round-trip diverged for ${render(tree)}")
    }
  }

  test("raw-text close detection: no offset drift past 'İ', no early " +
      "close on longer tag names, out-of-range entities stay literal") {
    // U+0130 lowercases to TWO chars — a lowercased-copy scan would
    // misalign every offset after it and corrupt the rest of the doc
    val doc = parse("<p>İstanbul</p><script>x</script><b>after</b>")
    assert(doc.selectOne("b").map(_.text).contains("after"))
    assert(doc.selectOne("script").map(_.text).contains("x"))
    // "</scripts>" inside a script is CONTENT (html5lib requires a
    // delimiter after the tag name), "</SCRIPT>" closes case-insensitively
    val doc2 = parse("""<script>a = "</scripts>";</SCRIPT><p>t</p>""")
    assert(doc2.selectOne("script").get.text.contains("</scripts>"))
    assert(doc2.selectOne("p").map(_.text).contains("t"))
    // numeric reference beyond U+10FFFF: never throws, stays literal
    assert(parse("<p>&#x110000; &#1114112; ok</p>")
      .selectOne("p").get.text.endsWith("ok"))
  }

  test("close tags with junk attributes close on the tag name; the " +
      "universal selector matches anything") {
    // html5lib closes `</div id=x>` on the div — a no-op here would
    // leave the div open and swallow the rest of the page
    val doc = parse("""<div class=a>in</div id="x"><p>out</p>""")
    assert(doc.selectOne("div.a").get.text == "in")
    assert(doc.selectOne("div.a p").isEmpty, "trailing <p> was swallowed")
    // '*' is the CSS universal selector, not a tag named "*"
    val doc2 = parse("<div><span class=c><i>x</i></span></div>")
    assert(doc2.select("*").map(_.tag) == Seq("div", "span", "i"))
    assert(doc2.selectOne("div * i").map(_.text).contains("x"))
    assert(doc2.selectOne("*.c").get.tag == "span")
  }

  test("comments and doctype are skipped; truncated input never throws") {
    val doc = parse(
      "<!DOCTYPE html><!-- <div>not real</div> --><p>ok</p><div class=")
    assert(doc.select("div").size <= 1) // comment div NOT parsed
    assert(doc.selectOne("p").get.text == "ok")
    assert(parse("").select("p").isEmpty)
    assert(parse(null).select("p").isEmpty)
  }
}
