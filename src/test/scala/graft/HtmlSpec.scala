package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.Html

class HtmlSpec extends AnyFunSuite {

  test("extractText strips tags, scripts, styles; collapses whitespace") {
    val html = """<html><head><title>T</title>
      |<style>body { color: red; }</style></head>
      |<body><script>var x = "<b>not text</b>";</script>
      |<p>Hello   <b>world</b>!</p>
      |<div>Second&nbsp;line &amp; more</div></body></html>""".stripMargin
    assert(Html.extractText(html) == "T Hello world ! Second line & more")
  }

  test("extractText is a pure function of bytes (byte-identical invariant)") {
    val h = graft.sources.SyntheticPages.htmlOf(7, 100, 42)
    val a = Html.extractText(h.getBytes("UTF-8"))
    val b = Html.extractText(h.getBytes("UTF-8"))
    assert(a == b)
    assert(a.nonEmpty)
    assert(!a.contains("never in text")) // script content dropped
    assert(!a.contains("<"))
  }

  test("generator text column equals extractText(html) byte-for-byte") {
    (0L until 50L).foreach { i =>
      val p = graft.sources.SyntheticPages.pageOf(i, 50, 42)
      assert(p.text == Html.extractText(p.html), s"page $i")
    }
  }

  test("extractLinks resolves absolute, relative, protocol-relative") {
    val html =
      """<a href="https://Other.Example/x#frag">a</a>
        |<a href='/abs/path'>b</a>
        |<a href=rel.html>c</a>
        |<a href="../up.html">d</a>
        |<a href="//cdn.example/y">e</a>
        |<a href="mailto:x@y.z">f</a>
        |<a href="javascript:void(0)">g</a>
        |<a href="https://other.example/x">dupe</a>""".stripMargin
    val links = Html.extractLinks("https://site.example/a/b/page.html", html)
    assert(links.toSeq == Seq(
      "https://other.example/x",
      "https://site.example/abs/path",
      "https://site.example/a/b/rel.html",
      "https://site.example/a/up.html",
      "https://cdn.example/y"))
  }

  test("normalizeUrl canonicalizes") {
    assert(Html.normalizeUrl("HTTPS://Site.Example:443/p/1#x") ==
      "https://site.example/p/1")
    assert(Html.normalizeUrl("http://a.b:80/") == "http://a.b")
    assert(Html.normalizeUrl("https://a.b") == "https://a.b")
    assert(Html.normalizeUrl("https://a.b/p?q=1#f") == "https://a.b/p?q=1")
  }

  test("self-links dropped, first-occurrence order kept") {
    val links = Html.extractLinks("https://s.example/p",
      """<a href="https://s.example/p#self">x</a><a href="https://s.example/q">y</a>""")
    assert(links.toSeq == Seq("https://s.example/q"))
  }
}
