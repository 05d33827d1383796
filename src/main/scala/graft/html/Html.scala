package graft.html

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Deterministic HTML text & link extraction (SURVEY.md §2.2 N1/N2).
  *
  * These are *pure functions of the input bytes* — no locale, no clock, no
  * library lookup — so the "byte-identical extracted text per url" invariant
  * (BASELINE.json input_hint) is checkable end-to-end: the synthetic pages
  * generator writes `text := extractText(html)` with this very function and
  * golden SHA-256 digests of the text column are asserted in tests.
  *
  * Spec (pinned here, tested in HtmlSpec):
  *   - html bytes are decoded as UTF-8 (malformed sequences → U+FFFD).
  *   - <script>/<style> elements are removed including their content.
  *   - All remaining tags are stripped; block-ish boundaries become spaces.
  *   - Entities &amp; &lt; &gt; &quot; &#39; &nbsp; are decoded.
  *   - Whitespace runs collapse to a single ASCII space; result is trimmed.
  */
object Html {

  def extractText(html: Array[Byte]): String = {
    if (html == null) return ""
    extractText(new String(html, StandardCharsets.UTF_8))
  }

  def extractText(html: String): String = {
    val noScript = dropElement(dropElement(html, "script"), "style")
    val sb = new java.lang.StringBuilder(noScript.length)
    var i = 0
    var inTag = false
    while (i < noScript.length) {
      val c = noScript.charAt(i)
      if (inTag) { if (c == '>') { inTag = false; sb.append(' ') } }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    collapseWs(decodeEntities(sb.toString))
  }

  /** Extract href targets of <a> elements, resolved against the page url,
    * normalized, deduplicated (first-occurrence order), self-links dropped. */
  def extractLinks(pageUrl: String, html: Array[Byte]): Array[String] = {
    if (html == null) return Array.empty
    extractLinks(pageUrl, new String(html, StandardCharsets.UTF_8))
  }

  private val HrefRe =
    """(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  def extractLinks(pageUrl: String, html: String): Array[String] = {
    val self = normalizeUrl(pageUrl)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    for (m <- HrefRe.findAllMatchIn(html)) {
      val raw = Option(m.group(2)).orElse(Option(m.group(3)))
        .getOrElse(m.group(4))
      resolve(pageUrl, decodeEntities(raw.trim)).foreach { u =>
        if (u != self) seen += u
      }
    }
    seen.toArray
  }

  /** Canonical url: lowercase scheme+host, strip fragment, drop default
    * port, drop trailing slash on bare host, keep path+query verbatim. */
  def normalizeUrl(url: String): String = {
    val noFrag = { val h = url.indexOf('#'); if (h >= 0) url.substring(0, h) else url }
    val si = noFrag.indexOf("://")
    if (si < 0) return noFrag
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val pe = { val p = rest.indexOf('/'); if (p >= 0) p else rest.length }
    var hostPort = rest.substring(0, pe).toLowerCase
    if (scheme == "http" && hostPort.endsWith(":80")) hostPort = hostPort.dropRight(3)
    if (scheme == "https" && hostPort.endsWith(":443")) hostPort = hostPort.dropRight(4)
    val path = rest.substring(pe)
    val p2 = if (path == "/" || path.isEmpty) "" else path
    s"$scheme://$hostPort$p2"
  }

  /** Resolve an href against a base url; absolute/relative/protocol-relative;
    * None for unsupported schemes (mailto:, javascript:, data:). */
  def resolve(base: String, href: String): Option[String] = {
    if (href.isEmpty) return None
    val lower = href.toLowerCase
    if (lower.startsWith("http://") || lower.startsWith("https://"))
      return Some(normalizeUrl(href))
    if (href.contains(":") && !href.startsWith("/") && !href.startsWith("."))
      return None // mailto:, javascript:, data:, tel: ...
    val bi = base.indexOf("://")
    if (bi < 0) return None
    val scheme = base.substring(0, bi).toLowerCase
    if (href.startsWith("//")) return Some(normalizeUrl(s"$scheme:$href"))
    val afterScheme = base.substring(bi + 3)
    val hostEnd = { val p = afterScheme.indexOf('/'); if (p >= 0) p else afterScheme.length }
    val host = afterScheme.substring(0, hostEnd)
    if (href.startsWith("/")) return Some(normalizeUrl(s"$scheme://$host$href"))
    // relative path: resolve against base directory
    val basePath = afterScheme.substring(hostEnd)
    val dir = { val p = basePath.lastIndexOf('/'); if (p >= 0) basePath.substring(0, p + 1) else "/" }
    Some(normalizeUrl(s"$scheme://$host${mergeDots(dir + href)}"))
  }

  private def mergeDots(path: String): String = {
    val out = ArrayBuffer.empty[String]
    path.split("/", -1).foreach {
      case "."  =>
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg  => out += seg
    }
    val joined = out.mkString("/")
    if (joined.startsWith("/")) joined else "/" + joined
  }

  private def dropElement(html: String, tag: String): String = {
    val sb = new java.lang.StringBuilder(html.length)
    val lower = html.toLowerCase
    val open = "<" + tag
    val close = "</" + tag
    var i = 0
    while (i < html.length) {
      val s = lower.indexOf(open, i)
      val isElem = s >= 0 && s + open.length < lower.length && {
        val c = lower.charAt(s + open.length); c == '>' || c == ' ' || c == '\t' || c == '\n'
      }
      if (!isElem) { sb.append(html, i, html.length); i = html.length }
      else {
        sb.append(html, i, s)
        val e = lower.indexOf(close, s)
        if (e < 0) i = html.length
        else {
          val gt = lower.indexOf('>', e)
          i = if (gt < 0) html.length else gt + 1
        }
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
