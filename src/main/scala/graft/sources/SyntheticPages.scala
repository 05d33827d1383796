package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.html.Html
import graft.util.Hashing.{h64, hashString, uniformInt}

/** A Common-Crawl-style web page row — exactly the input_hint schema
  * (BASELINE.json:15): (url string, warc_ts timestamp, html binary,
  * text string, lang string). */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Deterministic synthetic pages table (FIXTURES.md §1).
  *
  * Every column is a pure function of (i, n, seed): generation is
  * partition-count-independent and reproducible bitwise. `text` is computed
  * with the engine's own [[Html.extractText]], making the byte-identical
  * extracted-text invariant checkable end-to-end.
  *
  * Link structure: out-degree follows a discrete power law (Zipf-like
  * s≈2.1, capped), with ~1% designated hub pages of high degree — web-graph
  * hub skew on purpose, so skew handling (salting/AQE) is exercised.
  */
object SyntheticPages {
  val Langs: Array[String] = Array("en", "de", "es", "fr", "zh")

  private val fillerByLang: Map[String, Array[String]] = Map(
    "en" -> Array("the quick brown fox jumps over the lazy dog",
      "data systems and the web of linked documents",
      "a graph is a set of vertices and edges"),
    "de" -> Array("der schnelle braune fuchs springt und der hund schlaeft",
      "die daten und das netz der verlinkten dokumente",
      "ein graph ist eine menge von knoten und kanten"),
    "es" -> Array("el zorro marron salta sobre el perro perezoso",
      "los datos y la red de documentos enlazados",
      "un grafo es un conjunto de vertices y aristas"),
    "fr" -> Array("le renard brun saute par dessus le chien paresseux",
      "les donnees et le reseau des documents lies",
      "un graphe est un ensemble de sommets et aretes"),
    "zh" -> Array("敏捷的棕色狐狸跳过懒狗", "数据系统与链接文档的网络", "图是顶点和边的集合"))

  def siteCount(n: Long): Int = math.max(4, (n / 100).min(10000).toInt)

  def urlOf(i: Long, n: Long, seed: Long): String =
    s"https://site${java.lang.Math.floorMod(h64(seed, i, 1L), siteCount(n).toLong)}.example/p/$i"

  /** Power-law out-degree with hub injection (pure function of i). */
  def outDegreeOf(i: Long, n: Long, seed: Long): Int = {
    val cap = math.min(1000L, n - 1).toInt
    if (cap <= 0) return 0
    val isHub = n >= 10000 && java.lang.Math.floorMod(h64(seed, i, 2L), 100L) == 0L
    if (isHub) math.min(cap, 1000 + uniformInt(500, seed, i, 3L))
    else {
      // discrete Zipf(s=2.1) via inverse transform: d = ceil(u^(-1/(s-1)))
      val u = math.max(graft.util.Hashing.u01(seed, i, 4L), 1e-12)
      val d = math.ceil(math.pow(u, -1.0 / 1.1)).toLong
      math.min(cap.toLong, d).toInt
    }
  }

  /** Link targets of page i: deterministic, self-loops dropped, deduped. */
  def targetsOf(i: Long, n: Long, seed: Long): Array[Long] = {
    val d = outDegreeOf(i, n, seed)
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    var k = 0L
    while (seen.size < d && k < d * 3L + 8L) { // bounded retry for dupes/self
      val j = java.lang.Math.floorMod(h64(seed, i, 5L, k), n)
      if (j != i) seen += j
      k += 1
    }
    seen.toArray
  }

  def htmlOf(i: Long, n: Long, seed: Long): String = {
    val lang = Langs(uniformInt(Langs.length, seed, i, 6L))
    val filler = fillerByLang(lang)
    val sb = new StringBuilder(512)
    sb ++= s"<html><head><title>T$i</title></head><body>"
    sb ++= "<script>var x = 'never in text';</script>"
    val nSentences = 1 + uniformInt(4, seed, i, 7L)
    var s = 0
    while (s < nSentences) {
      sb ++= "<p>"
      sb ++= filler(uniformInt(filler.length, seed, i, 8L, s.toLong))
      sb ++= s" page $i sentence $s.</p>"
      s += 1
    }
    var k = 0
    val ts = targetsOf(i, n, seed)
    while (k < ts.length) {
      sb ++= s"""<a href="${urlOf(ts(k), n, seed)}">anchor$k</a> """
      k += 1
    }
    sb ++= "</body></html>"
    sb.toString
  }

  def langOf(i: Long, n: Long, seed: Long): String =
    Langs(uniformInt(Langs.length, seed, i, 6L))

  def pageOf(i: Long, n: Long, seed: Long): Page = {
    val html = htmlOf(i, n, seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tsSec = java.lang.Math.floorMod(h64(seed, i, 9L), 86400L * 365L)
    // 2025-01-01T00:00:00Z epoch = 1735689600
    Page(urlOf(i, n, seed), new Timestamp((1735689600L + tsSec) * 1000L),
      html, Html.extractText(html), langOf(i, n, seed))
  }

  /** Distributed generation: one narrow map over spark.range — no shuffle. */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               parts: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (parts > 0) spark.range(0L, n, 1L, parts) else spark.range(n)
    base.map(i => pageOf(i, n, seed))
  }

  /** The exact edge list the generator implies (for oracle-side checks). */
  def expectedEdges(i: Long, n: Long, seed: Long): Array[(Long, Long)] =
    targetsOf(i, n, seed).map(j => (i, j))
}
