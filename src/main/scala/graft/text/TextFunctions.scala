package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything here is a pure Catalyst column expression (whole-stage
  * codegen'd, no UDFs) built only from `functions._`, so filters composed
  * from these push down and the operators cost one scan at 100 TB. Each
  * has a matching ANSI-SQL rendering (SqlText) used by the DuckDB oracle —
  * semantics are pinned by construction.
  */
object TextFunctions {

  /** Whitespace token count (single-space tokenizer — documents corpora
    * here are pre-normalized; swap the pattern for real webtext). */
  def tokenCount(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** Occurrences of a literal marker in text, via length difference. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      marker.length).cast("long")

  /** Stopword-marker table for the n-gram language heuristic. Markers are
    * space-padded to approximate word boundaries. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " das "),
    "es" -> Seq(" el ", " los ", " de "),
    "fr" -> Seq(" le ", " les ", " des "),
    "zh" -> Seq("的", "是", "了"))

  /** Per-language marker score. */
  def langScore(text: Column, lang: String): Column =
    langMarkers.find(_._1 == lang).get._2
      .map(m => occurrences(concat(lit(" "), text, lit(" ")), m))
      .reduce(_ + _)

  /** Heuristic language ID: argmax marker score, ties → "und" if all 0,
    * else first language in table order (deterministic). */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => (l, langScore(text, l)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?]", ""))).cast("long")

  /** Digit character count. */
  def digitCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long")

  /** Quality score in [0,1]: penalizes extreme punct/digit ratios and
    * degenerate token lengths — the usual cheap webtext filters
    * (length/punct/stopword ratios). Deterministic, SQL-expressible. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val digitRatio = digitCount(text).cast("double") / greatest(nChars, lit(1.0))
    val avgTokLen = nChars / greatest(nTok, lit(1.0))
    val lenOk = when(nChars >= 20 && nChars <= 20000, lit(1.0)).otherwise(lit(0.5))
    val tokOk = when(avgTokLen >= 2.0 && avgTokLen <= 12.0, lit(1.0))
      .otherwise(lit(0.5))
    round(lenOk * tokOk * (lit(1.0) - least(punctRatio * 4, lit(0.5)))
      * (lit(1.0) - least(digitRatio * 2, lit(0.5))), 6)
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text.
    * (md5 exists identically in Spark and DuckDB; an xxhash64 variant is
    * cheaper at scale but engine-specific.) */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")).cast("binary"))

  // --- matching SQL renderings for the DuckDB oracle ---------------------

  object SqlText {
    def occurrencesSql(textExpr: String, marker: String): String = {
      val esc = marker.replace("'", "''")
      s"CAST((length($textExpr) - length(replace($textExpr, '$esc', '')))" +
        s" / ${marker.length} AS BIGINT)"
    }

    def langScoreSql(lang: String): String =
      langMarkers.find(_._1 == lang).get._2
        .map(m => occurrencesSql("(' ' || text || ' ')", m))
        .mkString("(", " + ", ")")

    def langIdSql: String = {
      val scoreCols = langMarkers.map { case (l, _) =>
        s"${langScoreSql(l)} AS s_$l" }.mkString(", ")
      val best = langMarkers.map(l => s"s_${l._1}").mkString("greatest(", ", ", ")")
      val pick = langMarkers.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
        s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $acc END"
      }
      val sNames = langMarkers.map(l => s"s_${l._1}").mkString(", ")
      s"SELECT doc_id, $pick AS lang_id FROM " +
        s"(SELECT doc_id, $sNames, $best AS best FROM " +
        s"(SELECT doc_id, $scoreCols FROM documents))"
    }

    val qualitySql: String = {
      val punct = "(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))"
      val digit = "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
      val nTok = "len(string_split(text, ' '))"
      s"""SELECT doc_id, round(
         |  (CASE WHEN length(text) >= 20 AND length(text) <= 20000
         |        THEN 1.0 ELSE 0.5 END)
         |  * (CASE WHEN CAST(length(text) AS DOUBLE) / greatest($nTok, 1) >= 2.0
         |          AND CAST(length(text) AS DOUBLE) / greatest($nTok, 1) <= 12.0
         |        THEN 1.0 ELSE 0.5 END)
         |  * (1.0 - least(CAST($punct AS DOUBLE) / greatest(length(text), 1) * 4, 0.5))
         |  * (1.0 - least(CAST($digit AS DOUBLE) / greatest(length(text), 1) * 2, 0.5))
         |, 6) AS quality FROM documents""".stripMargin
    }

    val fingerprintSql: String =
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |  AS fp FROM documents""".stripMargin
  }
}
