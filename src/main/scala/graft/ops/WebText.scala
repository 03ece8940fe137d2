package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text operators: HTML → text extraction and URL
  * canonicalization — the front half of a Common-Crawl-shaped curation
  * pipeline (WARC payloads in [[graft.sources.WarcReader]] feed these;
  * downstream is [[TextAnalysis]] / [[Dedup]]).
  *
  * Everything here is composed from codegen'd built-ins
  * (regexp_replace / higher-order array functions — no UDFs), and every
  * rule is deliberately expressible in portable SQL so the operators
  * carry EXACT DuckDB oracles like the sketch family: the same
  * regex/split/sort pipeline runs on both engines. That also pins the
  * semantics: extraction is a deterministic function of the markup, not
  * of a library version.
  */
object WebText {

  /** Extracted visible text of an HTML document.
    *
    * Deterministic rule chain (each step a codegen'd regexp_replace):
    *  1. drop `<script>`/`<style>` ELEMENTS (tag + content — their text
    *     is code, not prose) and HTML comments;
    *  2. strip every remaining tag to a space (block/inline distinction
    *     doesn't matter once whitespace collapses);
    *  3. decode the six entities that dominate real markup
    *     (`&lt; &gt; &quot; &#39; &nbsp;` and LAST `&amp;` — decoding
    *     it earlier would double-decode `&amp;lt;`);
    *  4. collapse whitespace runs to one space and trim.
    *
    * Boilerplate removal (nav/footer link soup) is a separate,
    * tunable pass — see [[linkDensity]]. */
  def htmlToText(html: Column): Column = {
    // two passes, no backreference — the oracle's RE2 dialect has none
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** `<title>` text of an HTML document ('' when absent). */
  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, "(?is)<title[^>]*>([^<]*)</title>", 1))

  /** All `href` link targets of an HTML document, in document order. */
  def htmlLinks(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?is)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\""),
        lit(1)),
      u => trim(u))

  /** Link density — hyperlinked chars / visible text chars, the classic
    * boilerplate signal (nav bars and footers are mostly links): pages
    * or blocks above ~0.5 are link soup, prose sits near 0. */
  def linkDensity(html: Column): Column = {
    val linkText = regexp_replace(
      concat_ws(" ", regexp_extract_all(html,
        lit("(?is)<a\\s[^>]*>(.*?)</a\\s*>"), lit(1))),
      "(?s)<[^>]*>", " ")
    val visible = htmlToText(html)
    round(length(trim(regexp_replace(linkText, "\\s+", " "))).cast("double") /
      greatest(length(visible), lit(1)).cast("double"), 6)
  }

  /** Block-level splits for [[blocks]]: opening or closing tags of the
    * HTML block-level elements (prose never flows across these). */
  private val BlockTagRe =
    "(?is)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|" +
      "header|footer|nav|aside|main|blockquote|figure|br|hr)\\b[^>]*>"

  /** Text BLOCKS of an HTML document with per-block boilerplate
    * features — the jusText/trafilatura-style unit: script/style/comment
    * content dropped, then the document split at block-level tag
    * boundaries, each fragment reduced to visible text with its OWN
    * link-text mass. Returns `array<struct<text, n_chars, link_chars>>`
    * (empty blocks dropped). Everything stays one codegen'd expression
    * per row — no explode, no shuffle. */
  def blocks(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val frags = split(noComment, BlockTagRe)
    val cleaned = transform(frags, f => {
      val linked = concat_ws(" ", regexp_extract_all(f,
        lit("(?is)<a\\s[^>]*>(.*?)</a\\s*>"), lit(1)))
      def visible(c: Column): Column = {
        val noTags = regexp_replace(c, "(?s)<[^>]*>", " ")
        val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
          "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
          .foldLeft(noTags) { case (x, (e, ch)) => replace(x, lit(e), lit(ch)) }
        trim(regexp_replace(decoded, "\\s+", " "))
      }
      val text = visible(f)
      struct(text.as("text"),
        length(text).cast("long").as("n_chars"),
        length(visible(linked)).cast("long").as("link_chars"))
    })
    filter(cleaned, b => b.getField("n_chars") > 0)
  }

  /** Main-content extraction: keep the prose blocks, drop the link-soup
    * ones — the block-level counterpart of [[linkDensity]] (jusText's
    * core heuristic: boilerplate lives in short, link-dense blocks).
    * A block survives when it has at least `minChars` visible chars AND
    * its link-text share is at most `maxLinkShare`. Kept blocks join
    * with single spaces. */
  def mainContent(html: Column, minChars: Int = 40,
                  maxLinkShare: Double = 0.4): Column =
    array_join(
      transform(
        filter(blocks(html), b =>
          b.getField("n_chars") >= minChars &&
            b.getField("link_chars").cast("double") /
              b.getField("n_chars").cast("double") <= maxLinkShare),
        b => b.getField("text")),
      " ")

  /** Tracking query parameters dropped by [[canonicalizeUrl]] — the
    * C4/CCNet-style normalization set. */
  val TrackingParams = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Canonical form of an absolute http(s) URL — the key for URL-level
    * dedup (the C4 recipe dedups by canonical URL before text dedup):
    *
    *  - scheme and host lowercased; `www.` and default ports
    *    (`:80` http, `:443` https) dropped;
    *  - fragment dropped;
    *  - tracking params ([[TrackingParams]]) dropped, remaining query
    *    params SORTED (param order is client noise);
    *  - trailing slashes trimmed from the path, empty path → `/`.
    *
    * Non-URLs (no scheme://host) pass through unchanged so the column
    * stays total. Every step is split/filter/sort/join on both engines —
    * exactly oracle-checkable. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val host0 = lower(regexp_extract(url, UrlRe, 2))
    val host1 = regexp_replace(host0, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .otherwise(host1)
    val path0 = regexp_replace(regexp_extract(url, UrlRe, 3), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = array_join(
      array_sort(filter(split(regexp_extract(url, UrlRe, 4), "&"),
        p => p =!= "" && !p.rlike(TrackingParams))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(host0 === "", url).otherwise(canon)
  }
}
