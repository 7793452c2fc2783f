package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML metadata + main-content extraction (SURVEY §2.2-2.3: T11, T14, T15,
  * F3, F4) as pure Catalyst regexp expressions — the declarative form of
  * the reference's scraper-based cascades:
  *
  *  - T15 title/description/author/date/canonical priority cascades
  *    (rust_core_processor/src/metadata_extractor.rs:147-459)
  *  - T11 meta-keyword extraction (metadata_extractor.rs:168-213)
  *  - T14 heading extraction h1-h3 (rust_core_processor/src/optimized.rs:143-161)
  *  - F3 DOM noise-node filter + F4 main-content selector cascade
  *    (main_content_extractor.rs:8-97)
  *
  * The reference walks a parsed DOM; these are regex approximations with
  * the same priority order, chosen so every step stays inside whole-stage
  * codegen (no UDF, no external HTML parser in the hot ingest path). The
  * known divergence — pathological nesting (e.g. a <div> inside the first
  * matched content <div>) truncates at the first close tag — is acceptable
  * for the extractor's role as a RANKING-SIGNAL source (title/headings/
  * keywords fields), and the body fallback still indexes full text.
  */
object HtmlExtract {

  private def nullIfEmpty(c: Column): Column =
    when(length(trim(c)) > 0, trim(c))

  /** meta content by name= or property= key, tolerating either attribute
    * order (content before or after the key). */
  private def metaBy(html: Column, attr: String, key: String): Column = {
    val k = java.util.regex.Pattern.quote(key)
    val a = regexp_extract(html,
      s"""(?is)<meta[^>]*$attr\\s*=\\s*["']$k["'][^>]*content\\s*=\\s*["']([^"']*)["']""", 1)
    val b = regexp_extract(html,
      s"""(?is)<meta[^>]*content\\s*=\\s*["']([^"']*)["'][^>]*$attr\\s*=\\s*["']$k["']""", 1)
    coalesce(nullIfEmpty(a), nullIfEmpty(b))
  }

  def metaName(html: Column, key: String): Column = metaBy(html, "name", key)
  def metaProperty(html: Column, key: String): Column = metaBy(html, "property", key)

  /** Tag-stripped, entity-stripped, whitespace-collapsed inner text. */
  def innerText(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(c,
      "(?is)<[^>]+>", " "), "&[a-zA-Z#0-9]+;", " "), "\\s+", " "))

  private def tagText(html: Column, tag: String): Column =
    nullIfEmpty(innerText(regexp_extract(html, s"(?is)<$tag[^>]*>(.*?)</$tag>", 1)))

  /** T15 title cascade (metadata_extractor.rs:147-166 order):
    * og:title -> twitter:title -> <title> -> first <h1>. */
  def title(html: Column): Column = coalesce(
    metaProperty(html, "og:title"),
    metaName(html, "twitter:title"),
    tagText(html, "title"),
    tagText(html, "h1"))

  /** T15 description cascade: meta description -> og:description ->
    * first <p> (metadata_extractor.rs:237-265 order). */
  def description(html: Column): Column = coalesce(
    metaName(html, "description"),
    metaProperty(html, "og:description"),
    tagText(html, "p"))

  /** T15 author cascade (metadata_extractor.rs:268-297). */
  def author(html: Column): Column = coalesce(
    metaName(html, "author"),
    metaProperty(html, "article:author"))

  /** T15 published-date cascade (metadata_extractor.rs:300-335):
    * article:published_time -> meta date/publish-date -> <time datetime>. */
  def publishedDate(html: Column): Column = coalesce(
    metaProperty(html, "article:published_time"),
    metaName(html, "date"),
    metaName(html, "publish-date"),
    nullIfEmpty(regexp_extract(html,
      """(?is)<time[^>]*datetime\s*=\s*["']([^"']*)["']""", 1)))

  /** T15 canonical URL (metadata_extractor.rs:338-356), either attr order. */
  def canonicalUrl(html: Column): Column = coalesce(
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']""", 1)),
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']canonical["']""", 1)))

  /** T11 meta keywords -> lowercased, trimmed, de-duplicated array
    * (metadata_extractor.rs:168-213 splits on commas). */
  def metaKeywords(html: Column): Column =
    array_distinct(filter(
      transform(split(coalesce(metaName(html, "keywords"), lit("")), ","),
        k => trim(lower(k))),
      k => length(k) > 0))

  /** T14 heading extraction: h1-h3 inner texts in document order
    * (optimized.rs:143-161), empty headings dropped. */
  def headings(html: Column): Column =
    filter(
      transform(regexp_extract_all(html, lit("(?is)<(h[1-3])[^>]*>(.*?)</\\1>"), lit(2)),
        h => innerText(h)),
      h => length(h) > 0)

  /** F3: drop noise nodes (script/style/nav/header/footer/aside/form/
    * iframe/noscript + comments) — main_content_extractor.rs:43-97's
    * unwanted-selector list. */
  def stripNoise(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style|noscript|nav|header|footer|aside|form|iframe)[^>]*>.*?</\\1>", " ")
    regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
  }

  /** F4 main-content selector cascade (main_content_extractor.rs:8-41
    * priority order): <main> -> <article> -> role=main -> id/class
    * containing "content" -> <body> -> whole document; then F3 noise strip
    * and tag strip. Returns plain text. */
  def mainText(html: Column): Column = {
    val clean = stripNoise(html)
    val main = regexp_extract(clean, "(?is)<main[^>]*>(.*?)</main>", 1)
    val article = regexp_extract(clean, "(?is)<article[^>]*>(.*?)</article>", 1)
    val roleMain = regexp_extract(clean,
      """(?is)<([a-z]+)[^>]*role\s*=\s*["']main["'][^>]*>(.*?)</\1>""", 2)
    val contentDiv = regexp_extract(clean,
      """(?is)<div[^>]*(?:id|class)\s*=\s*["'][^"']*content[^"']*["'][^>]*>(.*?)</div>""", 1)
    val body = regexp_extract(clean, "(?is)<body[^>]*>(.*?)</body>", 1)
    innerText(coalesce(
      nullIfEmpty(main), nullIfEmpty(article), nullIfEmpty(roleMain),
      nullIfEmpty(contentDiv), nullIfEmpty(body), clean))
  }

  /** Cheap HTML sniff — gates the extraction cascade so plain-text corpora
    * skip the regex battery entirely. Deliberately requires a DOCUMENT-
    * level marker (doctype/html/head/body): plain text that merely QUOTES a
    * tag like `<div class="content">…</div>` must not trip the cascade (the
    * contentDiv arm would collapse the whole doc to that div's inner text);
    * tag fragments without a document shell take the F2 tag-strip path,
    * which still indexes the full text. */
  def looksLikeHtml(c: Column): Column =
    c.rlike("(?is)<\\s*(!doctype|html|head|body)\\b")
}
