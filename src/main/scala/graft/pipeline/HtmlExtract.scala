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

  /** The reference's meta_map folds property= and name= keys into ONE map
    * (metadata_extractor.rs:113-125, property.or(name)) — every cascade key
    * therefore accepts either attribute. */
  private def metaAny(html: Column, key: String): Column =
    coalesce(metaProperty(html, key), metaName(html, key))

  // ------------------------------------------------------------- JSON-LD
  // The reference parses <script type=...ld+json> blocks with serde and
  // consults them FIRST for @type/dates/author/image
  // (metadata_extractor.rs:60-77,126-133). Here: extract the first JSON-LD
  // block's body and probe it with get_json_object (a native Catalyst
  // expression) — malformed JSON simply yields null, like serde's Err arm.

  /** Raw body of the first JSON-LD script block, or null. */
  def jsonLd(html: Column): Column =
    nullIfEmpty(regexp_extract(html,
      """(?is)<script[^>]*type\s*=\s*["'][^"']*ld\+json[^"']*["'][^>]*>(.*?)</script>""", 1))

  /** get_json_object over the JSON-LD block (null when absent/malformed). */
  def jsonLdField(html: Column, path: String): Column =
    nullIfEmpty(get_json_object(jsonLd(html), path))

  /** A JSON-LD field accepted only when it is a plain STRING value — the
    * reference consumes these fields via as_str(), so an object/array value
    * makes that arm fail and the cascade fall through
    * (metadata_extractor.rs:126-133). get_json_object serializes non-scalar
    * values, so the brace/bracket sniff is the declarative as_str guard. */
  private def jsonLdScalar(html: Column, path: String): Column = {
    val raw = jsonLdField(html, path)
    when(raw.isNotNull && !raw.startsWith("{") && !raw.startsWith("["), raw)
  }

  /** A JSON-LD value that is a name: either `key.name` (Person/Organization
    * object) or `key` itself when it is a plain string — the reference's
    * extract_name_from_value (metadata_extractor.rs:417-427 shape). */
  private def jsonLdName(html: Column, key: String): Column =
    coalesce(
      jsonLdField(html, s"$$.$key.name"),
      jsonLdScalar(html, s"$$.$key"))

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

  /** T15 description cascade (metadata_extractor.rs:157-165 order):
    * og:description -> twitter:description -> meta description; first <p>
    * kept as a last text fallback (the python side's cleaned-text stand-in). */
  def description(html: Column): Column = coalesce(
    metaProperty(html, "og:description"),
    metaName(html, "twitter:description"),
    metaName(html, "description"),
    tagText(html, "p"))

  /** T15 author cascade (metadata_extractor.rs:408-445 order):
    * meta article:author/author -> JSON-LD author(.name) ->
    * JSON-LD publisher(.name) -> byline-ish class text (<=100 chars). */
  def author(html: Column): Column = coalesce(
    metaAny(html, "article:author"),
    metaAny(html, "author"),
    jsonLdName(html, "author"),
    jsonLdName(html, "publisher"),
    nullIfEmpty(when(length(innerText(regexp_extract(html,
      """(?is)<([a-z]+)[^>]*class\s*=\s*["'][^"']*(?:author|byline)[^"']*["'][^>]*>(.*?)</\1>""",
      2))) < 100, innerText(regexp_extract(html,
      """(?is)<([a-z]+)[^>]*class\s*=\s*["'][^"']*(?:author|byline)[^"']*["'][^>]*>(.*?)</\1>""",
      2)))))

  /** T15 published-date cascade (metadata_extractor.rs:357-404 get_dates):
    * meta article:published_time/datePublished/date -> JSON-LD
    * datePublished -> <time datetime>. */
  def publishedDate(html: Column): Column = coalesce(
    metaAny(html, "article:published_time"),
    metaAny(html, "datePublished"),
    metaAny(html, "date"),
    jsonLdScalar(html, "$.datePublished"),
    nullIfEmpty(regexp_extract(html,
      """(?is)<time[^>]*datetime\s*=\s*["']([^"']*)["']""", 1)))

  /** T15 modified-date cascade (metadata_extractor.rs:364-389):
    * meta article:modified_time/dateModified/lastmod -> JSON-LD
    * dateModified. */
  def modifiedDate(html: Column): Column = coalesce(
    metaAny(html, "article:modified_time"),
    metaAny(html, "dateModified"),
    metaAny(html, "lastmod"),
    jsonLdScalar(html, "$.dateModified"))

  /** JSON-LD @type, lowercased — the FIRST arm of the reference's
    * content-type classifier (metadata_extractor.rs:217-230); keyword rules
    * (TextPipeline.contentType) are the fallback. An ARRAY-valued @type
    * (`["NewsArticle","WebPage"]`, common in the wild) fails the
    * reference's as_str() and must fall through, not stringify. */
  def jsonLdType(html: Column): Column =
    lower(jsonLdScalar(html, "$['@type']"))

  /** Primary image (metadata_extractor.rs:276-327): JSON-LD image (string
    * or {url}) -> og:image -> first <img> whose src is not an
    * icon/logo/favicon. Returns struct(src, alt) — alt is "Featured image"
    * for the metadata arms, the img's alt for the DOM arm (empty default).
    * src is UNRESOLVED here; resolve against the page url with
    * TextPipeline.resolveUrl (the reference passes resolve_url in). */
  def primaryImage(html: Column): Column = {
    val jsonImg = coalesce(
      jsonLdField(html, "$.image.url"),
      jsonLdScalar(html, "$.image"))
    val og = metaProperty(html, "og:image")
    val srcPat = """(?is)src\s*=\s*["']([^"']*)["']"""
    val imgTags = regexp_extract_all(html, lit("(?is)<img[^>]*>"), lit(0))
    val good = filter(imgTags, t => {
      val s = regexp_extract(t, srcPat, 1)
      length(s) > 0 && !s.contains("icon") && !s.contains("logo") &&
        !s.contains("favicon")
    })
    val first = element_at(good, 1)
    val firstSrc = regexp_extract(first, srcPat, 1)
    val firstAlt = regexp_extract(first, """(?is)alt\s*=\s*["']([^"']*)["']""", 1)
    when(jsonImg.isNotNull,
        struct(jsonImg.as("src"), lit("Featured image").as("alt")))
      .when(og.isNotNull, struct(og.as("src"), lit("Featured image").as("alt")))
      .when(size(good) > 0, struct(firstSrc.as("src"), firstAlt.as("alt")))
  }

  /** Favicon (metadata_extractor.rs:329-356): first <link> whose rel
    * CONTAINS "icon" (icon / shortcut icon / apple-touch-icon), href value,
    * either attribute order. Unresolved, like [[primaryImage]]. */
  def favicon(html: Column): Column = coalesce(
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*rel\s*=\s*["'][^"']*icon[^"']*["'][^>]*href\s*=\s*["']([^"']*)["']""", 1)),
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["'][^"']*icon[^"']*["']""", 1)))

  /** T15 canonical URL (metadata_extractor.rs:338-356), either attr order. */
  def canonicalUrl(html: Column): Column = coalesce(
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*rel\s*=\s*["']canonical["'][^>]*href\s*=\s*["']([^"']*)["']""", 1)),
    nullIfEmpty(regexp_extract(html,
      """(?is)<link[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']canonical["']""", 1)))

  /** T11 keywords (metadata_extractor.rs:168-213): modern `article:tag`
    * meta properties first; ONLY when none exist, fall back to the legacy
    * comma-split `keywords` meta. Tags shorter than 3 chars dropped, at
    * most 15 kept. The reference collects into a HashSet (unordered); here
    * document order de-duplicated — a deterministic refinement. Lowercased
    * for the keyword ranking field. */
  def metaKeywords(html: Column): Column = {
    val tagPat =
      """(?is)<meta[^>]*property\s*=\s*["']article:tag["'][^>]*content\s*=\s*["']([^"']*)["']"""
    val tagPat2 =
      """(?is)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*property\s*=\s*["']article:tag["']"""
    def clean(arr: Column): Column =
      array_distinct(filter(transform(arr, k => trim(lower(k))),
        k => length(k) >= 3))
    val tags = clean(concat(
      regexp_extract_all(html, lit(tagPat), lit(1)),
      regexp_extract_all(html, lit(tagPat2), lit(1))))
    val legacy = clean(split(coalesce(metaName(html, "keywords"), lit("")), ","))
    slice(when(size(tags) > 0, tags).otherwise(legacy), 1, 15)
  }

  /** T14 heading extraction: h1-h3 inner texts in document order
    * (optimized.rs:143-161), empty headings dropped. */
  def headings(html: Column): Column =
    filter(
      transform(regexp_extract_all(html, lit("(?is)<(h[1-3])[^>]*>(.*?)</\\1>"), lit(2)),
        h => innerText(h)),
      h => length(h) > 0)

  /** F3: drop noise nodes — the reference's FULL skip-tag list
    * (main_content_extractor.rs:49-56: script style noscript nav header
    * footer aside menu menuitem figure figcaption button input select
    * textarea form iframe), comments, and elements whose class/id CONTAINS
    * one of the noise markers (main_content_extractor.rs:58-71 — substring
    * containment like the reference, so e.g. class="header-wrap" is
    * dropped too). Void tags (input) vanish in the later tag strip. */
  def stripNoise(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style|noscript|nav|header|footer|aside|menu|menuitem|" +
        "figure|figcaption|button|select|textarea|form|iframe)[^>]*>.*?</\\1>", " ")
    val noClassNoise = regexp_replace(noBlocks,
      """(?is)<([a-z][a-z0-9]*)[^>]*(?:class|id)\s*=\s*["'][^"']*(?:nav|menu|sidebar|footer|header|ad|popup|banner)[^"']*["'][^>]*>.*?</\1>""",
      " ")
    regexp_replace(noClassNoise, "(?s)<!--.*?-->", " ")
  }

  /** The reference's 16 priority selectors, IN ORDER
    * (main_content_extractor.rs:10-15): tag, class (whitespace-token
    * match, as a CSS .class selector), id (exact, as #id), and
    * [role='main']. */
  private val ContentSelectors: Seq[(String, String)] = Seq(
    "tag" -> "main", "tag" -> "article", "class" -> "content",
    "class" -> "post-content", "class" -> "entry-content",
    "id" -> "content", "class" -> "article-body", "class" -> "post-body",
    "class" -> "article-text", "role" -> "main", "class" -> "main-content",
    "class" -> "page-content", "class" -> "content-wrapper",
    "class" -> "story-content", "class" -> "article-wrapper",
    "class" -> "text-content")

  /** First match's inner content for one selector (regex approximation of
    * query_selector().next(): lazy match to the element's first close
    * tag — see the class-doc nesting caveat). */
  private def selectorInner(clean: Column, kind: String, value: String): Column = {
    val v = java.util.regex.Pattern.quote(value)
    kind match {
      case "tag" =>
        regexp_extract(clean, s"(?is)<$v(?:\\s[^>]*)?>(.*?)</$v>", 1)
      case "class" => // CSS class selector: whitespace-token containment
        regexp_extract(clean,
          s"""(?is)<([a-z][a-z0-9]*)[^>]*class\\s*=\\s*["'](?:[^"']*\\s)?$v(?:\\s[^"']*)?["'][^>]*>(.*?)</\\1>""", 2)
      case "id" => // #id: exact id match
        regexp_extract(clean,
          s"""(?is)<([a-z][a-z0-9]*)[^>]*id\\s*=\\s*["']$v["'][^>]*>(.*?)</\\1>""", 2)
      case "role" =>
        regexp_extract(clean,
          s"""(?is)<([a-z][a-z0-9]*)[^>]*role\\s*=\\s*["']$v["'][^>]*>(.*?)</\\1>""", 2)
    }
  }

  /** F4 main-content extraction (main_content_extractor.rs:8-41): try all
    * 16 priority selectors IN ORDER and APPEND every first-match whose
    * clean text exceeds 50 chars (the reference accumulates across
    * selectors — a page with both <main> and <article> contributes both);
    * fall back to <body> when nothing qualified, then to the whole
    * document. F3 noise strip + tag strip throughout. Returns plain
    * text. */
  def mainText(html: Column): Column = {
    val clean = stripNoise(html)
    val arms = ContentSelectors.map { case (kind, v) =>
      val t = innerText(selectorInner(clean, kind, v))
      when(length(t) > 50, t).otherwise(lit(""))
    }
    val appended = nullIfEmpty(concat_ws(" ", arms: _*))
    val body = regexp_extract(clean, "(?is)<body[^>]*>(.*?)</body>", 1)
    innerText(coalesce(appended, nullIfEmpty(body), clean))
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
