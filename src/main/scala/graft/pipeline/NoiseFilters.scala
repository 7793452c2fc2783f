package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F7 web-noise rejection + F8 line-level quality predicates as pure
  * Catalyst column expressions — reference-exact restatements of
  *
  *  - `contains_web_noise` (data_pipeline/rust_core_processor/src/
  *    extractor/optimized.rs:196-301): entity remnants, CSS patterns,
  *    MediaWiki noise, JSON remnants, interface-noise density > 20%,
  *    CSS char density, bracket counts, uppercase-window density,
  *    nav-link density > 30%;
  *  - `is_navigation_line` / `is_low_quality_line` (cleaner.rs:203-306):
  *    nav/interface pattern hits, numeric/id-char majority, uppercase-count
  *    cap, punctuation ratio > 0.6, >10-repeat character runs. The
  *    reference marks this legacy path unused in the main pipeline
  *    (SURVEY F8) — implemented for parity, wired nowhere by default.
  *
  * Faithfulness notes: substring lists and thresholds are copied verbatim,
  * including the reference's own quirks — `is_low_quality_line` checks
  * mixed-case entries like "vtePart of" against a LOWERCASED line, so
  * those arms can never fire (kept literally, like the rust). Unicode
  * deltas: rust `is_uppercase()`/`is_alphabetic()` are full Unicode; here
  * the uppercase-window run class is `[^\p{Ll}]` (counts Lo/Lt/Lm letters
  * as window-eligible where rust would not) and rust `len()` is BYTES
  * where `length()` here is CHARS — both distinctions are invisible on
  * ASCII text and documented rather than simulated.
  */
object NoiseFilters {

  // lists are private[graft] so the oracle-SQL generator (SparkEntry)
  // derives both sides from ONE source of truth
  private[graft] val Entities = Seq(
    "\\u003c", "\\u003e", "\\u0026", "&nbsp;", "&amp;", "&lt;", "&gt;")

  private[graft] val CssPatterns = Seq(
    ".mw-parser-output", "navbox", "display:inline", "margin:0", "padding:0",
    "font-weight:bold", "background-color:", "border:", "content:", "::after",
    "::before", ".hlist", "box-sizing:", "line-height:", "text-align:",
    "white-space:", "border-color:", "border-left:", "border-top:", "float:",
    "max-width:", "@media", "counter-reset:", "counter-increment:")

  private[graft] val MediaWiki = Seq(
    "vtePart of", "vteReligions", "Retrieved from", "Hidden categories:",
    "Articles with", "Pages with", "Webarchive template", "Commons category")

  private[graft] val JsonRemnants = Seq(
    "\"type\":", "\"href\":", "\"title\":", "\"class\":", "\"id\":",
    "\"style\":")

  /** optimized.rs:238-247 interface_noise, verbatim order. */
  private[graft] val InterfaceNoise = Seq(
    "diffhist", "talk contribs", "mobile edit", "visual edit", "android app",
    "ios app", "hidden tag", "wikiedu", "dashboard", "assignment wizard",
    "wikiloop", "battlefield", "user creation", "account", "antivandal",
    "rollback", "manual revert", "tag filter", "namespace", "template",
    "category", "portal", "module", "invert selection", "recent changes",
    "options", "hide", "show", "edit filter", "cleanup", "vandalism",
    "deletion", "backlogs", "village pump", "mailing lists", "signpost")

  private[graft] val LinkIndicators = Seq(
    "click here", "read more", "learn more", "view all", "home page",
    "contact us", "about us", "privacy policy")

  private def containsAny(c: Column, pats: Seq[String]): Column =
    pats.map(p => c.contains(p)).reduce(_ || _)

  /** Non-overlapping occurrence count of literal `p` (rust
    * `str::matches(p).count()` = replace-delta / pattern length). Literal
    * `replace`, not a regex pass — webNoise runs 44 of these per chunk on
    * the toChunks ingest admission path. */
  private def occurrences(c: Column, p: String): Column =
    ((length(c) - length(call_function("replace", c, lit(p), lit("")))) /
      p.length).cast("long")

  private def charCount(c: Column, chars: String): Column =
    length(c) - length(translate(c, chars, ""))

  /** F7: `contains_web_noise(text)` — true when the text is web/interface
    * noise. All nine arms of optimized.rs:196-301, in order. */
  def webNoise(text: Column): Column = {
    val lowerT = lower(text)
    val wc = size(split(trim(text), "\\s+")).cast("long")
    val noiseCount = InterfaceNoise.map(p => occurrences(lowerT, p))
      .reduce(_ + _)
    val cssChars = charCount(text, ":;")
    val brackets = charCount(text, "[]")
    // windows(3) of chars that are uppercase-or-non-alphabetic == runs of
    // non-lowercase-letter chars; a run of length L contributes L-2 windows
    val upWindows = coalesce(aggregate(
      transform(regexp_extract_all(text, lit("[^\\p{Ll}]+"), lit(0)),
        r => greatest(length(r) - 2, lit(0)).cast("long")),
      lit(0L), (a, b) => a + b), lit(0L))
    val navWords = LinkIndicators
      .map(p => occurrences(lowerT, p) * p.split(" ").length)
      .reduce(_ + _)
    containsAny(text, Entities) ||
      containsAny(text, CssPatterns) ||
      containsAny(text, MediaWiki) ||
      containsAny(text, JsonRemnants) ||
      (wc > 0 && noiseCount.cast("double") / wc > 0.2) ||
      (cssChars > 20 && length(text) > 500 &&
        cssChars.cast("double") / length(text) > 0.01) ||
      (brackets > 10) ||
      (upWindows > floor(wc.cast("double") / 4.0).cast("long")) ||
      (containsAny(lowerT, LinkIndicators) && wc > 0 &&
        navWords.cast("double") / wc > 0.3)
  }

  /** F8: `is_navigation_line(line)` (cleaner.rs:203-224). */
  def isNavigationLine(line: Column): Column = {
    val lowerL = lower(line)
    val navPatterns = Seq(
      "menu", "navigation", "nav", "breadcrumb", "skip to", "jump to",
      "home page", "main menu", "site map", "sitemap", "recent changes",
      "options", "filter", "hide", "show", "edit", "talk", "contribs",
      "diff", "hist", "tags:", "mobile edit", "visual edit", "app",
      "dashboard", "wizard", "tools", "list of", "invert selection")
    val interfacePatterns = Seq(
      "diffhist", "+", "−", "15:43", "[1.", "talk contribs",
      "(hidden tag)", "android app", "ios app", "mobile web")
    containsAny(lowerL, navPatterns) || containsAny(lowerL, interfacePatterns)
  }

  /** F8: `is_low_quality_line(line)` (cleaner.rs:226-306). */
  def isLowQualityLine(line: Column): Column = {
    val lowerL = lower(line)
    val cssPatterns = Seq(
      ".mw-parser-output", "navbox", "display:", "margin:", "padding:",
      "font-weight:", "background-color:", "border:", "content:", "::after",
      "::before", ".hlist", "box-sizing:", "line-height:", "text-align:",
      "white-space:", "@media", "counter-reset:")
    // checked against the LOWERCASED line, so the mixed-case entries can
    // never fire — the reference's own bug, kept literally
    val interfaceNoise = Seq(
      "wikiedu", "wikiloop", "dashboard", "assignment wizard", "battlefield",
      "user creation", "account", "tag filter", "namespace",
      "protection template", "edit summary", "citation bot",
      "content translation", "typos in one click", "diffhist",
      "talk contribs", "mobile edit", "visual edit", "android app",
      "ios app", "hidden tag", "antivandal", "rollback", "manual revert",
      "vtePart of", "vteReligions", "Retrieved from", "Hidden categories:",
      "Articles with", "Pages with", "Webarchive template",
      "Commons category")
    val qualityIssues = Seq(
      "loading...", "please wait", "javascript", "enable javascript",
      "cookies", "privacy policy", "terms of service", "copyright",
      "all rights reserved")
    val idChars =
      ((length(line) - length(regexp_replace(line, lit("\\p{N}"), lit("")))) +
        charCount(line, "[]().")).cast("long")
    val upperCount =
      length(line) - length(regexp_replace(line, lit("\\p{Lu}"), lit("")))
    val punct =
      length(regexp_replace(line, lit("[\\p{L}\\p{N}\\s]"), lit("")))
    containsAny(line, cssPatterns) ||
      containsAny(lowerL, interfaceNoise) ||
      (idChars > floor(length(line).cast("double") / 2.0).cast("long")) ||
      (upperCount > 8 && length(line) < 150) ||
      containsAny(lowerL, qualityIssues) ||
      (length(line) > 0 &&
        punct.cast("double") / length(line) > 0.6) ||
      line.rlike("(.)\\1{10}")
  }
}
