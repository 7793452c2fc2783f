package graft.ops

import graft.core.Analyzer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions / small broadcast joins — codegen'd, SQL-oracled.
  * Quality factors mirror the reference's scorer shapes
  * (rust_core_processor/src/scorer.rs:110-215, run_quality_analysis.py:139-179).
  */
object TextAnalysis {

  /** Marker-word lists per language (n-gram/stopword heuristic — the
    * mechanism of the reference's language_detector.rs:30-232, reduced to
    * deterministic word lists so it is SQL-portable). */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "is", "en" -> "to",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "ist", "de" -> "das",
    "es" -> "el", "es" -> "la", "es" -> "que", "es" -> "de", "es" -> "los",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "est", "fr" -> "des")

  /** Language ID: score(lang) = matching-token count / total tokens;
    * predicted = argmax, ties by lang asc; confidence = best score.
    * Returns (id, predicted_lang, confidence). */
  def langId(spark: SparkSession, df: DataFrame, id: String, text: String): DataFrame = {
    import spark.implicits._
    val markers = LangMarkers.toDF("cand_lang", "marker")
    val toks = df.select(col(id), Analyzer.tokensCol(col(text)).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .select(col(id), col("n_toks"), explode(col("toks")).as("term"))
    val scored = toks.join(broadcast(markers), col("term") === col("marker"), "inner")
      .groupBy(col(id), col("n_toks"), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
      .withColumn("score", col("hits").cast("double") / col("n_toks"))
    // argmax with deterministic tiebreak (score desc, lang asc); docs with
    // zero marker hits are "undetermined" and omitted (documented semantics)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("score").desc, col("cand_lang").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(id), col("cand_lang").as("predicted_lang"),
        round(col("score"), 6).as("confidence"))
  }

  // ------------------------------------------------- F1 reference ladder
  // The reference's FastLanguageDetector (language_detector.rs:30-232):
  // URL arm first (only an "en" verdict short-circuits), then the html
  // lang= attribute, then confidence-thresholded content detection. The
  // whatlang trigram model is replaced by a deterministic two-stage
  // heuristic — script-ratio arms for ru/ja/ko/zh, marker-word scoring for
  // the Latin six — with the reference's confidence > 0.7 acceptance
  // threshold. All pure column expressions (SQL-oracled, gate q65).

  /** language_detector.rs:7-16 ENGLISH_DOMAINS (TLD arm). */
  val EnglishTlds: Seq[String] = Seq("com", "org", "net", "edu", "gov",
    "mil", "int", "us", "uk", "ca", "au", "nz", "ie", "za", "www", "en",
    "english")

  /** language_detector.rs:18-27 ENGLISH_DOMAIN_NAMES (contains arm). */
  val EnglishDomainNames: Seq[String] = Seq("google", "facebook", "twitter",
    "youtube", "reddit", "stackoverflow", "github", "microsoft", "apple",
    "amazon", "wikipedia", "linkedin", "instagram", "netflix", "spotify",
    "dropbox", "slack", "zoom", "techcrunch", "engadget", "theverge",
    "wired", "ars-technica", "hacker-news", "medium", "substack",
    "wordpress", "blogspot")

  private val NonEnglishSubdomains = Seq("es.", "de.", "fr.", "it.", "pt.",
    "ru.", "zh.", "ja.", "ko.", "ar.", "hi.", "nl.", "pl.", "sv.", "da.",
    "no.", "fi.")
  private val NonEnglishPaths = Seq("/de/", "/es/", "/fr/", "/it/", "/pt/",
    "/ru/", "/zh/", "/ja/", "/ko/", "/deutsch/", "/espanol/", "/francais/",
    "/italiano/", "/portuguese/")

  /** URL arm (language_detector.rs:73-130): "en", "non-en", or null —
    * exactly the reference's decision ladder and order. */
  def urlLanguage(url: Column): Column = {
    val domain = lower(regexp_extract(coalesce(url, lit("")),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    val path = lower(regexp_extract(coalesce(url, lit("")),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)", 1))
    val tld = element_at(split(domain, "\\."), -1)
    when(domain === "", lit(null).cast("string"))
      .when(domain.startsWith("en.") || domain.startsWith("english."), "en")
      .when(NonEnglishSubdomains.map(domain.startsWith(_): Column)
        .reduce(_ || _), "non-en")
      .when(EnglishDomainNames.map(domain.contains(_): Column)
        .reduce(_ || _), "en")
      .when(path.contains("/en/") || path.contains("/english/"), "en")
      .when(NonEnglishPaths.map(path.contains(_): Column).reduce(_ || _), "non-en")
      .when(tld.isin(EnglishTlds: _*), "en")
      .otherwise(lit(null).cast("string"))
  }

  /** html lang= attribute arm (language_detector.rs:134-156): value of the
    * FIRST `lang=` occurrence (quoted either way or bare), first two chars
    * lowercased; null when absent or shorter than 2 chars. */
  def htmlLangAttr(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val dq = regexp_extract(t, "(?s)lang=\"([^\"]*)", 1)
    val sq = regexp_extract(t, "(?s)lang='([^']*)", 1)
    val bare = regexp_extract(t, "(?s)lang=([^\\s>\"']+)", 1)
    // reproduce "the FIRST lang= decides the quoting style": pick the
    // variant whose match position is earliest
    val pdq = when(dq =!= "", instr(t, "lang=\"")).otherwise(lit(Int.MaxValue))
    val psq = when(sq =!= "", instr(t, "lang='")).otherwise(lit(Int.MaxValue))
    val pbare = locate("lang=", t)
    val v = when(pdq <= psq && pdq <= pbare, dq)
      .when(psq <= pbare, sq)
      .otherwise(bare)
    when(length(v) >= 2, lower(substring(v, 1, 2)))
  }

  /** Marker sets for the Latin-script six (the whatlang stand-in). */
  val LatinMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "is", "of", "to", "that", "it", "with"),
    "es" -> Seq("el", "que", "los", "las", "una", "por", "como", "pero"),
    "fr" -> Seq("le", "les", "est", "dans", "pour", "qui", "pas", "vous"),
    "it" -> Seq("che", "di", "il", "sono", "con", "della", "anche", "questo"),
    "pt" -> Seq("uma", "para", "com", "mais", "isso", "não", "os", "são"))

  /** Content arm (language_detector.rs:158-216): clean (strip tags, drop
    * http(s) words, first 1000 chars), then script-ratio arms for
    * ko/ja/zh/ru and marker scoring for the Latin six; accept only when
    * confidence (top hits / total marker hits) exceeds the reference's 0.7
    * threshold, else null. */
  def contentLanguage(text: Column): Column = {
    val noTags = regexp_replace(coalesce(text, lit("")), "(?s)<[^>]*>", " ")
    val words = filter(split(noTags, "\\s+"), w =>
      length(w) > 0 && !w.startsWith("http://") && !w.startsWith("https://"))
    val s = substring(array_join(words, " "), 1, 1000)
    def charCount(re: String): Column =
      length(s) - length(regexp_replace(s, re, ""))
    val nonSpace = charCount("[^ ]")
    val hangul = charCount("[\\uAC00-\\uD7AF]")
    val kana = charCount("[\\u3040-\\u30FF]")
    val han = charCount("[\\u4E00-\\u9FFF]")
    val cyr = charCount("[\\u0400-\\u04FF]")
    // marker scoring: per-occurrence hit counts, earliest-max by lang asc
    val toks = filter(split(lower(s), "[^\\p{L}]+"), t => length(t) > 0)
    val hits = LatinMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isin(ms: _*)))
    }
    val total = hits.map(_._2).reduce(_ + _)
    val pairs = array(hits.map { case (l, h) =>
      struct(h.as("h"), lit(l).as("lang")) }: _*)
    val best = aggregate(pairs, struct(lit(-1).as("h"), lit("").as("lang")),
      (a, x) => when(x("h") > a("h"), x).otherwise(a))
    val conf = best("h").cast("double") / total
    when(nonSpace === 0, lit(null).cast("string"))
      .when(hangul.cast("double") / nonSpace > 0.3, "ko")
      .when(kana.cast("double") / nonSpace > 0.3, "ja")
      .when((han + kana).cast("double") / nonSpace > 0.3, "zh")
      .when(cyr.cast("double") / nonSpace > 0.3, "ru")
      .when(total > 0 && conf > 0.7, best("lang"))
      .otherwise(lit(null).cast("string"))
  }

  /** F1 detect_language (language_detector.rs:33-55): empty text -> null;
    * a URL "en" verdict short-circuits (a "non-en" one does NOT — the
    * reference discards it and falls through); then the html lang=
    * attribute verbatim; then the content arm. */
  def detectLanguage(text: Column, url: Column): Column =
    when(length(trim(coalesce(text, lit("")))) === 0, lit(null).cast("string"))
      .when(urlLanguage(url) === "en", "en")
      .otherwise(coalesce(htmlLangAttr(text), contentLanguage(text)))

  /** F1 is_english (language_detector.rs:58-70): empty text falls back to
    * the URL arm alone. */
  def isEnglish(text: Column, url: Column): Column =
    when(length(trim(coalesce(text, lit("")))) === 0,
      coalesce(urlLanguage(url) === "en", lit(false)))
      .otherwise(coalesce(detectLanguage(text, url) === "en", lit(false)))

  /** Quality scoring: length/stopword/uniqueness factors -> 0..100 score
    * (the reference's fast QA score shape, run_quality_analysis.py:139-179).
    * Returns (id, word_count, uniq_ratio, stop_ratio, quality). */
  def qualityScore(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = Analyzer.tokensCol(col(text))
    val wc = size(toks)
    val uniq = size(array_distinct(toks)).cast("double") / wc
    val stopSet = Seq("the", "a", "and", "of", "to", "in", "is")
    val stopRatio = size(filter(toks, t => t.isin(stopSet.map(x => x: Any): _*)))
      .cast("double") / wc
    val lengthPts = when(wc >= 300, 40.0).when(wc >= 100, 30.0)
      .when(wc >= 30, 20.0).otherwise(5.0)
    val uniqPts = when(uniq >= 0.6, 30.0).when(uniq >= 0.4, 20.0).otherwise(10.0)
    val stopPts = when(stopRatio.between(0.1, 0.5), 30.0)
      .when(stopRatio < 0.1, 15.0).otherwise(10.0)
    df.select(col(id), wc.as("word_count"), round(uniq, 6).as("uniq_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      round(lengthPts + uniqPts + stopPts, 1).as("quality"))
  }

  /** Token counting three ways: whitespace split, analyzer regex, and a
    * BPE-ish estimate (ceil(chars/4) — the common 4-chars-per-token rule).
    * Returns (id, ws_tokens, re_tokens, bpe_est). */
  def tokenCounts(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
      size(split(trim(col(text)), "\\s+")).as("ws_tokens"),
      size(Analyzer.tokensCol(col(text))).as("re_tokens"),
      ceil(length(col(text)).cast("double") / 4.0).cast("long").as("bpe_est"))

  /** Document fingerprint: position-weighted polynomial over token hashes,
    * mod P — a rolling-hash-style content fingerprint that is stable,
    * order-sensitive, and SQL-portable. Returns (id, fingerprint). */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id),
      posexplode(Analyzer.tokensCol(col(text))).as(Seq("pos", "term")))
    toks
      .withColumn("hv", Hashing.hp(col("term")))
      .withColumn("w", pmod(col("pos") + 1, lit(997L)))
      .groupBy(col(id))
      .agg(pmod(sum(pmod(col("hv") * col("w"), lit(Hashing.P))), lit(Hashing.P))
        .as("fingerprint"))
  }
}
