package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Static document scoring (SURVEY §2.4): the reference's scorer stack
  * (rust_core_processor/src/scorer.rs) as column expressions. */
object Scoring {

  /** Q1 domain_score (scorer.rs:10-42,89-108; table also at
    * data_pipeline/config.py:46-81): exact-domain map, else TLD-suffix map,
    * else 0.3. Implemented as a literal map + suffix fallback. */
  val DomainScores: Map[String, Double] = Map(
    "wikipedia.org" -> 0.9, "github.com" -> 0.85, "stackoverflow.com" -> 0.85,
    "arxiv.org" -> 0.85, "mozilla.org" -> 0.8, "python.org" -> 0.85,
    "medium.com" -> 0.6, "reddit.com" -> 0.55)
  val TldScores: Map[String, Double] = Map(
    ".edu" -> 0.8, ".gov" -> 0.85, ".org" -> 0.6, ".io" -> 0.55,
    ".com" -> 0.5, ".net" -> 0.45, ".info" -> 0.4, ".biz" -> 0.35)

  def domainScore(domain: Column): Column = {
    val exact = DomainScores.foldLeft(lit(null).cast("double")) {
      case (acc, (d, s)) => when(domain === d, s).otherwise(acc)
    }
    val tld = TldScores.foldLeft(lit(0.3)) { case (acc, (t, s)) =>
      when(domain.endsWith(t), s).otherwise(acc)
    }
    coalesce(exact, tld)
  }

  /** Q3 length score (scorer.rs:138-147). */
  def lengthScore(wordCount: Column): Column =
    when(wordCount < 30, 0.05).when(wordCount < 100, 0.3)
      .when(wordCount < 300, 0.7).when(wordCount < 1000, 1.5)
      .when(wordCount < 3000, 1.0).otherwise(1.2)

  /** Q4 structure score (scorer.rs:149-158): code fences and headings. */
  def structureScore(text: Column, headingCount: Column): Column = {
    val code = when(text.contains("```"), 1.2).otherwise(1.0)
    val head = when(headingCount >= 3, 1.15)
      .when(headingCount >= 1, 1.05).otherwise(1.0)
    code * head
  }

  /** Q5 content-type score (scorer.rs:160-184, reduced tiers). */
  def contentTypeScore(text: Column): Column = {
    val t = lower(text)
    val edu = when(t.rlike("\\btutorial|how to|guide\\b"), 1.4)
      .when(t.rlike("\\bdocumentation|reference|api\\b"), 1.25)
      .when(t.rlike("\\bexample|sample\\b"), 1.1).otherwise(1.0)
    val neg = when(t.rlike("\\bclick here|buy now|subscribe\\b"), 0.85).otherwise(1.0)
    greatest(edu * neg, lit(0.1))
  }

  /** Q6 language quality (scorer.rs:186-203): capitalization band and
    * lexical diversity. */
  def languageQuality(text: Column): Column = {
    val letters = greatest(length(regexp_replace(text, "[^a-zA-Z]", "")), lit(1))
    val caps = length(regexp_replace(text, "[^A-Z]", ""))
    val capRatio = caps.cast("double") / letters
    val toks = graft.core.Analyzer.tokensCol(text)
    val diversity = size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1))
    val capScore = when(capRatio.between(0.01, 0.2), 1.1)
      .when(capRatio > 0.4, 0.8).otherwise(1.0)
    capScore * when(diversity > 0.4, 1.1).otherwise(1.0)
  }

  /** Q7 metadata score (scorer.rs:205-215). */
  def metadataScore(title: Column, description: Column,
      hasAuthor: Column, hasDate: Column): Column = {
    val t = when(length(title).between(10, 120), 1.1).otherwise(1.0)
    val guide = when(lower(title).rlike("how|guide|tutorial|api"), 1.05).otherwise(1.0)
    val d = when(length(description) > 50, 1.05).otherwise(1.0)
    val a = when(hasAuthor, 1.02).otherwise(1.0)
    val dt = when(hasDate, 1.02).otherwise(1.0)
    t * guide * d * a * dt
  }

  /** Q8/Q9 technical signal (scorer.rs:217-242, optimized.rs:22-68 reduced):
    * code-marker density; > threshold => technical. */
  def technicalScore(text: Column): Column = {
    val markers = Seq("def ", "class ", "import ", "return", "function",
      "const ", "var ", "public ", "static ", "```")
    val hits = markers.map(m =>
      (length(text) - length(regexp_replace(text,
        java.util.regex.Pattern.quote(m), ""))) / m.length)
      .reduce(_ + _)
    round(least(hits.cast("double") * 1000.0 / greatest(length(text), lit(1)),
      lit(2.5)), 6)
  }

  def isTechnical(text: Column): Column = technicalScore(text) > 0.3

  /** Q2 content_quality_score (scorer.rs:110-136): weighted composite of
    * the factor scores. */
  def contentQualityScore(text: Column, title: Column, description: Column,
      wordCount: Column, headingCount: Column,
      hasAuthor: Column, hasDate: Column): Column =
    round(
      lengthScore(wordCount) * 0.2 +
        structureScore(text, headingCount) * 0.2 +
        contentTypeScore(text) * 0.15 +
        languageQuality(text) * 0.1 +
        metadataScore(title, description, hasAuthor, hasDate) * 0.1 +
        least(technicalScore(text) + 1.0, lit(2.5)) * 0.1 +
        lit(1.0) * 0.1 + // authoritativeness placeholder (citation regexes)
        lit(1.0) * 0.05, 6)

  /** Q11 DomainRanker boost (common/domain_ranker.py:18-200): tiered domain
    * boost x content-type boost, capped at 3.0 — the query-time multiplier. */
  val Tier1: Map[String, Double] = Map("wikipedia.org" -> 2.0,
    "github.com" -> 1.8, "stackoverflow.com" -> 1.8, "arxiv.org" -> 1.7)
  val Tier2: Map[String, Double] = Map("medium.com" -> 1.3, "dev.to" -> 1.3)

  def domainBoost(domain: Column, contentType: Column): Column = {
    val base = (Tier1 ++ Tier2).foldLeft(
      when(domain.endsWith(".edu"), 1.6).otherwise(1.0)) {
      case (acc, (d, b)) => when(domain === d, b).otherwise(acc)
    }
    val ct = when(contentType === "definition", 1.5)
      .when(contentType === "tutorial", 1.4)
      .when(contentType === "reference", 1.3)
      .when(contentType === "example", 1.2).otherwise(1.0)
    least(base * ct, lit(3.0))
  }
}
