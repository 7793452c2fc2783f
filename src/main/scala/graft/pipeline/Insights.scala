package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Result-set aggregations (SURVEY §2.6): the reference's search-insights
  * and content-analysis passes (enhanced_search_service.py:144-281,
  * ai_runner/services/content_analysis.py) as Spark aggregations. They run
  * over a result DataFrame (any size — these are ordinary distributed aggs,
  * not driver loops like the reference). */
object Insights {

  /** A1 search insights (enhanced_search_service.py:144-188,263-281):
    * counts, distinct domains, avg quality (2dp), diversity score. One-row
    * DataFrame. */
  def searchInsights(results: DataFrame, domain: String, quality: String,
      contentType: String): DataFrame =
    results.agg(
      count(lit(1)).as("total_results"),
      countDistinct(col(domain)).as("unique_domains"),
      countDistinct(col(contentType)).as("unique_types"),
      round(avg(col(quality)), 2).as("avg_quality"),
      round(least(
        (countDistinct(col(domain)) + countDistinct(col(contentType))).cast("double")
          / greatest(count(lit(1)), lit(1)), lit(1.0)), 6).as("diversity"))

  /** A1 top-5 domains (Counter.most_common(5)). */
  def topDomains(results: DataFrame, domain: String, k: Int = 5): DataFrame =
    results.groupBy(col(domain)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(domain).asc).limit(k)

  /** A2 date-range aggregation (enhanced_search_service.py:203-236). */
  def dateRange(results: DataFrame, dateCol: String): DataFrame =
    results.agg(
      date_format(min(col(dateCol)), "yyyy-MM-dd").as("earliest"),
      date_format(max(col(dateCol)), "yyyy-MM-dd").as("latest"),
      datediff(max(col(dateCol)), min(col(dateCol))).cast("long").as("span_days"),
      count(col(dateCol)).as("dated_results"))

  /** A3 quality distribution buckets (content_analysis.py:399-420). */
  def qualityDistribution(results: DataFrame, quality: String): DataFrame =
    results.agg(
      sum(when(col(quality) >= 0.8, 1).otherwise(0)).as("high"),
      sum(when(col(quality) >= 0.5 && col(quality) < 0.8, 1).otherwise(0)).as("medium"),
      sum(when(col(quality) < 0.5, 1).otherwise(0)).as("low"),
      round(avg(col(quality)), 6).as("avg_q"),
      round(max(col(quality)), 6).as("max_q"),
      round(min(col(quality)), 6).as("min_q"))

  /** A4 topic clusters (content_analysis.py:513-535): word freq (len>=4)
    * across results, count>=2, top-5, relevance = count/n. */
  def topicClusters(results: DataFrame, text: String, k: Int = 5): DataFrame = {
    val n = results.count()
    results
      .select(explode(graft.core.Analyzer.tokensCol(col(text))).as("w"))
      .filter(length(col("w")) >= 4)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .orderBy(col("cnt").desc, col("w").asc).limit(k)
      .withColumn("relevance", round(col("cnt").cast("double") / n, 6))
  }

  /** A5 freshness buckets (content_analysis.py:477-511): max 4-digit year in
    * the text -> very_recent/recent/older/outdated (anchor year fixed). */
  def freshness(results: DataFrame, id: String, text: String,
      anchorYear: Int = 2025): DataFrame = {
    val years = filter(
      transform(regexp_extract_all(col(text), lit("\\b(19|20)\\d{2}\\b"), lit(0)),
        y => y.cast("int")), y => y.between(1900, anchorYear + 1))
    val maxYear = array_max(years)
    results.select(col(id), maxYear.as("max_year"),
      when(maxYear.isNull, "unknown")
        .when(maxYear >= anchorYear - 1, "very_recent")
        .when(maxYear >= anchorYear - 3, "recent")
        .when(maxYear >= anchorYear - 7, "older")
        .otherwise("outdated").as("freshness"))
  }

  /** A6 authority signals (content_analysis.py:537-574): indicator hits. */
  def authoritySignals(results: DataFrame, text: String): DataFrame = {
    val t = lower(col(text))
    results.agg(
      sum(when(t.rlike("official documentation|docs\\."), 1).otherwise(0)).as("official_docs"),
      sum(when(t.rlike("\\bphd|professor|researcher\\b"), 1).otherwise(0)).as("expert"),
      sum(when(t.rlike("stack overflow|github|community"), 1).otherwise(0)).as("community"),
      sum(when(t.rlike("\\bjournal|study|peer.reviewed\\b"), 1).otherwise(0)).as("academic"))
  }

  /** A9 domain analysis (content_analysis.py:444-475): most_common(10) +
    * count of authoritative (score >= 0.8) domains. */
  def domainAnalysis(results: DataFrame, domain: String): DataFrame = {
    val top = results.groupBy(col(domain)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(domain).asc).limit(10)
    top.withColumn("authoritative",
      Scoring.domainScore(col(domain)) >= 0.8)
  }
}
