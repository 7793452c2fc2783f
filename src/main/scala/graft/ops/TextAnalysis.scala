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
