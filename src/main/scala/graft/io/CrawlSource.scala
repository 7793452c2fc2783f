package graft.io

import graft.pipeline.{HtmlExtract, Scoring, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources/sinks for the reference's JSONL interchange (SURVEY §2.1).
  *
  * S1/S2: tolerant JSONL/JSON-array readers (PERMISSIVE + _corrupt_record —
  * Spark streams both natively, so the reference's hand-rolled ijson
  * micro-batching collapses into one declarative read).
  * S4: row validation gate with observed metrics.
  * S5: tagged doc/chunk JSONL shard writer (<=1000 records/file).
  * S6: id-keyed idempotent upsert (parquet fallback for Iceberg MERGE).
  * §3.2: the full crawl -> documents + chunks pipeline.
  */
object CrawlSource {

  /** Raw crawl record schema (crawler/src/storage/enriched_storage.h:79-100;
    * only url+content required, file_reader.py:134-162). */
  val crawlSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("content", StringType),
    StructField("domain", StringType),
    StructField("depth", IntegerType),
    StructField("content_hash", StringType),
    StructField("timestamp", StringType),
    StructField("http_status_code", IntegerType),
    StructField("content_length", LongType),
    StructField("crawl_count", IntegerType),
    StructField("change_frequency", DoubleType),
    StructField("_corrupt_record", StringType)))

  /** S1/S2 + S4: read JSONL (or multiline JSON arrays), drop corrupt lines,
    * apply the validation gate, and observe pass/fail counts (the
    * reference's throttled error stats, file_reader.py:74-108). */
  def readCrawl(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame = {
    val raw = spark.read.schema(crawlSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", multiLine)
      .json(path)
    raw
      .observe("crawl_read",
        count(lit(1)).as("rows"),
        sum(when(col("_corrupt_record").isNotNull, 1).otherwise(0)).as("corrupt"),
        sum(when(TextPipeline.validRow(col("url"), col("content")), 0).otherwise(1))
          .as("invalid"))
      .filter(col("_corrupt_record").isNull &&
        TextPipeline.validRow(col("url"), col("content")))
      .drop("_corrupt_record")
  }

  /** §3.2 pipeline: crawl rows -> Processed Documents
    * (hybrid_processor.py:40-67 shape). HTML inputs go through the full
    * extraction stack — F3 noise filter + F4 main-content cascade
    * (main_content_extractor.rs:8-97), T15 title/description/author/date/
    * canonical cascades (metadata_extractor.rs:147-459), T14 headings
    * (optimized.rs:143-161), T11 meta keywords — all as codegen'd column
    * expressions (graft.pipeline.HtmlExtract); plain-text inputs keep the
    * F2 tag-strip fast path. Returns the documents DataFrame; `title`,
    * `headings` and `keywords` are real ranking fields (feed them to
    * IndexBuilder.Params.fields for the reference's title^2.5/headings^3.0/
    * keywords^2.0 multi-field shape). */
  def toDocuments(crawl: DataFrame): DataFrame = {
    val isHtml = HtmlExtract.looksLikeHtml(col("content"))
    // F2 fast path for non-HTML text: strip stray blocks + tags
    val noBlocks = regexp_replace(col("content"),
      "(?is)<(style|script|noscript|nav|header|footer)[^>]*>.*?</\\1>", " ")
    val plainText = TextPipeline.cleanText(regexp_replace(noBlocks, "<[^>]+>", " "))
    val text = when(isHtml,
      TextPipeline.cleanText(HtmlExtract.mainText(col("content"))))
      .otherwise(plainText)
    val base = crawl
      .withColumn("text", text)
      .withColumn("title", coalesce(
        when(isHtml, HtmlExtract.title(col("content"))),
        trim(substring(col("text"), 1, 80))))
      .withColumn("headings",
        when(isHtml, HtmlExtract.headings(col("content")))
          .otherwise(array().cast("array<string>")))
      .withColumn("keywords",
        when(isHtml, HtmlExtract.metaKeywords(col("content")))
          .otherwise(array().cast("array<string>")))
      .withColumn("domain2", coalesce(col("domain"), TextPipeline.domainOf(col("url"))))
      .withColumn("wc", size(split(col("text"), "\\s+")))
      .withColumn("heading_count", size(col("headings")))
      // materialized ONCE in this projection: the extractor is a heavy
      // regex+HOF battery, and its lambda subtrees defeat codegen CSE — the
      // select below reads it three times (null gate, src, alt), which
      // would otherwise run the full extraction 3x per document
      .withColumn("_pimg", when(isHtml, HtmlExtract.primaryImage(col("content"))))
    base.select(
      TextPipeline.documentId(col("text"), col("wc")).as("document_id"),
      col("url"), col("title"), col("domain2").as("domain"),
      coalesce(
        when(isHtml, HtmlExtract.description(col("content"))),
        TextPipeline.cleanDescription(col("text"))).as("description"),
      col("headings"), col("keywords"),
      when(isHtml, HtmlExtract.author(col("content"))).as("author"),
      when(isHtml, HtmlExtract.canonicalUrl(col("content"))).as("canonical_url"),
      // JSON-LD @type is the FIRST content-type arm
      // (metadata_extractor.rs:217-230); keyword rules are the fallback
      coalesce(
        when(isHtml, HtmlExtract.jsonLdType(col("content"))),
        graft.pipeline.TextPipeline.contentType(col("title"), col("text")))
        .as("content_type"),
      TextPipeline.categories(col("text")).as("categories"),
      coalesce(
        when(isHtml, TextPipeline.normalizeDate(HtmlExtract.publishedDate(col("content")))),
        TextPipeline.normalizeDate(col("timestamp"))).as("published_date"),
      when(isHtml, TextPipeline.normalizeDate(HtmlExtract.modifiedDate(col("content"))))
        .as("modified_date"),
      // primary image + favicon, src resolved against the page url (T20) —
      // the reference passes resolve_url into both extractors
      when(col("_pimg").isNotNull, struct(
        TextPipeline.resolveUrl(col("_pimg").getField("src"), col("url")).as("src"),
        col("_pimg").getField("alt").as("alt")))
        .as("primary_image"),
      when(isHtml, TextPipeline.resolveUrl(HtmlExtract.favicon(col("content")), col("url")))
        .as("favicon"),
      struct(
        col("wc").as("word_count"),
        Scoring.contentQualityScore(col("text"), col("title"),
          TextPipeline.cleanDescription(col("text")), col("wc"),
          col("heading_count"), lit(false), col("timestamp").isNotNull)
          .as("content_quality_score"),
        Scoring.isTechnical(col("text")).as("is_technical_content"),
        Scoring.domainScore(col("domain2")).as("domain_score")).as("semantic_info"),
      col("text"))
  }

  /** §3.2 chunks: documents -> DocumentChunk rows (T12 chunker + F5/F6
    * filters + chunk ids, hybrid_processor.py:70-83). */
  def toChunks(documents: DataFrame): DataFrame =
    TextPipeline.sentenceChunks(documents, "document_id", "text")
      .filter(TextPipeline.chunkLongEnough(col("text_chunk")) &&
        // the rust chunker's admission check (optimized.rs:182): noise
        // chunks (CSS/interface/entity remnants) never reach the index
        !graft.pipeline.NoiseFilters.webNoise(col("text_chunk")))
      .select(col("chunk_id"), col("document_id"), col("text_chunk"),
        col("chunk_index"), col("word_count"))

  /** S5: tagged JSONL shard writer (run_production_pipeline_clean.py:268-298
    * — type=document/chunk rows, <=1000 items per file). */
  def writeTaggedJsonl(documents: DataFrame, chunks: DataFrame, dir: String): Unit = {
    val d = documents.drop("text").withColumn("type", lit("document"))
    val c = chunks.withColumn("type", lit("chunk"))
    d.write.mode("overwrite").option("maxRecordsPerFile", 1000)
      .json(s"$dir/documents")
    c.write.mode("overwrite").option("maxRecordsPerFile", 1000)
      .json(s"$dir/chunks")
  }

  /** S6: id-keyed idempotent upsert — new rows win over existing rows with
    * the same id (the indexer's _id-keyed bulk upsert, indexer.py:474-495).
    * Parquet read-union-dedup-rewrite stands in for Iceberg MERGE INTO.
    *
    * Duplicate ids WITHIN one updates batch resolve deterministically (the
    * row with the lexicographically greatest serialized content wins), and
    * the promote renames the old table ASIDE before renaming the new one in
    * — a crash at any point leaves either the old or the new table intact,
    * never neither (the delete-before-rename window is gone). */
  def upsertById(spark: SparkSession, table: String, updates: DataFrame,
      idCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    recoverPromote(spark, table)
    val hasExisting = graft.index.IndexBuilder.fileExists(spark, table)
    // deterministic tiebreak for duplicate ids within one batch
    // ignoreNullFields=false: the default to_json DROPS null fields, so two
    // distinct rows differing only in null-vs-present could serialize
    // identically and the winner would be nondeterministic again.
    val tagged = updates.withColumn("_gen", lit(1L))
      .withColumn("_tie", to_json(struct(updates.columns.map(col): _*),
        Map("ignoreNullFields" -> "false")))
    val merged =
      if (!hasExisting) {
        val w = Window.partitionBy(col(idCol))
          .orderBy(col("_gen").desc, col("_tie").desc)
        tagged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      } else {
        val existing = spark.read.parquet(table)
          .withColumn("_gen", lit(0L)).withColumn("_tie", lit(""))
        val w = Window.partitionBy(col(idCol))
          .orderBy(col("_gen").desc, col("_tie").desc)
        existing.unionByName(tagged)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      }
    val tmp = s"$table-next"
    merged.drop("_gen", "_tie").write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$table-old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(p)) fs.rename(p, old) // old aside first — never delete-then-rename
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
    if (fs.exists(old)) fs.delete(old, true)
    ()
  }

  /** Crash recovery for [[upsertById]]'s promote window: if a crash landed
    * between rename(table -> table-old) and rename(tmp -> table), the live
    * path is missing but `-old` still holds the data — restore it BEFORE
    * reading, or the next upsert would treat the table as empty and then
    * delete the sole surviving copy. Idempotent; called at upsert start. */
  private def recoverPromote(spark: SparkSession, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$table-old")
    if (!fs.exists(p) && fs.exists(old)) { fs.rename(old, p); () }
  }
}
