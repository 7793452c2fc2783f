package graft.io

import graft.pipeline.{Scoring, TextPipeline}
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
    * (hybrid_processor.py:40-67 shape, text-based — the F2 tag strip is the
    * only HTML step retained; DOM extraction is out of scope for source
    * text). Returns the documents DataFrame. */
  def toDocuments(crawl: DataFrame): DataFrame = {
    // F2: strip style/script/nav blocks + all tags before anything else
    val noBlocks = regexp_replace(col("content"),
      "(?is)<(style|script|noscript|nav|header|footer)[^>]*>.*?</\\1>", " ")
    val text = TextPipeline.cleanText(regexp_replace(noBlocks, "<[^>]+>", " "))
    val title = trim(substring(text, 1, 80))
    val base = crawl
      .withColumn("text", text)
      .withColumn("title", title)
      .withColumn("domain2", coalesce(col("domain"), TextPipeline.domainOf(col("url"))))
      .withColumn("wc", size(split(col("text"), "\\s+")))
      .withColumn("heading_count", lit(0))
    base.select(
      TextPipeline.documentId(col("text"), col("wc")).as("document_id"),
      col("url"), col("title"), col("domain2").as("domain"),
      TextPipeline.cleanDescription(col("text")).as("description"),
      graft.pipeline.TextPipeline.contentType(col("title"), col("text")).as("content_type"),
      TextPipeline.categories(col("text")).as("categories"),
      TextPipeline.normalizeDate(col("timestamp")).as("published_date"),
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
      .filter(TextPipeline.chunkLongEnough(col("text_chunk")))
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
    * Parquet read-union-dedup-rewrite stands in for Iceberg MERGE INTO. */
  def upsertById(spark: SparkSession, table: String, updates: DataFrame,
      idCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val hasExisting = graft.index.IndexBuilder.fileExists(spark, table)
    val merged =
      if (!hasExisting) updates.withColumn("_gen", lit(1L))
      else {
        val existing = spark.read.parquet(table).withColumn("_gen", lit(0L))
        val w = Window.partitionBy(col(idCol)).orderBy(col("_gen").desc)
        existing.unionByName(updates.withColumn("_gen", lit(1L)))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      }
    val tmp = s"$table-next"
    merged.drop("_gen").write.mode("overwrite").parquet(tmp)
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }
}
