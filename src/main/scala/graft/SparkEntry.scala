package graft

import graft.index.{BlockRow, Codec, Compaction, Deletes, IndexBuilder, Upsert}
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract (see /root/repo/SURVEY.md §7 + TESTDATA.md).
  *
  * Every entry in [[queries]] has an exact ANSI-SQL oracle in [[oracleSql]]
  * runnable by DuckDB over the same parquet tables. The BM25 entries run the
  * REAL engine (index build -> compressed postings -> decode -> score ->
  * top-k -> diversity) against a from-first-principles SQL restatement of
  * the semantics — a full-pipeline differential check through the driver's
  * correctness gate. All hashes in dedup/fingerprint entries are md5-hex
  * arithmetic (graft.ops.Hashing) so DuckDB computes identical values.
  */
object SparkEntry {

  // ------------------------------------------------------------ engine index

  private val indexCache = new java.util.concurrent.ConcurrentHashMap[String, SearchIndex]()

  private def docsCorpus(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("source").as("repo"),
        concat_ws("/", col("source"), col("lang"), col("doc_id")).as("path"),
        col("lang"), col("text").as("content"))

  /** documents.parquet -> corpus shape -> built index (memoized per sfDir). */
  def docsIndex(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(sfDir, { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}"
      IndexBuilder.build(spark, docsCorpus(spark, sfDir), dir,
        IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
          fields = Seq("content")))
      new SearchIndex(spark, dir)
    })

  /** Two-field index (content + path tokens — the title/headings analog of
    * the reference's multi-field search shape, opensearch_service.py:198-227)
    * for the q19 gate. */
  def docsIndexMF(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#mf", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-mf"
      IndexBuilder.build(spark, docsCorpus(spark, sfDir), dir,
        IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
          fields = Seq("content", "path")))
      new SearchIndex(spark, dir)
    })

  /** Chunk table for the chunk-level gate: the declarative word-window
    * chunker (the reference chunker's unpunctuated arm) over documents,
    * with the synthetic long chunk docId (parent*64 + chunk_index). */
  def chunkMeta(spark: SparkSession, sfDir: String): DataFrame =
    graft.pipeline.TextPipeline.wordWindowChunks(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        wordsPerChunk = 16, minChars = 50)
      .withColumn("docId",
        graft.query.ChunkSearch.chunkDocId(col("doc_id"), col("chunk_index")))

  /** The reference's REAL index unit: chunks (indexer.py:330-340 chunk
    * mapping; `text_chunk` is the primary search field,
    * opensearch_service.py:198-239). repo = parent domain so R9 diversity is
    * the reference's domain diversity. */
  def chunksIndex(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#chunks", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-chunks"
      val parents = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"))
      val corpus = chunkMeta(spark, sfDir)
        .join(parents, "doc_id")
        .select(col("docId"), col("source").as("repo"),
          concat_ws("/", col("source"), col("doc_id"), col("chunk_index")).as("path"),
          col("lang"), col("text_chunk").as("content"))
      IndexBuilder.build(spark, corpus, dir,
        IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
          fields = Seq("content")))
      new SearchIndex(spark, dir)
    })

  /** FOUR-field chunk index for the reference's exact primary query shape
    * (opensearch_service.py:198-227: text_chunk^1.5 + headings^3.0 +
    * keywords^2.0 + title^2.5, match_phrase text_chunk^2.0). Parent
    * metadata fields are deterministic word-windows of the parent text
    * (title = words 1-6, headings = 7-12, keywords = 13-15) so the DuckDB
    * oracle restates them exactly; every chunk row carries its parent's
    * copies — the reference's chunk mapping duplicates parent fields per
    * chunk the same way (indexer/indexer.py:330-340). */
  def chunksIndexRef(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#chunksref", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-chunksref"
      val ws = split(trim(col("text")), "\\s+")
      val parents = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"),
          array_join(slice(ws, 1, 6), " ").as("title"),
          array_join(slice(ws, 7, 6), " ").as("headings"),
          array_join(slice(ws, 13, 3), " ").as("keywords"))
      val corpus = chunkMeta(spark, sfDir)
        .join(parents, "doc_id")
        .select(col("docId"), col("source").as("repo"),
          concat_ws("/", col("source"), col("doc_id"), col("chunk_index")).as("path"),
          col("lang"), col("text_chunk").as("content"),
          col("title"), col("keywords"), col("headings"))
      IndexBuilder.build(spark, corpus, dir,
        IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
          fields = Seq("content", "title", "keywords", "headings")))
      new SearchIndex(spark, dir)
    })

  /** Index built through the full ingest lifecycle — three straddled resume
    * batches (docId-range cuts, so interior docGroups really hold multiple
    * segments) then a segment compaction — for the q63 gate: the
    * post-compaction index must answer the BM25 oracle identically to a
    * monolithic build (CompactionSpec proves bitwise table equality; the
    * gate proves it against the external DuckDB oracle). */
  def docsIndexCompacted(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#compacted", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-compacted"
      val corpus = docsCorpus(spark, sfDir)
      val maxId = corpus.agg(max(col("docId"))).collect()(0).getLong(0)
      val p = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content"))
      IndexBuilder.build(spark, corpus.filter(col("docId") <= maxId / 3), dir,
        p.copy(inputSnapshot = "batch-0"))
      IndexBuilder.resume(spark, corpus.filter(col("docId") <= 2 * maxId / 3),
        dir, p.copy(inputSnapshot = "batch-1"))
      IndexBuilder.resume(spark, corpus, dir, p.copy(inputSnapshot = "batch-2"))
      // falsifiability: the fixture must really fragment, and really merge
      val segs = spark.read.parquet(s"$dir/lineage")
        .select("inputSnapshot").distinct().count()
      require(segs == 3, s"compaction gate fixture: expected 3 segments, got $segs")
      require(Compaction.compact(spark, dir, blockSize = 128).nonEmpty,
        "compaction gate fixture: compact was a no-op")
      new SearchIndex(spark, dir)
    })

  /** Index whose derived tables were maintained INCREMENTALLY (q72 gate):
    * three straddled resume batches with `incrementalDerived = true` (the
    * default), NO compaction — so the final dictionary is the product of
    * two bucket-grain incremental merges ((tlen, termBucket) dynamic
    * overwrites of touched buckets only), never a full re-derivation. The
    * gate compares the COMPLETE dictionary against DuckDB's from-scratch
    * term aggregate over the raw text — the end-to-end external check on
    * the bucketed maintenance path (ResumeSpec proves it bitwise-equal to
    * the full path and that it does not silently fall back; this gate
    * proves the result against an independent engine). */
  def docsIndexIncremental(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#incr", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-incr"
      val corpus = docsCorpus(spark, sfDir)
      val maxId = corpus.agg(max(col("docId"))).collect()(0).getLong(0)
      val p = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content"))
      IndexBuilder.build(spark, corpus.filter(col("docId") <= maxId / 3), dir,
        p.copy(inputSnapshot = "batch-0"))
      IndexBuilder.resume(spark, corpus.filter(col("docId") <= 2 * maxId / 3),
        dir, p.copy(inputSnapshot = "batch-1"))
      IndexBuilder.resume(spark, corpus, dir, p.copy(inputSnapshot = "batch-2"))
      // falsifiability: the LAST resume must actually have taken the
      // incremental path — a silent fallback to the full re-derivation
      // would validate the wrong code against the oracle
      require(IndexBuilder.lastDerivedIncremental,
        "incremental gate fixture: the resume fell back to the full refresh")
      val segs = spark.read.parquet(s"$dir/lineage")
        .select("inputSnapshot").distinct().count()
      require(segs == 3, s"incremental gate fixture: expected 3 segments, got $segs")
      require(IndexBuilder.dictBucketCount(spark, dir).isDefined,
        "incremental gate fixture: bucketed dictionary layout expected")
      new SearchIndex(spark, dir)
    })

  /** Index with LIVE tombstones (q66 gate): plain build, then docId%7==3
    * tombstoned through graft.index.Deletes — Lucene live-docs semantics,
    * so stats/df deliberately still count the deleted docs while the docs
    * themselves are excluded from every result at scoring time. */
  def docsIndexDeleted(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#del", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-del"
      IndexBuilder.build(spark, docsCorpus(spark, sfDir), dir,
        IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
          fields = Seq("content")))
      val n = Deletes.deleteWhere(spark, dir, pmod(col("docId"), lit(7)) === 3)
      require(n > 0, "delete gate fixture: nothing tombstoned")
      new SearchIndex(spark, dir)
    })

  /** Deleted-then-PURGED index (q67 gate): the full delete lifecycle —
    * straddled 3-batch ingest, docId%7==3 tombstoned, full compaction
    * applying the tombstones (merged segments written without the deleted
    * docs, tombstones GC'd, dictionary/stats re-derived from survivors) —
    * so the gate's oracle is plain BM25 over the survivor corpus. */
  def docsIndexPurged(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#purged", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-purged"
      val corpus = docsCorpus(spark, sfDir)
      val maxId = corpus.agg(max(col("docId"))).collect()(0).getLong(0)
      val p = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content"))
      IndexBuilder.build(spark, corpus.filter(col("docId") <= maxId / 3), dir,
        p.copy(inputSnapshot = "batch-0"))
      IndexBuilder.resume(spark, corpus.filter(col("docId") <= 2 * maxId / 3),
        dir, p.copy(inputSnapshot = "batch-1"))
      IndexBuilder.resume(spark, corpus, dir, p.copy(inputSnapshot = "batch-2"))
      val n = Deletes.deleteWhere(spark, dir, pmod(col("docId"), lit(7)) === 3)
      require(n > 0, "purge gate fixture: nothing tombstoned")
      require(Compaction.compact(spark, dir, blockSize = 128).nonEmpty,
        "purge gate fixture: compact was a no-op")
      require(Deletes.count(spark, dir) == 0L,
        "purge gate fixture: full merge must apply and GC every tombstone")
      new SearchIndex(spark, dir)
    })

  /** Full lifecycle on the SNAPSHOT-ISOLATED table layer (q71 gate,
    * graft.io.SnapshotTableIO): straddled two-batch ingest, docId%5==2
    * tombstoned, expunge-merge purging them, then a physical vacuum of
    * every table (retain=1) — so the gate's BM25 answer comes from a
    * manifest-committed, vacuumed index where every mutation since build
    * was an atomic snapshot commit. Oracle = plain BM25 over the
    * survivors, identical shape to q67's — proving the snapshot layer
    * changes storage semantics (reader isolation) and nothing else. */
  def docsIndexSnapshot(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#snap", { _ =>
      val io = graft.io.SnapshotTableIO
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-snap"
      val corpus = docsCorpus(spark, sfDir)
      val maxId = corpus.agg(max(col("docId"))).collect()(0).getLong(0)
      val p = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content"), io = io)
      IndexBuilder.build(spark, corpus.filter(col("docId") <= maxId / 2), dir,
        p.copy(inputSnapshot = "batch-0"))
      IndexBuilder.resume(spark, corpus, dir, p.copy(inputSnapshot = "batch-1"))
      val n = Deletes.deleteWhere(spark, dir, pmod(col("docId"), lit(5)) === 2, io)
      require(n > 0, "snapshot gate fixture: nothing tombstoned")
      require(Compaction.expungeDeletes(spark, dir, blockSize = 128, io).nonEmpty,
        "snapshot gate fixture: expunge was a no-op")
      require(Deletes.count(spark, dir, io) == 0L,
        "snapshot gate fixture: merge must GC every tombstone")
      val reclaimed = graft.index.Vacuum.vacuumIndex(spark, dir, retain = 1, io)
      require(reclaimed > 0, "snapshot gate fixture: vacuum reclaimed nothing")
      new SearchIndex(spark, dir, io)
    })

  /** Index through the RE-CRAWL lifecycle (q68/q69 gates,
    * graft.index.Upsert): plain build, then ONE upsert batch keyed by
    * (repo, path) — ids %4==0 re-crawled with changed content (tombstone
    * old + add under a fresh dense id), %4==1 re-presented byte-identical
    * (idempotent no-op), %9==5 re-added under a NEW path (pure adds) —
    * left in the mid-lifecycle state: live tombstones, stale full-corpus
    * stats, adds as an appended segment. Mirrors the reference indexer's
    * content-hash-gated re-ingest (crawler content_hash.h:16-28 +
    * data_pipeline indexer _id-keyed bulk upsert). */
  def docsIndexUpserted(spark: SparkSession, sfDir: String): SearchIndex =
    indexCache.computeIfAbsent(s"$sfDir#ups", { _ =>
      val dir = s"/tmp/graft-entry-index/${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}-ups"
      val corpus = docsCorpus(spark, sfDir)
      val p = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content"))
      IndexBuilder.build(spark, corpus, dir, p)
      val unchanged = corpus.filter(pmod(col("docId"), lit(4)) === 1).drop("docId")
      val changed = corpus.filter(pmod(col("docId"), lit(4)) === 0).drop("docId")
        .withColumn("content", concat(col("content"), lit(" zzzrefresh update")))
      val brandNew = corpus.filter(pmod(col("docId"), lit(9)) === 5).drop("docId")
        .withColumn("path", concat(col("path"), lit(".new")))
        .withColumn("content", concat(lit("qqnovel corpus addition "), col("content")))
      val r = Upsert.upsert(spark,
        unchanged.unionByName(changed).unionByName(brandNew), dir,
        p.copy(inputSnapshot = "recrawl-1"), Seq("repo", "path"))
      require(r.added > 0 && r.tombstoned > 0 && r.unchangedSkipped > 0,
        s"upsert gate fixture degenerate: $r")
      new SearchIndex(spark, dir)
    })

  private def bm25(spark: SparkSession, sfDir: String, query: String, k: Int,
      diversity: Boolean, wand: Boolean): DataFrame = {
    val idx = docsIndex(spark, sfDir)
    QueryEngine.search(idx, query,
        SearchOpts(k = k, overfetch = 3, diversity = diversity, wand = wand))
      .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
        round(col("score"), 6).as("score"), col("repo"))
  }

  // ------------------------------------------------------------- entry point

  /** Flagship query on sf=0.001: full engine search (driver smoke-check). */
  def entry(spark: SparkSession): DataFrame =
    bm25(spark, "/root/testdata/sf0.001", "spark merge join", 10,
      diversity = true, wand = true)

  // ------------------------------------------------------------ query map

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- general analytics (Catalyst-planned; filters/joins/windows) ----
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
    }),
    "q02_revenue_by_nation" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer"); val n = t(s, d, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),
    "q03_top_customers" -> ((s, d) => {
      val rev = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
      rev.join(broadcast(t(s, d, "customer")), rev("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey").asc).limit(10)
    }),
    "q04_order_ranks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"),
          col("o_totalprice"))
    }),
    "q05_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    }),

    // ---- search-engine core over the real index ----
    "q10_index_stats" -> ((s, d) => {
      val idx = docsIndex(s, d)
      val (n, avgdl) = idx.stats("content")
      val dictAgg = idx.dictionary.agg(count(lit(1)).as("vocab"),
        sum(col("df")).as("postings")).collect()(0)
      import s.implicits._
      Seq((n, BigDecimal(avgdl).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        dictAgg.getLong(0), dictAgg.getLong(1)))
        .toDF("n_docs", "avgdl", "vocab", "postings")
    }),
    "q11_term_df" -> ((s, d) => {
      docsIndex(s, d).dictionary
        .select(col("term"), col("df"), col("totalTf").as("total_tf"))
        .orderBy(col("df").desc, col("term").asc).limit(20)
    }),
    "q12_postings" -> ((s, d) => {
      // decode via the native Catalyst expression (graft.functions) — the
      // whole decode stays inside the plan, no typed flatMap
      graft.functions.GraftFunctions.register(s)
      val terms = Seq("spark", "merge", "window", "batch", "query")
      docsIndex(s, d).postings.filter(col("term").isin(terms: _*))
        .select(col("term"),
          explode(expr("decode_postings(firstDocId, bytes)")).as("p"))
        .select(col("term"), col("p.docId").as("doc_id"),
          col("p.tf").cast("long").as("tf"), col("p.dl").cast("long").as("dl"))
    }),
    "q13_bm25_topk" -> ((s, d) =>
      bm25(s, d, "spark merge join", 10, diversity = false, wand = false)),
    "q14_bm25_wand" -> ((s, d) =>
      bm25(s, d, "window scan filter", 10, diversity = false, wand = true)),
    "q63_compaction" -> ((s, d) => {
      val idx = docsIndexCompacted(s, d)
      QueryEngine.search(idx, "merge scan table",
          SearchOpts(k = 10, overfetch = 3, diversity = false, wand = true))
        .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"), col("repo"))
    }),
    "q66_deletes_live" -> ((s, d) => {
      // tombstoned docs excluded at scoring time, stats still full-corpus
      // (the Lucene stale-stats window) — the oracle restates exactly that
      val idx = docsIndexDeleted(s, d)
      QueryEngine.search(idx, "spark merge join",
          SearchOpts(k = 10, overfetch = 3, diversity = false, wand = true))
        .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"), col("repo"))
    }),
    "q67_deletes_purge" -> ((s, d) => {
      // after the merge applied the tombstones, the engine must equal plain
      // BM25 over the survivor corpus — exact stats restored
      val idx = docsIndexPurged(s, d)
      QueryEngine.search(idx, "window scan filter",
          SearchOpts(k = 10, overfetch = 3, diversity = false, wand = true))
        .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"), col("repo"))
    }),
    "q71_snapshot_bm25" -> ((s, d) => {
      // the whole mutation history behind this answer was snapshot commits
      // (build, resume, tombstone, expunge-merge, vacuum) on
      // SnapshotTableIO; the page must equal plain BM25 over the survivors
      val idx = docsIndexSnapshot(s, d)
      QueryEngine.search(idx, "sort group data",
          SearchOpts(k = 10, overfetch = 3, diversity = false, wand = true))
        .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"), col("repo"))
    }),
    "q68_upsert_search" -> ((s, d) => {
      // mid-lifecycle state after a re-crawl upsert: adds live under fresh
      // dense ids, stale versions tombstoned but still in stats/df — the
      // oracle restates the whole universe (old ∪ adds) with the dead
      // versions excluded at scoring time
      val idx = docsIndexUpserted(s, d)
      QueryEngine.search(idx, "zzzrefresh qqnovel merge",
          SearchOpts(k = 10, overfetch = 3, diversity = false, wand = true))
        .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
          round(col("score"), 6).as("score"), col("repo"))
    }),
    "q69_upsert_view" -> ((s, d) => {
      // upsert bookkeeping: the LIVE docs view — fresh ids are dense rank
      // by (repo, path) above every committed id, stale versions dead,
      // unchanged keys untouched
      val idx = docsIndexUpserted(s, d)
      val dead = Deletes.df(s, idx.dir).get.select("docId")
      idx.docs.join(dead, Seq("docId"), "left_anti")
        .select(col("docId").as("doc_id"), col("repo"), col("path"),
          col("dl_content").cast("long").as("dl"))
    }),
    "q70_keymap" -> ((s, d) => {
      // the upsert KeyMap sidecar IS the live (key -> docId, sha256) view:
      // gated against an oracle that recomputes the post-upsert live
      // corpus from scratch (dead versions out, fresh dense ids,
      // content hashes) — proving the bucket-incremental sidecar equals
      // ground truth through the full build -> upsert lifecycle
      val idx = docsIndexUpserted(s, d)
      require(graft.index.KeyMap.validBuckets(s, idx.dir, Seq("repo", "path"))
        .nonEmpty, "q70 fixture: keymap marker must be valid after the upsert")
      s.read.parquet(graft.index.KeyMap.table(idx.dir))
        .select(col("repo"), col("path"), col("docId").cast("long").as("doc_id"),
          col("sha256").as("sha"))
    }),
    "q72_incremental_dict" -> ((s, d) => {
      // COMPLETE dictionary after two bucket-grain incremental merges —
      // every term's (df, totalTf) vs DuckDB's from-scratch aggregate
      docsIndexIncremental(s, d).dictionary
        .select(col("term"), col("df"), col("totalTf").as("total_tf"))
    }),
    "q15_bm25_multi" -> ((s, d) => {
      Seq("sort table", "group data row", "slow filter")
        .zipWithIndex.map { case (q, i) =>
          bm25(s, d, q, 5, diversity = false, wand = i % 2 == 1)
            .withColumn("qid", lit(i.toLong))
        }.reduce(_ unionByName _)
    }),
    "q17_bm25_diversity" -> ((s, d) =>
      bm25(s, d, "spark merge join", 9, diversity = true, wand = true)),
    "q19_bm25_fields" -> ((s, d) => {
      // the reference's PRIMARY query shape end-to-end: multi-field boosts
      // (content^1.5 + path^2.5, the title/headings analog) and the
      // match_phrase 2.0 arm, through the real 2-field index + WAND
      val idx = docsIndexMF(s, d)
      Seq(("src12 merge join", 0.0), ("merge join", 2.0)).zipWithIndex
        .map { case ((q, pb), i) =>
          QueryEngine.search(idx, q, SearchOpts(k = 10, overfetch = 3,
              diversity = false, wand = true,
              fields = Seq("content" -> 1.5, "path" -> 2.5),
              phraseBoost = pb, phraseField = "content"))
            .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
              round(col("score"), 6).as("score"), col("repo"))
            .withColumn("qid", lit(i.toLong))
        }.reduce(_ unionByName _)
    }),
    "q50_chunk_search" -> ((s, d) => {
      // the reference's PRIMARY data flow end-to-end: chunk-level index
      // (text_chunk^1.5 + match_phrase 2.0), domain diversity over chunk
      // hits, then the chunk->document merge with CHUNK-FIELD PRECEDENCE
      // (both sides carry word_count; the chunk's must win or the oracle
      // hash breaks) and _id = parent id (opensearch_service.py:145-196)
      val idx = chunksIndex(s, d)
      val cm = chunkMeta(s, d)
        .select(col("docId"), col("doc_id"),
          col("chunk_index").cast("long").as("chunk_idx"),
          col("word_count").cast("long").as("word_count"))
      val parents = t(s, d, "documents")
        .select(col("doc_id"), col("source").as("domain"), col("lang"),
          col("n_chars"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("word_count"))
      graft.query.ChunkSearch.search(idx, cm, parents, "spark merge join",
          SearchOpts(k = 10, overfetch = 3, diversity = true, wand = true,
            fields = Seq("content" -> 1.5), phraseBoost = 2.0,
            phraseField = "content"),
          docIdCol = "doc_id")
        .select(col("rank").cast("long").as("rnk"), col("_id").as("doc_id"),
          col("chunk_idx"), round(col("score"), 6).as("score"),
          round(col("chunk_score"), 6).as("chunk_score"), col("domain"),
          col("lang"), col("n_chars"), col("word_count"))
    }),
    "q65_langdetect" -> ((s, d) => {
      // F1 reference ladder (language_detector.rs:33-130): URL arms (en
      // subdomain / known-domain containment / path / TLD — and a non-en
      // subdomain that must FALL THROUGH), lang= attribute arm, and the
      // confidence-thresholded content arm (conf = top marker hits / total
      // > 0.7; for this ASCII corpus only 'the' hits, so docs whose first
      // 1000 chars lack it yield null — falsifiable both ways)
      import graft.ops.TextAnalysis
      val url = when(col("doc_id") % 7 === 0, lit("https://en.docs.xyz/a"))
        .when(col("doc_id") % 7 === 1, lit("https://de.docs.xyz/a"))
        .when(col("doc_id") % 7 === 2, lit("https://blog.github.xyz/a"))
        .when(col("doc_id") % 7 === 3, lit("https://docs.xyz/en/a"))
        .when(col("doc_id") % 7 === 4, lit("https://docs.example.com/a"))
        .otherwise(lit("https://docs.xyz/x"))
      val text2 = when(col("doc_id") % 7 === 5,
        concat(lit("<html lang=\"fr\"> "), col("text"))).otherwise(col("text"))
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.detectLanguage(text2, url).as("lang"),
        TextAnalysis.isEnglish(text2, url).as("is_en"))
    }),
    "q64_preview" -> ((s, d) => {
      // T22 full preview cascade incl. the best-scoring-sentence arm
      // (enhanced_search_service.py:13-83). Inputs synthesized per doc_id
      // so every arm fires: long description (>300 -> sentence-boundary
      // truncation), short description (returned whole), 'short' (skipped,
      // len<=30), NULL, structured-description arm, and the query-relevant
      // argmax over '.'-sentences (periods planted via replace).
      val chunk = expr("replace(text, ' merge ', '. ')")
      val desc = when(col("doc_id") % 6 === 0, substring(chunk, 1, 400))
        .when(col("doc_id") % 6 === 3, substring(col("text"), 1, 120))
        .when(col("doc_id") % 6 === 5, lit(null).cast("string"))
        .when(col("doc_id") % 3 === 1, lit("short"))
        .otherwise(lit(""))
      val sdesc = when(col("doc_id") % 5 === 0, substring(col("text"), 30, 180))
        .otherwise(lit(""))
      t(s, d, "documents").select(col("doc_id"),
        graft.pipeline.TextPipeline.createPreview(desc, sdesc, chunk,
          lit("data spark window")).as("preview"))
    }),
    "q62_highlight" -> ((s, d) => {
      // T21: excerpt window around the first term hit (ellipses), first-300
      // fallback when absent — term varies per doc_id to hit all arms
      val term = when(col("doc_id") % 3 === 0, lit("merge"))
        .when(col("doc_id") % 3 === 1, lit("window"))
        .otherwise(lit("zzznotfound"))
      t(s, d, "documents").select(col("doc_id"),
        graft.pipeline.TextPipeline.highlight(col("text"), term).as("excerpt"))
    }),
    "q61_lifecycle" -> ((s, d) => {
      // §3.1 end-to-end through SearchService: validate -> X4 spell-correct
      // ("pythn" -> "python") -> primary search. The oracle scores the
      // CORRECTED query (python has df=0 here and contributes nothing,
      // exactly like the engine's dropped unknown term), so a broken
      // correction step fails the gate.
      val resp = graft.query.SearchService.search(docsIndex(s, d),
        "pythn merge join",
        SearchOpts(k = 9, overfetch = 3, diversity = true, wand = true)).get
      resp.results.select(col("rank").cast("long").as("rnk"),
        col("docId").as("doc_id"), round(col("score"), 6).as("score"),
        col("repo"))
    }),
    "q59_domain_analysis" -> ((s, d) => {
      // A9: top-10 domains + authoritative (Q1 domainScore >= 0.8) —
      // domains injected per doc_id to exercise exact-map, TLD-suffix and
      // default arms of the score
      val dom = when(col("doc_id") % 6 === 0, lit("github.com"))
        .when(col("doc_id") % 6 === 1, lit("wikipedia.org"))
        .when(col("doc_id") % 6 === 2, lit("medium.com"))
        .when(col("doc_id") % 6 === 3, concat(col("source"), lit(".edu")))
        .when(col("doc_id") % 6 === 4, concat(col("source"), lit(".net")))
        .otherwise(concat(col("source"), lit(".example")))
      graft.pipeline.Insights.domainAnalysis(
          t(s, d, "documents").withColumn("domain", dom), "domain")
        .withColumn("authoritative", col("authoritative").cast("long"))
    }),
    "q60_authority" -> ((s, d) => {
      // A6: authority-indicator counts; markers injected per doc_id so
      // each signal regex fires on a known subset
      val atext = concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" official documentation here"))
          .when(col("doc_id") % 5 === 1, lit(" written by a professor"))
          .when(col("doc_id") % 5 === 2,
            lit(" discussed on stack overflow and github community"))
          .when(col("doc_id") % 5 === 3, lit(" peer reviewed journal study"))
          .otherwise(lit("")))
      graft.pipeline.Insights.authoritySignals(
        t(s, d, "documents").withColumn("text", atext), "text")
    }),
    "q55_quality_dist" -> ((s, d) =>
      // A3 quality buckets over a deterministic quality column
      graft.pipeline.Insights.qualityDistribution(
        t(s, d, "documents").withColumn("quality", col("n_chars") / 1000.0),
        "quality")),
    "q56_topic_clusters" -> ((s, d) =>
      // A4: word freq (len>=4, cnt>=2) across a doc sample, top-5 +
      // relevance = cnt / sample size
      graft.pipeline.Insights.topicClusters(
        t(s, d, "documents").filter(col("doc_id") % 50 === 0), "text", k = 5)),
    "q57_freshness" -> ((s, d) => {
      // A5: max 4-digit year -> bucket; years injected deterministically
      // (doc_id % 5) so all five buckets are exercised on the clean corpus
      val ytext = concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" published 2025"))
          .when(col("doc_id") % 5 === 1, lit(" from 2021 and 2023"))
          .when(col("doc_id") % 5 === 2, lit(" revised 2019"))
          .when(col("doc_id") % 5 === 3, lit(" archive 1999"))
          .otherwise(lit("")))
      graft.pipeline.Insights.freshness(
        t(s, d, "documents").withColumn("text", ytext), "doc_id", "text")
    }),
    "q58_date_range" -> ((s, d) =>
      // A2 over the events stream's timestamps
      graft.pipeline.Insights.dateRange(t(s, d, "events"), "ts")),
    "q54_web_noise" -> ((s, d) => {
      // F7 contains_web_noise over deterministically noise-injected text
      // (doc_id % 8 picks the arm; 6 and 7 stay clean) — the synthetic
      // corpus is clean prose, so injection is what makes each arm
      // observable: CSS pattern, entity remnant, bracket spam,
      // interface-noise density, CSS char density, uppercase windows
      val m = pmod(col("doc_id"), lit(8L))
      val noisy = when(m === 0, concat(col("text"), lit(" display:inline")))
        .when(m === 1, concat(col("text"), lit(" &nbsp;")))
        .when(m === 2, concat(col("text"), lit(" [1.0][2.1][3.4][4][5][6]")))
        .when(m === 3, concat(col("text"), lit(" talk contribs" * 100)))
        .when(m === 4, concat(col("text"), lit(" " + (":;" * 15))))
        .when(m === 5, concat(col("text"), lit(" " + ("X" * 100))))
        .otherwise(col("text"))
      t(s, d, "documents").select(col("doc_id"),
        graft.pipeline.NoiseFilters.webNoise(noisy).cast("long").as("noise"))
    }),
    "q53_fallback" -> ((s, d) => {
      // R6 end-to-end: the relaxed path^2.0 + content^1.0 arm UNION the
      // epsilon-scored path-substring wildcard arm, max score per doc
      // (opensearch_service.py:241-261 shape). qid 0's needle substring-
      // matches paths; qid 1's (with a space) matches none — the wildcard-
      // empty case.
      // compared as the consumed PAGE (top-k by score desc, docId asc):
      // the WAND candidate SET is a superset of the exact top-m, so raw
      // sets differ run-to-run while the page is rank-identical
      // qid 2's needle is a path SUBSTRING that is not a token ("rc3"
      // inside "src3/..."), so its page is wildcard-arm-only — the epsilon
      // rows are observable and the arm falsifiable
      val idx = docsIndexMF(s, d)
      Seq("src3", "merge src5", "rc3").zipWithIndex.map { case (q, i) =>
        import org.apache.spark.sql.expressions.Window
        QueryEngine.fallback(idx, q, SearchOpts(k = 10, overfetch = 3))
          .orderBy(col("score").desc, col("docId").asc).limit(10)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("score").desc, col("docId").asc)).cast("long"))
          .select(col("rnk"), col("docId").as("doc_id"),
            round(col("score"), 6).as("score"))
          .withColumn("qid", lit(i.toLong))
      }.reduce(_ unionByName _)
    }),
    "q52_fuzzy" -> ((s, d) => {
      // R4b end-to-end: AUTO fuzziness (typo'd queries) — expansion against
      // the tlen-partition-pruned dictionary, then the ordinary BM25 page
      // over the expanded term set. qid 0 exercises maxd=1 typos, qid 1 a
      // maxd=2 arm (7-char term).
      val idx = docsIndex(s, d)
      Seq("spak mege", "windoww tble").zipWithIndex.map { case (q, i) =>
        QueryEngine.searchFuzzy(idx, q, SearchOpts(k = 10, overfetch = 3,
            diversity = false, wand = true))
          .select(col("rank").cast("long").as("rnk"), col("docId").as("doc_id"),
            round(col("score"), 6).as("score"), col("repo"))
          .withColumn("qid", lit(i.toLong))
      }.reduce(_ unionByName _)
    }),
    "q51_reference_query" -> ((s, d) => {
      // the reference's primary chunk query BOOST-FOR-BOOST
      // (opensearch_service.py:198-227): all four fields at their exact
      // boosts through a real 4-field chunk index + WAND, with and without
      // the match_phrase 2.0 arm
      val idx = chunksIndexRef(s, d)
      val flds = Seq("content" -> 1.5, "headings" -> 3.0,
        "keywords" -> 2.0, "title" -> 2.5)
      Seq(("spark merge join", 2.0), ("window scan fast", 0.0)).zipWithIndex
        .map { case ((q, pb), i) =>
          QueryEngine.search(idx, q, SearchOpts(k = 10, overfetch = 3,
              diversity = false, wand = true, fields = flds,
              phraseBoost = pb, phraseField = "content"))
            .select(col("rank").cast("long").as("rnk"),
              // integral div: double floor() loses exactness above 2^53,
              // and chunkDocId explicitly permits parents that large
              expr("docId div 64").cast("long").as("doc_id"),
              pmod(col("docId"), lit(64L)).cast("long").as("chunk_idx"),
              round(col("score"), 6).as("score"), col("repo").as("domain"))
            .withColumn("qid", lit(i.toLong))
        }.reduce(_ unionByName _)
    }),

    "q16_phrase_count" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents").select(col("doc_id"),
        posexplode(graft.core.Analyzer.tokensCol(col("text"))).as(Seq("pos", "term")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      toks.withColumn("nxt", lead(col("term"), 1).over(w))
        .filter(col("term") === "merge" && col("nxt") === "join")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("occurrences"))
    }),

    "q18_phrase_engine" -> ((s, d) => {
      // phrase occurrences computed from the INDEX's positional postings
      // (decode -> adjacency), cross-checked against a raw text scan oracle
      import s.implicits._
      val idx = docsIndex(s, d)
      val pTerms = Array("merge", "join")
      idx.postings.filter(col("term").isin(pTerms.toSeq: _*))
        .select(col("field"), col("term"), col("docGroup").cast("long").as("docGroup"),
          col("blockIdx"), col("firstDocId"), col("lastDocId"), col("n"),
          col("sumTf"), col("maxTf"), col("minTf"), col("minDl"), col("maxDl"),
          col("bytes"))
        .as[BlockRow]
        .flatMap(b => Codec.decodeBlock(b.firstDocId, b.bytes).iterator
          .map(p => (p.docId, b.term, p.positions.toSeq)))
        .groupByKey(_._1)
        .mapGroups { (docId, it) =>
          val byTerm = it.map(x => x._2 -> x._3.toArray).toMap
          val occ = if (pTerms.forall(byTerm.contains))
            graft.query.QueryEngine.countPhrase(pTerms, byTerm) else 0
          (docId, occ.toLong)
        }
        .filter(_._2 > 0)
        .toDF("doc_id", "occurrences")
    }),

    // ---- dedup / text analysis (training-data ops) ----
    "q20_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")),
    "q21_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", numHashes = 4)),
    "q22_lsh_pairs" -> ((s, d) =>
      Dedup.minhashLshPairs(t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", numHashes = 4, rowsPerBand = 2)),
    "q23_simhash" -> ((s, d) =>
      Dedup.simhash(t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", bits = 20)),
    "q35_simhash_pairs" -> ((s, d) => {
      // banded equi-join (pigeonhole) vs the oracle's naive all-pairs —
      // proves the scale-safe plan computes the same pair set
      val fps = Dedup.simhash(t(s, d, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", bits = 20)
      Dedup.simhashPairs(fps, "doc_id", maxDist = 6, bits = 20)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
    }),
    "q24_ngram_pairs" -> ((s, d) => {
      // maxShingleDf exercises the hot-shingle skew guard through the gate.
      // Planted near-dup twins (doc_id + 1e9, same text + a short tail) make
      // the gate compare NON-EMPTY pair sets at every SF — the round-3 gate
      // corpus had no organic Jaccard pairs >= 0.5, so the gate only proved
      // schema (VERDICT r3 "What's wrong" #3).
      val base = t(s, d, "documents").filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      val twins = base.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
          concat(col("text"), lit(" graft twin probe tail")).as("text"))
      Dedup.ngramJaccardPairs(base.unionByName(twins),
        "doc_id", "text", n = 3, threshold = 0.5, maxShingleDf = Some(50))
    }),
    "q25_langid" -> ((s, d) =>
      TextAnalysis.langId(s, t(s, d, "documents"), "doc_id", "text")),
    "q26_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(t(s, d, "documents"), "doc_id", "text")
        .withColumn("word_count", col("word_count").cast("long"))),
    "q27_token_counts" -> ((s, d) =>
      TextAnalysis.tokenCounts(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("re_tokens").cast("long").as("re_tokens"), col("bpe_est"))),
    "q28_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(t(s, d, "documents"), "doc_id", "text")),

    // ---- embedding similarity ----
    "q30_knn_brute" -> ((s, d) =>
      Similarity.knnBrute(t(s, d, "embeddings"), "vec_id", "embedding", 0L, 10)
        .withColumn("rank", col("rank").cast("long"))
        .withColumnRenamed("rank", "rnk")),
    "q31_ann_bucket" -> ((s, d) =>
      Similarity.annBucketed(t(s, d, "embeddings"), "vec_id", "embedding", 1L, 5, bits = 4)
        .withColumn("rank", col("rank").cast("long"))
        .withColumnRenamed("rank", "rnk")),
    "q32_near_dup_cosine" -> ((s, d) =>
      Similarity.cosineNearDupPairs(
        t(s, d, "embeddings").filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", threshold = 0.25, bits = 4)),
    "q34_ann_ivf" -> ((s, d) => {
      // IVF assign/probe/search machinery with a DETERMINISTIC coarse
      // quantizer (first 8 vectors as centroids) so DuckDB can replicate it
      // exactly; the k-means trainer itself is covered by AnnIvfSpec
      // (recall bounds + full-probe == brute force).
      import graft.ops.AnnIvf
      val emb = t(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") < 8).orderBy("vec_id").collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
      val model = AnnIvf.Model(cents)
      val assigned = AnnIvf.assign(emb, "embedding", model)
      val qvec = emb.filter(col("vec_id") === 3L).collect()(0).getSeq[Float](1).toArray
      AnnIvf.search(assigned, "vec_id", "embedding", qvec, 10, model, nProbe = 2)
        .select(col("rank").cast("long").as("rnk"), col("vec_id"), col("cos"),
          col("cell").cast("long").as("cell"))
    }),
    "q33_centroids" -> ((s, d) => {
      Similarity.centroids(t(s, d, "embeddings"), "label", "embedding")
        .select(col("label").cast("long").as("label"),
          col("dim").cast("long").as("dim"), col("centroid"))
    }),

    // ---- multimodal plumbing (deterministic stub decode) ----
    "q40_media_meta" -> ((s, d) =>
      Multimodal.metaColumns(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("byte_len"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"))),

    "q48_media_resize" -> ((s, d) =>
      Multimodal.resizePlan(
        Multimodal.metaColumns(t(s, d, "documents"), "doc_id", "text"),
        "doc_id", targetW = 512, targetH = 384)
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), col("out_w"), col("out_h"))),
    "q49_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.metaColumns(t(s, d, "documents"), "doc_id", "text"),
        "doc_id", step = 7)),

    // ---- web-pipeline parity ops (graft.pipeline) ----
    "q41_domain_extract" -> ((s, d) => {
      t(s, d, "documents")
        .withColumn("url", concat(lit("https://www."), col("source"),
          lit(".example.org/d/"), col("doc_id")))
        .withColumn("domain", graft.pipeline.TextPipeline.domainOf(col("url")))
        .select(col("doc_id"), col("url"), col("domain"),
          graft.pipeline.Scoring.domainScore(col("domain")).as("domain_score"))
    }),
    "q42_corpus_insights" -> ((s, d) => {
      graft.pipeline.Insights.searchInsights(
        t(s, d, "documents").withColumn("quality", col("n_chars") / 1000.0),
        "source", "quality", "lang")
    }),
    "q43_keywords" -> ((s, d) =>
      graft.pipeline.TextPipeline.topKeywords(
        t(s, d, "documents").filter(col("doc_id") % 20 === 0), "doc_id", "text", k = 5)
        .select(col("doc_id"), col("keyword"), col("cnt"),
          col("rnk").cast("long").as("rnk"))),
    "q44_semantic_metrics" -> ((s, d) =>
      graft.pipeline.TextPipeline.semanticMetrics(
        t(s, d, "documents"), "doc_id", "text")),
    "q45_url_resolve" -> ((s, d) => {
      // T20: hrefs of all four shapes resolved against a per-doc base url
      val base = concat(lit("https://www."), col("source"),
        lit(".example.org/dir/page"))
      val href = when(col("doc_id") % 4 === 0,
          concat(lit("http://abs.example.net/x/"), col("doc_id")))
        .when(col("doc_id") % 4 === 1, concat(lit("//cdn.example.net/a/"), col("doc_id")))
        .when(col("doc_id") % 4 === 2, concat(lit("/rooted/"), col("doc_id")))
        .otherwise(concat(lit("rel/"), col("doc_id")))
      t(s, d, "documents")
        .select(col("doc_id"), base.as("base_url"), href.as("href"),
          graft.pipeline.TextPipeline.resolveUrl(href, base).as("resolved"))
    }),
    "q46_json_dates" -> ((s, d) => {
      // T4: fixed-shape JSON per doc; the cleaner normalizes the date-key
      // value via the T3 cascade or drops the key when unparseable
      val dateStr = when(col("doc_id") % 3 === 0,
          concat(lit("March "), (col("doc_id") % 28 + 1).cast("string"), lit(", 2024")))
        .when(col("doc_id") % 3 === 1, lit("2025-08-01T12:30:00+02:00"))
        .otherwise(lit("not-a-date"))
      val json = concat(lit("""{"datePublished":""""), dateStr,
        lit("""","note":"k"}"""))
      t(s, d, "documents")
        .select(col("doc_id"), json.as("json"),
          graft.pipeline.TextPipeline.cleanJsonDatesCol(json).as("cleaned"))
    }),
    "q47_norm_dates" -> ((s, d) => {
      // T3 incl. the RFC-2822 arm (weekday prefix is informational and
      // ignored, as in the reference's lenient parse path)
      val day = (col("doc_id") % 28 + 1).cast("string")
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("Tue, "), day, lit(" Jul 2025 10:30:00 +0200")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("Mon, "), day, lit(" Aug 2025 08:00:00 GMT")))
        .when(col("doc_id") % 4 === 2, concat(lit("2024/03/"),
          lpad(day, 2, "0"), lit(" 06:15:00")))
        .otherwise(lit("garbage"))
      t(s, d, "documents")
        .select(col("doc_id"), raw.as("raw"),
          graft.pipeline.TextPipeline.normalizeDate(raw).as("normalized"))
    })
  )

  // ------------------------------------------------------------ oracle SQL

  /** Positional token stream CTE (DuckDB). */
  private val ToksPos =
    """ptoks AS (
      |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS term
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
      |)""".stripMargin

  private val Toks =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
      |)""".stripMargin

  private val Dl = "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)"

  /** The post-upsert document universe (q68/q69 gates): every original doc
    * (the %4==0 stale versions flagged `dead` — tombstoned but still in
    * stats), plus the upsert batch's adds under oracle-recomputed fresh
    * ids — base = max committed id + 1, dense rank in (repo, path) order,
    * exactly graft.index.Upsert's assignment. Ends in `docsrc` for
    * bm25Sql(docsSrcSql). */
  private val UpsertSrcSql: String = {
    val path = "source || '/' || lang || '/' || CAST(doc_id AS VARCHAR)"
    s"""adds AS (
  SELECT source, $path AS path, lang, text || ' zzzrefresh update' AS text
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT source, $path || '.new' AS path, lang,
         'qqnovel corpus addition ' || text AS text
  FROM documents WHERE doc_id % 9 = 5),
docsrc AS (
  SELECT doc_id, source, $path AS path, lang, text, doc_id % 4 = 0 AS dead
  FROM documents
  UNION ALL
  SELECT (SELECT max(doc_id) + 1 FROM documents)
           + row_number() OVER (ORDER BY source, path) - 1 AS doc_id,
         source, path, lang, text, FALSE AS dead
  FROM adds)"""
  }

  /** The reference length-step quality function — ONE restatement of
    * IndexBuilder.defaultQuality shared by every oracle that ranks pages
    * (a drifted copy would silently break exactly one gate). */
  private def qualityCaseSql(dl: String): String =
    s"CASE WHEN $dl < 30 THEN 0.05 WHEN $dl < 100 THEN 0.3 WHEN $dl < 300 THEN 0.7 " +
      s"WHEN $dl < 1000 THEN 1.5 WHEN $dl < 3000 THEN 1.0 ELSE 1.2 END"

  /** Shared word-window chunking CTE prefix (q50/q51 oracles) — ONE
    * restatement of TextPipeline.wordWindowChunks (pos//w windows,
    * minChars drop, re-packed indexes) + ChunkSearch.chunkDocId. */
  private def chunkCtesSql(w: Int, minChars: Int, pack: Int): String =
    s"""wt AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS w
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
win AS (
  SELECT doc_id, pos // $w AS widx, string_agg(w, ' ' ORDER BY pos) AS chunk,
         count(*) AS wcnt
  FROM wt GROUP BY doc_id, pos // $w),
chk AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY widx) - 1 AS BIGINT) AS chunk_idx,
         chunk, wcnt
  FROM win WHERE length(chunk) >= $minChars),
chx AS (SELECT doc_id, chunk_idx, doc_id * $pack + chunk_idx AS cid, chunk, wcnt FROM chk)"""

  /** hp(term) = h60(md5) mod P — mirrors graft.ops.Hashing. */
  private def hpSql(c: String): String =
    s"(CAST(('0x' || substring(md5($c), 1, 15)) AS BIGINT) % 2147483647)"
  private def h60Sql(c: String): String =
    s"CAST(('0x' || substring(md5($c), 1, 15)) AS BIGINT)"
  private def uhashSql(h: String, i: Int): String =
    s"(((${31 + 2 * i} * $h) + 1013904223 + ${i * 97}) % 2147483647)"

  /** Full BM25 oracle for one query (mirrors QueryEngine.search exactly).
    * With `fuzzy`, the query-term set is first expanded AUTO-style against
    * the corpus vocabulary (maxd 0/1/2 by length, tlen band + levenshtein —
    * QueryEngine.fuzzyExpand), sub-3-char expansions dropped on re-analysis
    * like the engine's query-side analyzer; scoring is unchanged
    * (searchFuzzy is query-shaping only). */
  /** Delete-semantics knobs (q66/q67 gates, graft.index.Deletes):
    * `excludeWhere` restates the LIVE-tombstone state — stats/df over the
    * full corpus, matching docs excluded from candidates BEFORE top-m
    * selection (the engine skips them at scoring time, so the page is k
    * live docs); `docsWhere` restates the POST-PURGE state — the whole
    * document universe (stats included) restricted to survivors. */
  def bm25Sql(terms: Seq[String], k: Int, diversity: Boolean,
      qid: Option[Int] = None, fuzzy: Boolean = false,
      excludeWhere: Option[String] = None,
      docsWhere: Option[String] = None,
      docsSrcSql: Option[String] = None): String = {
    val sorted = terms.sorted.distinct
    val vals = sorted.map(t => s"('$t')").mkString(",")
    val m = k * 3
    val cap = math.max(1, k / 3)
    val qidSel = qid.map(i => s", CAST($i AS BIGINT) AS qid").getOrElse("")
    val composite = "score DESC, quality DESC, reposcore DESC, doc_id"
    def maxD(t: String): Int =
      if (t.length < 3) 0 else if (t.length <= 5) 1 else 2
    val qCte =
      if (!fuzzy) s"q(term) AS (VALUES $vals)"
      else s"""qd(term, maxd) AS (VALUES ${
        sorted.map(t => s"('$t', ${maxD(t)})").mkString(",")}),
vocab AS (SELECT DISTINCT term FROM toks),
fexp AS (
  SELECT v.term FROM vocab v JOIN qd
    ON abs(length(v.term) - length(qd.term)) <= qd.maxd
   AND levenshtein(v.term, qd.term) <= qd.maxd
  UNION
  SELECT term FROM qd),
q AS (SELECT DISTINCT term FROM fexp WHERE length(term) >= 3)"""
    val liveCl = excludeWhere.map(w => s"WHERE NOT ($w) ").getOrElse("")
    val body = s"""$Toks, $Dl,
-- avgdl over ALL docs (engine stats average dl=0 docs too; avg(dl) from the
-- toks-derived dl CTE would silently skip zero-token docs)
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT CAST(count(*) AS DOUBLE) FROM toks)
                / (SELECT count(*) FROM documents) AS avgdl),
$qCte,
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks WHERE term IN (SELECT term FROM q) GROUP BY term),
tft AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
contrib AS (
  SELECT t.doc_id, t.term,
         ln((st.n - f.df + 0.5) / (f.df + 0.5)) *
         (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))) AS c
  FROM tft t JOIN dft f USING (term) JOIN dl l ON t.doc_id = l.doc_id, st),
sc AS (SELECT doc_id, sum(c ORDER BY term) AS score FROM contrib GROUP BY doc_id),
topm AS (SELECT doc_id, score FROM sc ${liveCl}ORDER BY score DESC, doc_id LIMIT $m),
meta AS (
  SELECT d.doc_id, d.source AS repo,
    ${qualityCaseSql("l.dl")} AS quality,
    CAST(3 + (${h60Sql("d.source")} % 7) AS DOUBLE) / 10.0 AS reposcore
  FROM documents d JOIN dl l USING (doc_id)),
joined AS (SELECT t.doc_id, t.score, m.repo, m.quality, m.reposcore FROM topm t JOIN meta m USING (doc_id))"""
    // post-purge universe: every `documents` reference (tokenization, N,
    // avgdl, metadata) retargets to the survivor CTE — the replace runs on
    // the body only, never on the docsrc definition itself
    val core = (docsSrcSql, docsWhere) match {
      // docsSrcSql: caller-supplied CTE chain ending in `docsrc` — an
      // arbitrary document universe (e.g. the post-upsert old ∪ adds view);
      // its own `FROM documents` references are NOT rewritten
      case (Some(src), _) =>
        s"WITH $src,\n" + body.replace("FROM documents", "FROM docsrc")
      case (None, Some(w)) =>
        s"WITH docsrc AS (SELECT * FROM documents WHERE $w),\n" +
          body.replace("FROM documents", "FROM docsrc")
      case _ => s"WITH $body"
    }
    if (!diversity)
      s"""$core
SELECT CAST(row_number() OVER (ORDER BY $composite) AS BIGINT) AS rnk,
       doc_id, round(score, 6) AS score, repo$qidSel
FROM (SELECT * FROM joined ORDER BY $composite LIMIT $k)"""
    else
      s"""$core,
passed AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY repo ORDER BY $composite) <= $cap
                 THEN 0 ELSE 1 END AS pass FROM joined),
page AS (SELECT * FROM passed ORDER BY pass, $composite LIMIT $k)
SELECT CAST(row_number() OVER (ORDER BY pass, $composite) AS BIGINT) AS rnk,
       doc_id, round(score, 6) AS score, repo$qidSel
FROM page"""
  }

  /** Multi-field BM25 oracle (content^cb + path^pb2 with per-field N/avgdl/
    * df, fixed (field, term) summation order, optional 2-term phrase arm on
    * content) — a from-scratch SQL restatement of QueryEngine's multi-field
    * semantics for the q19 gate. */
  private def bm25FieldsSql(terms: Seq[String], k: Int, cb: Double, pb2: Double,
      phrase: Option[(String, String)], phraseBoost: Double, qid: Int): String = {
    val sorted = terms.sorted.distinct
    val vals = sorted.map(t => s"('$t')").mkString(",")
    val m = k * 3
    val composite = "score DESC, quality DESC, reposcore DESC, doc_id"
    val phraseCtes = phrase.map { case (t0, t1) =>
      s""",
pptoks AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS term
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)),
pnxt AS (SELECT doc_id, term,
         lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1 FROM pptoks),
pocc AS (SELECT doc_id, count(*) AS occ FROM pnxt
         WHERE term = '$t0' AND t1 = '$t1' GROUP BY doc_id),
pidf AS (SELECT min(ln((s.n - f.df + 0.5) / (f.df + 0.5))) AS v
         FROM dft f JOIN st s ON s.field = f.field
         WHERE f.field = 'content' AND f.term IN ('$t0', '$t1')),
ph AS (
  SELECT o.doc_id,
         $phraseBoost * pidf.v *
         (o.occ * (1.2 + 1.0) / (o.occ + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS p
  FROM pocc o
  JOIN fdl l ON l.doc_id = o.doc_id AND l.field = 'content'
  JOIN st s ON s.field = 'content', pidf)"""
    }.getOrElse("")
    val scoredSql = phrase match {
      case Some(_) =>
        "SELECT s.doc_id, s.base + coalesce(ph.p, 0) AS score FROM sc s LEFT JOIN ph ON s.doc_id = ph.doc_id"
      case None => "SELECT doc_id, base AS score FROM sc"
    }
    s"""WITH docs2 AS (
  SELECT doc_id, source,
         lower(source || '/' || lang || '/' || CAST(doc_id AS VARCHAR)) AS path,
         text
  FROM documents),
ftoks AS (
  SELECT doc_id, 'content' AS field,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs2
  UNION ALL
  SELECT doc_id, 'path' AS field,
         unnest(regexp_extract_all(path, '[a-z0-9]+')) AS term FROM docs2),
fdl AS (SELECT doc_id, field, count(*) AS dl FROM ftoks GROUP BY doc_id, field),
st AS (SELECT field, (SELECT count(*) FROM documents) AS n,
              CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS avgdl
       FROM ftoks GROUP BY field),
q(term) AS (VALUES $vals),
dft AS (SELECT field, term, count(DISTINCT doc_id) AS df FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY field, term),
tft AS (SELECT doc_id, field, term, count(*) AS tf FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, field, term),
contrib AS (
  SELECT t.doc_id, t.field, t.term,
         (CASE WHEN t.field = 'content' THEN $cb ELSE $pb2 END) *
         ln((s.n - f.df + 0.5) / (f.df + 0.5)) *
         (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS c
  FROM tft t
  JOIN dft f ON t.field = f.field AND t.term = f.term
  JOIN fdl l ON t.doc_id = l.doc_id AND t.field = l.field
  JOIN st s ON s.field = t.field),
sc AS (SELECT doc_id, sum(c ORDER BY field, term) AS base FROM contrib GROUP BY doc_id)$phraseCtes,
scored AS ($scoredSql),
topm AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT $m),
meta AS (
  SELECT d.doc_id, d.source AS repo,
    ${qualityCaseSql("coalesce(l.dl, 0)")} AS quality,
    CAST(3 + (${h60Sql("d.source")} % 7) AS DOUBLE) / 10.0 AS reposcore
  FROM documents d
  LEFT JOIN (SELECT doc_id, dl FROM fdl WHERE field = 'content') l USING (doc_id)),
joined AS (SELECT t.doc_id, t.score, m.repo, m.quality, m.reposcore
           FROM topm t JOIN meta m USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY $composite) AS BIGINT) AS rnk,
       doc_id, round(score, 6) AS score, repo, CAST($qid AS BIGINT) AS qid
FROM (SELECT * FROM joined ORDER BY $composite LIMIT $k)"""
  }

  /** Chunk-level search oracle (q50): word-window chunking (16-token
    * windows, minChars drop, re-packed indexes) -> per-chunk BM25 with field
    * boost + n-term phrase arm -> top-m -> composite sort + domain diversity
    * -> rank -> parent-document merge where word_count is the CHUNK's
    * (chunk-field precedence) — a from-first-principles SQL restatement of
    * chunksIndex + ChunkSearch.search. */
  private def chunkSearchSql(termsInOrder: Seq[String], k: Int, boost: Double,
      phraseBoost: Double, w: Int = 16, minChars: Int = 50,
      pack: Int = 64): String = {
    val sorted = termsInOrder.sorted.distinct
    val vals = sorted.map(t => s"('$t')").mkString(",")
    val m = k * 3
    val cap = math.max(1, k / 3)
    val composite = "score DESC, quality DESC, reposcore DESC, cid"
    val leadCols = (1 until termsInOrder.length)
      .map(i => s"lead(term, $i) OVER (PARTITION BY cid ORDER BY pos) AS t$i")
      .mkString(", ")
    val adj = (s"term = '${termsInOrder.head}'" +:
      termsInOrder.tail.zipWithIndex.map { case (t, i) => s"t${i + 1} = '$t'" })
      .mkString(" AND ")
    s"""WITH ${chunkCtesSql(w, minChars, pack)},
ctoks AS (
  SELECT cid, generate_subscripts(tk, 1) - 1 AS pos, unnest(tk) AS term
  FROM (SELECT cid, regexp_extract_all(lower(chunk), '[a-z0-9]+') AS tk FROM chx)),
cdl AS (SELECT cid, count(*) AS dl FROM ctoks GROUP BY cid),
st AS (SELECT (SELECT count(*) FROM chx) AS n,
              (SELECT CAST(count(*) AS DOUBLE) FROM ctoks)
                / (SELECT count(*) FROM chx) AS avgdl),
q(term) AS (VALUES $vals),
dft AS (SELECT term, count(DISTINCT cid) AS df FROM ctoks
        WHERE term IN (SELECT term FROM q) GROUP BY term),
tft AS (SELECT cid, term, count(*) AS tf FROM ctoks
        WHERE term IN (SELECT term FROM q) GROUP BY cid, term),
contrib AS (
  SELECT t.cid, t.term,
         $boost * ln((st.n - f.df + 0.5) / (f.df + 0.5)) *
         (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))) AS c
  FROM tft t JOIN dft f USING (term) JOIN cdl l ON t.cid = l.cid, st),
base AS (SELECT cid, sum(c ORDER BY term) AS bscore FROM contrib GROUP BY cid),
pn AS (SELECT cid, term, $leadCols FROM ctoks),
pocc AS (SELECT cid, count(*) AS occ FROM pn WHERE $adj GROUP BY cid),
pidf AS (SELECT min(ln((st.n - f.df + 0.5) / (f.df + 0.5))) AS v FROM dft f, st),
ph AS (SELECT o.cid,
         $phraseBoost * pidf.v *
         (o.occ * (1.2 + 1.0) / (o.occ + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))) AS p
       FROM pocc o JOIN cdl l ON o.cid = l.cid, st, pidf),
sc AS (SELECT b.cid, b.bscore + coalesce(ph.p, 0) AS score
       FROM base b LEFT JOIN ph ON b.cid = ph.cid),
topm AS (SELECT cid, score FROM sc ORDER BY score DESC, cid LIMIT $m),
meta AS (
  SELECT c.cid, d.source AS repo,
    ${qualityCaseSql("l.dl")} AS quality,
    CAST(3 + (${h60Sql("d.source")} % 7) AS DOUBLE) / 10.0 AS reposcore
  FROM chx c JOIN documents d USING (doc_id) JOIN cdl l ON c.cid = l.cid),
joined AS (SELECT t.cid, t.score, m.repo, m.quality, m.reposcore
           FROM topm t JOIN meta m USING (cid)),
passed AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY repo ORDER BY $composite) <= $cap
                 THEN 0 ELSE 1 END AS pass FROM joined),
page AS (SELECT * FROM passed ORDER BY pass, $composite LIMIT $k),
ranked AS (SELECT CAST(row_number() OVER (ORDER BY pass, $composite) AS BIGINT) AS rnk,
                  cid, score FROM page)
SELECT r.rnk, c.doc_id, c.chunk_idx, round(r.score, 6) AS score,
       round(r.score, 6) AS chunk_score, d.source AS domain, d.lang,
       d.n_chars, CAST(c.wcnt AS BIGINT) AS word_count
FROM ranked r JOIN chx c USING (cid) JOIN documents d USING (doc_id)"""
  }

  /** F7 web-noise oracle (q54): every arm of contains_web_noise restated in
    * SQL, pattern lists generated from NoiseFilters (one source of truth).
    * Occurrence counts are replace-deltas; the uppercase-window count is
    * per-run (a run of L non-lowercase chars has L-2 length-3 windows). */
  private def webNoiseSql: String = {
    import graft.pipeline.NoiseFilters._
    def containsAny(c: String, pats: Seq[String]): String =
      pats.map(p => s"contains($c, '$p')").mkString("(", " OR ", ")")
    val noiseCount = InterfaceNoise
      .map(p => s"(length(tl) - length(replace(tl, '$p', ''))) // ${p.length}")
      .mkString(" + ")
    val navWords = LinkIndicators
      .map(p => s"((length(tl) - length(replace(tl, '$p', ''))) // ${p.length}) * ${p.split(" ").length}")
      .mkString(" + ")
    s"""WITH noisy AS (
  SELECT doc_id,
    CASE doc_id % 8
      WHEN 0 THEN text || ' display:inline'
      WHEN 1 THEN text || ' &nbsp;'
      WHEN 2 THEN text || ' [1.0][2.1][3.4][4][5][6]'
      WHEN 3 THEN text || repeat(' talk contribs', 100)
      WHEN 4 THEN text || ' ' || repeat(':;', 15)
      WHEN 5 THEN text || ' ' || repeat('X', 100)
      ELSE text END AS t
  FROM documents),
f AS (
  SELECT doc_id, t, lower(t) AS tl,
    length(regexp_split_to_array(trim(t), '\\s+')) AS wc,
    length(t) - length(replace(replace(t, ':', ''), ';', '')) AS css_chars,
    length(t) - length(replace(replace(t, '[', ''), ']', '')) AS brackets,
    coalesce(list_sum(list_transform(regexp_extract_all(t, '[^\\p{Ll}]+'),
      r -> greatest(length(r) - 2, 0))), 0) AS up_windows
  FROM noisy),
g AS (
  SELECT doc_id, t, tl, wc, css_chars, brackets, up_windows,
    $noiseCount AS noise_count,
    $navWords AS nav_words
  FROM f)
SELECT doc_id, CAST(
  ${containsAny("t", Entities)} OR
  ${containsAny("t", CssPatterns)} OR
  ${containsAny("t", MediaWiki)} OR
  ${containsAny("t", JsonRemnants)} OR
  (wc > 0 AND CAST(noise_count AS DOUBLE) / wc > 0.2) OR
  (css_chars > 20 AND length(t) > 500 AND
    CAST(css_chars AS DOUBLE) / length(t) > 0.01) OR
  (brackets > 10) OR
  (up_windows > wc // 4) OR
  (${containsAny("tl", LinkIndicators)} AND wc > 0 AND
    CAST(nav_words AS DOUBLE) / wc > 0.3)
  AS BIGINT) AS noise
FROM g"""
  }

  /** Fallback oracle (q53): relaxed 2-field BM25 (path^2.0 + content^1.0)
    * UNION the wildcard arm (paths containing the lowercased query string,
    * docId-ordered, page-bounded, epsilon score 0.1), max score per doc —
    * mirrors QueryEngine.fallback exactly. */
  private def fallbackSql(termsInOrder: Seq[String], needle: String, qid: Int,
      k: Int = 10, overfetch: Int = 3): String = {
    val sorted = termsInOrder.sorted.distinct
    val vals = sorted.map(t => s"('$t')").mkString(",")
    val lim = k * overfetch
    s"""WITH docs2 AS (
  SELECT doc_id,
         lower(source || '/' || lang || '/' || CAST(doc_id AS VARCHAR)) AS path,
         text
  FROM documents),
ftoks AS (
  SELECT doc_id, 'content' AS field,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs2
  UNION ALL
  SELECT doc_id, 'path' AS field,
         unnest(regexp_extract_all(path, '[a-z0-9]+')) AS term FROM docs2),
fdl AS (SELECT doc_id, field, count(*) AS dl FROM ftoks GROUP BY doc_id, field),
st AS (SELECT field, (SELECT count(*) FROM documents) AS n,
              CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS avgdl
       FROM ftoks GROUP BY field),
q(term) AS (VALUES $vals),
dft AS (SELECT field, term, count(DISTINCT doc_id) AS df FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY field, term),
tft AS (SELECT doc_id, field, term, count(*) AS tf FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY doc_id, field, term),
contrib AS (
  SELECT t.doc_id, t.field, t.term,
         (CASE WHEN t.field = 'path' THEN 2.0 ELSE 1.0 END) *
         ln((s.n - f.df + 0.5) / (f.df + 0.5)) *
         (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS c
  FROM tft t
  JOIN dft f ON t.field = f.field AND t.term = f.term
  JOIN fdl l ON t.doc_id = l.doc_id AND t.field = l.field
  JOIN st s ON s.field = t.field),
sc AS (SELECT doc_id, sum(c ORDER BY field, term) AS score FROM contrib GROUP BY doc_id),
wild AS (SELECT doc_id, 0.1 AS score FROM docs2
         WHERE path LIKE '%$needle%' ORDER BY doc_id LIMIT $lim),
uni AS (SELECT * FROM sc UNION ALL SELECT * FROM wild),
best AS (SELECT doc_id, max(score) AS score FROM uni GROUP BY doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
       doc_id, round(score, 6) AS score, CAST($qid AS BIGINT) AS qid
FROM (SELECT * FROM best ORDER BY score DESC, doc_id LIMIT $k)"""
  }

  /** Reference primary-query oracle (q51): the q50 chunking restated, then
    * FOUR per-field BM25 stat sets (content = the chunk text; title/
    * headings/keywords = deterministic word-windows of the parent text,
    * duplicated per chunk like the reference's chunk mapping) summed in
    * ascending (field, term) order at the reference's exact boosts, plus
    * the optional n-term match_phrase arm on content. */
  private def refQuerySql(termsInOrder: Seq[String], k: Int,
      phraseBoost: Double, qid: Int, w: Int = 16, minChars: Int = 50,
      pack: Int = 64): String = {
    val sorted = termsInOrder.sorted.distinct
    val vals = sorted.map(t => s"('$t')").mkString(",")
    val m = k * 3
    val composite = "score DESC, quality DESC, reposcore DESC, cid"
    val leadCols = (1 until termsInOrder.length)
      .map(i => s"lead(term, $i) OVER (PARTITION BY cid ORDER BY pos) AS t$i")
      .mkString(", ")
    val adj = (s"term = '${termsInOrder.head}'" +:
      termsInOrder.tail.zipWithIndex.map { case (t, i) => s"t${i + 1} = '$t'" })
      .mkString(" AND ")
    val phraseCtes = if (phraseBoost == 0.0) "" else s""",
pn AS (SELECT cid, term, $leadCols FROM ctoks),
pocc AS (SELECT cid, count(*) AS occ FROM pn WHERE $adj GROUP BY cid),
pidf AS (SELECT min(ln((s.n - f.df + 0.5) / (f.df + 0.5))) AS v
         FROM dft f JOIN st s ON s.field = f.field WHERE f.field = 'content'),
ph AS (SELECT o.cid,
         $phraseBoost * pidf.v *
         (o.occ * (1.2 + 1.0) / (o.occ + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS p
       FROM pocc o
       JOIN fdl l ON l.cid = o.cid AND l.field = 'content'
       JOIN st s ON s.field = 'content', pidf)"""
    val scSql =
      if (phraseBoost == 0.0) "SELECT cid, bscore AS score FROM base"
      else "SELECT b.cid, b.bscore + coalesce(ph.p, 0) AS score FROM base b LEFT JOIN ph ON b.cid = ph.cid"
    s"""WITH ${chunkCtesSql(w, minChars, pack)},
pmeta AS (
  SELECT doc_id, array_to_string(ws[1:6], ' ') AS title,
         array_to_string(ws[7:12], ' ') AS headings,
         array_to_string(ws[13:15], ' ') AS kw
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
ctoks AS (
  SELECT cid, generate_subscripts(tk, 1) - 1 AS pos, unnest(tk) AS term
  FROM (SELECT cid, regexp_extract_all(lower(chunk), '[a-z0-9]+') AS tk FROM chx)),
ftoks AS (
  SELECT cid, 'content' AS field, term FROM ctoks
  UNION ALL
  SELECT c.cid, 'title' AS field,
         unnest(regexp_extract_all(lower(p.title), '[a-z0-9]+')) AS term
  FROM chx c JOIN pmeta p USING (doc_id)
  UNION ALL
  SELECT c.cid, 'headings' AS field,
         unnest(regexp_extract_all(lower(p.headings), '[a-z0-9]+')) AS term
  FROM chx c JOIN pmeta p USING (doc_id)
  UNION ALL
  SELECT c.cid, 'keywords' AS field,
         unnest(regexp_extract_all(lower(p.kw), '[a-z0-9]+')) AS term
  FROM chx c JOIN pmeta p USING (doc_id)),
fdl AS (SELECT cid, field, count(*) AS dl FROM ftoks GROUP BY cid, field),
st AS (SELECT field, (SELECT count(*) FROM chx) AS n,
              CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM chx) AS avgdl
       FROM ftoks GROUP BY field),
q(term) AS (VALUES $vals),
dft AS (SELECT field, term, count(DISTINCT cid) AS df FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY field, term),
tft AS (SELECT cid, field, term, count(*) AS tf FROM ftoks
        WHERE term IN (SELECT term FROM q) GROUP BY cid, field, term),
contrib AS (
  SELECT t.cid, t.field, t.term,
         (CASE t.field WHEN 'content' THEN 1.5 WHEN 'title' THEN 2.5
               WHEN 'keywords' THEN 2.0 ELSE 3.0 END) *
         ln((s.n - f.df + 0.5) / (f.df + 0.5)) *
         (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))) AS c
  FROM tft t
  JOIN dft f ON t.field = f.field AND t.term = f.term
  JOIN fdl l ON t.cid = l.cid AND t.field = l.field
  JOIN st s ON s.field = t.field),
base AS (SELECT cid, sum(c ORDER BY field, term) AS bscore FROM contrib GROUP BY cid)$phraseCtes,
sc AS ($scSql),
topm AS (SELECT cid, score FROM sc ORDER BY score DESC, cid LIMIT $m),
meta AS (
  SELECT c.cid, d.source AS repo,
    ${qualityCaseSql("coalesce(l.dl, 0)")} AS quality,
    CAST(3 + (${h60Sql("d.source")} % 7) AS DOUBLE) / 10.0 AS reposcore
  FROM chx c JOIN documents d USING (doc_id)
  LEFT JOIN (SELECT cid, dl FROM fdl WHERE field = 'content') l USING (cid)),
joined AS (SELECT t.cid, t.score, m.repo, m.quality, m.reposcore
           FROM topm t JOIN meta m USING (cid))
SELECT CAST(row_number() OVER (ORDER BY $composite) AS BIGINT) AS rnk,
       cid // $pack AS doc_id, cid % $pack AS chunk_idx,
       round(score, 6) AS score, repo AS domain, CAST($qid AS BIGINT) AS qid
FROM (SELECT * FROM joined ORDER BY $composite LIMIT $k)"""
  }

  private val metaSqlWidth =
    "64 + (((CAST(('0x' || substring(md5(text), 1, 2)) AS BIGINT) * 16) | (CAST(('0x' || substring(md5(text), 3, 2)) AS BIGINT) // 16)) % 1856)"
  private val metaSqlHeight =
    "64 + (((CAST(('0x' || substring(md5(text), 5, 2)) AS BIGINT) * 16) | (CAST(('0x' || substring(md5(text), 7, 2)) AS BIGINT) // 16)) % 1016)"
  private val metaSqlFrames =
    "1 + (CAST(('0x' || substring(md5(text), 9, 2)) AS BIGINT) % 64)"

  private def cosSql(xs: String, ys: String): String =
    s"sum(CAST($xs AS DOUBLE) * CAST($ys AS DOUBLE) ORDER BY i)"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        round(avg(l_discount), 6) AS avg_disc,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q02_revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""",
    "q03_top_customers" ->
      """SELECT c_custkey, c_name, revenue, n_orders FROM (
          SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
          FROM orders GROUP BY o_custkey) r
        JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, c_custkey LIMIT 10""",
    "q04_order_ranks" ->
      """SELECT o_custkey, o_orderkey, rnk, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
          FROM orders) WHERE rnk <= 3""",
    "q05_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        event_type, count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2""",

    "q10_index_stats" ->
      s"""WITH $Toks
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               round((SELECT CAST(count(*) AS DOUBLE) FROM toks)
                 / (SELECT count(*) FROM documents), 6) AS avgdl,
               count(DISTINCT term) AS vocab,
               count(DISTINCT (doc_id, term)) AS postings
        FROM toks""",
    "q11_term_df" ->
      s"""WITH $Toks
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
        FROM toks GROUP BY term ORDER BY df DESC, term LIMIT 20""",
    "q12_postings" ->
      s"""WITH $Toks, $Dl
        SELECT term, toks.doc_id AS doc_id, count(*) AS tf, CAST(min(dl.dl) AS BIGINT) AS dl
        FROM toks JOIN dl ON toks.doc_id = dl.doc_id
        WHERE term IN ('spark','merge','window','batch','query')
        GROUP BY term, toks.doc_id""",
    "q72_incremental_dict" ->
      s"""WITH $Toks
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
        FROM toks GROUP BY term""",
    "q13_bm25_topk" -> bm25Sql(Seq("spark", "merge", "join"), 10, diversity = false),
    "q14_bm25_wand" -> bm25Sql(Seq("window", "scan", "filter"), 10, diversity = false),
    // same from-first-principles BM25 restatement — the Spark side answers
    // through the build->resume->resume->compact lifecycle index, so a hash
    // match proves compaction preserved every df/tf/dl the scorer sees
    "q63_compaction" -> bm25Sql(Seq("merge", "scan", "table"), 10, diversity = false),
    "q68_upsert_search" -> bm25Sql(Seq("zzzrefresh", "qqnovel", "merge"), 10,
      diversity = false, docsSrcSql = Some(UpsertSrcSql),
      excludeWhere = Some("doc_id IN (SELECT doc_id FROM docsrc WHERE dead)")),
    "q69_upsert_view" -> s"""WITH $UpsertSrcSql,
toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docsrc),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id)
SELECT d.doc_id, d.source AS repo, d.path, COALESCE(l.dl, CAST(0 AS BIGINT)) AS dl
FROM docsrc d LEFT JOIN dl l USING (doc_id)
WHERE NOT d.dead""",
    "q70_keymap" -> s"""WITH $UpsertSrcSql
SELECT source AS repo, path, doc_id, sha256(text) AS sha
FROM docsrc WHERE NOT dead""",
    "q66_deletes_live" -> bm25Sql(Seq("spark", "merge", "join"), 10,
      diversity = false, excludeWhere = Some("doc_id % 7 = 3")),
    "q71_snapshot_bm25" -> bm25Sql(Seq("sort", "group", "data"), 10,
      diversity = false, docsWhere = Some("doc_id % 5 <> 2")),
    "q67_deletes_purge" -> bm25Sql(Seq("window", "scan", "filter"), 10,
      diversity = false, docsWhere = Some("doc_id % 7 <> 3")),
    "q15_bm25_multi" -> Seq(
        ("sort table", 0), ("group data row", 1), ("slow filter", 2))
      .map { case (q, i) =>
        s"SELECT * FROM (${bm25Sql(q.split(" ").toSeq, 5, diversity = false, qid = Some(i))})"
      }.mkString("\nUNION ALL\n"),
    "q17_bm25_diversity" -> bm25Sql(Seq("spark", "merge", "join"), 9, diversity = true),
    "q19_bm25_fields" -> Seq(
        bm25FieldsSql(Seq("src12", "merge", "join"), 10, cb = 1.5, pb2 = 2.5,
          phrase = None, phraseBoost = 0.0, qid = 0),
        bm25FieldsSql(Seq("merge", "join"), 10, cb = 1.5, pb2 = 2.5,
          phrase = Some(("merge", "join")), phraseBoost = 2.0, qid = 1))
      .map(q => s"SELECT * FROM ($q)").mkString("\nUNION ALL\n"),
    "q50_chunk_search" -> chunkSearchSql(Seq("spark", "merge", "join"),
      k = 10, boost = 1.5, phraseBoost = 2.0),
    "q61_lifecycle" ->
      bm25Sql(Seq("python", "merge", "join"), 9, diversity = true),
    "q65_langdetect" -> {
      val langsAsc = graft.ops.TextAnalysis.LatinMarkers.map(_._1)
      val hitCols = graft.ops.TextAnalysis.LatinMarkers.map { case (l, ms) =>
        val list = ms.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(toks, t -> list_contains([$list], t))) AS h_$l"
      }.mkString(",\n          ")
      val mx = s"greatest(${langsAsc.map(l => s"h_$l").mkString(", ")})"
      val firstMax = langsAsc.map(l => s"WHEN h_$l = mx THEN '$l'").mkString(" ")
      s"""WITH base AS (
        SELECT doc_id, text,
          CASE WHEN doc_id % 7 = 5 THEN '<html lang="fr"> ' || text
               ELSE text END AS text2,
          CASE WHEN doc_id % 7 = 0 THEN 'https://en.docs.xyz/a'
               WHEN doc_id % 7 = 1 THEN 'https://de.docs.xyz/a'
               WHEN doc_id % 7 = 2 THEN 'https://blog.github.xyz/a'
               WHEN doc_id % 7 = 3 THEN 'https://docs.xyz/en/a'
               WHEN doc_id % 7 = 4 THEN 'https://docs.example.com/a'
               ELSE 'https://docs.xyz/x' END AS url
        FROM documents),
      -- URL arm verdict (en / non-en / null) in the reference's order
      urlv AS (
        SELECT *, CASE
          WHEN starts_with(dom, 'en.') OR starts_with(dom, 'english.') THEN 'en'
          WHEN starts_with(dom, 'de.') OR starts_with(dom, 'es.')
            OR starts_with(dom, 'fr.') THEN 'non-en'
          WHEN contains(dom, 'github') OR contains(dom, 'google')
            OR contains(dom, 'wikipedia') THEN 'en'
          WHEN contains(pth, '/en/') OR contains(pth, '/english/') THEN 'en'
          WHEN contains(pth, '/de/') OR contains(pth, '/es/')
            OR contains(pth, '/fr/') THEN 'non-en'
          WHEN list_contains(['com','org','net','edu','gov','www','en'],
            dom_tld) THEN 'en'
          ELSE NULL END AS url_lang
        FROM (SELECT *,
          lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS dom,
          lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)) AS pth,
          list_extract(string_split(lower(regexp_extract(url,
            '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)), '.'), -1) AS dom_tld
          FROM base)),
      -- lang= attribute arm (first occurrence, 2-char code)
      attr AS (
        SELECT *, CASE WHEN length(lv) >= 2 THEN lower(substr(lv, 1, 2))
                       ELSE NULL END AS attr_lang
        FROM (SELECT *, regexp_extract(text2, 'lang="([^"]*)', 1) AS lv
              FROM urlv)),
      -- content arm: clean (drop http words, first 1000 chars), tokenize on
      -- non-letters, marker scoring, conf = top/total > 0.7
      content AS (
        SELECT doc_id, $hitCols
        FROM (SELECT doc_id,
          list_filter(string_split_regex(lower(substr(array_to_string(
            list_filter(string_split_regex(text2, '\\s+'),
              w -> len(w) > 0 AND NOT starts_with(w, 'http://')
                   AND NOT starts_with(w, 'https://')), ' '), 1, 1000)),
            '[^\\p{L}]+'), t -> len(t) > 0) AS toks
          FROM attr)),
      scoredc AS (
        SELECT doc_id,
          CASE WHEN tot > 0 AND CAST(mx AS DOUBLE) / tot > 0.7
               THEN (CASE $firstMax END) ELSE NULL END AS content_lang
        FROM (SELECT doc_id, $mx AS mx,
                (${langsAsc.map(l => s"h_$l").mkString(" + ")}) AS tot, *
              FROM content)),
      final AS (
        SELECT a.doc_id,
          CASE WHEN length(trim(a.text2)) = 0 THEN NULL
               WHEN a.url_lang = 'en' THEN 'en'
               ELSE COALESCE(a.attr_lang, c.content_lang) END AS lang
        FROM attr a JOIN scoredc c USING (doc_id))
      SELECT doc_id, lang, COALESCE(lang = 'en', false) AS is_en FROM final"""
    },
    "q64_preview" -> {
      // _truncate_smartly restated inline (no DuckDB macros in a single
      // SELECT): <=300 pass-through, else hard cut + ellipsis
      def ts(x: String) =
        s"CASE WHEN length($x) <= 300 THEN $x ELSE substr($x, 1, 297) || '...' END"
      s"""WITH base AS (
        SELECT doc_id, text, replace(text, ' merge ', '. ') AS chunk
        FROM documents),
      arms AS (
        SELECT doc_id, chunk,
          trim(CASE WHEN doc_id % 6 = 0 THEN substr(chunk, 1, 400)
               WHEN doc_id % 6 = 3 THEN substr(text, 1, 120)
               WHEN doc_id % 6 = 5 THEN NULL
               WHEN doc_id % 3 = 1 THEN 'short'
               ELSE '' END) AS d,
          trim(CASE WHEN doc_id % 5 = 0 THEN substr(text, 30, 180)
               ELSE '' END) AS sd
        FROM base),
      armed AS (
        SELECT *, CASE WHEN d IS NOT NULL AND length(d) > 30 THEN 1
                       WHEN length(sd) > 50 THEN 2
                       ELSE 3 END AS arm
        FROM arms),
      -- arm 1: sentence-boundary truncation with BREAK semantics — include
      -- the maximal '.'-sentence prefix where each step keeps the running
      -- preview under 290 chars (prefix sums + first-failure cut)
      sent1 AS (
        SELECT doc_id, generate_subscripts(parts, 1) AS i, unnest(parts) AS s
        FROM (SELECT doc_id, string_split(d, '.') AS parts
              FROM armed WHERE arm = 1)),
      run1 AS (
        SELECT doc_id, i, s,
          COALESCE(SUM(length(s) + 1) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevlen
        FROM sent1),
      cut1 AS (
        SELECT doc_id,
          MIN(CASE WHEN prevlen + length(s) >= 290 THEN i END) AS cut
        FROM run1 GROUP BY doc_id),
      prev1 AS (
        SELECT r.doc_id, string_agg(r.s || '.', '' ORDER BY r.i) AS preview
        FROM run1 r LEFT JOIN cut1 c USING (doc_id)
        WHERE c.cut IS NULL OR r.i < c.cut
        GROUP BY r.doc_id),
      arm1 AS (
        SELECT a.doc_id,
          CASE WHEN length(a.d) <= 300 THEN a.d
               ELSE COALESCE(p.preview, '') ||
                 CASE WHEN length(a.d) > length(COALESCE(p.preview, ''))
                      THEN '...' ELSE '' END END AS preview
        FROM armed a LEFT JOIN prev1 p USING (doc_id) WHERE a.arm = 1),
      arm2 AS (
        SELECT doc_id, ${ts("sd")} AS preview FROM armed WHERE arm = 2),
      -- arm 3: earliest strictly-best sentence by query-term containment
      -- (query 'data spark window'; stripped sentences < 20 chars skipped)
      sent3 AS (
        SELECT doc_id, i, trim(s) AS s FROM (
          SELECT doc_id, generate_subscripts(parts, 1) AS i,
                 unnest(parts) AS s
          FROM (SELECT doc_id, string_split(chunk, '.') AS parts
                FROM armed WHERE arm = 3))),
      scored AS (
        SELECT doc_id, i, s,
          CASE WHEN length(s) < 20 THEN 0 ELSE
            (CASE WHEN contains(lower(s), 'data') THEN 1 ELSE 0 END +
             CASE WHEN contains(lower(s), 'spark') THEN 1 ELSE 0 END +
             CASE WHEN contains(lower(s), 'window') THEN 1 ELSE 0 END)
          END AS score
        FROM sent3),
      best3 AS (
        SELECT doc_id, s FROM (
          SELECT doc_id, s, score, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, i ASC) AS rk
          FROM scored) WHERE rk = 1 AND score > 0),
      arm3 AS (
        SELECT a.doc_id,
          CASE WHEN a.chunk IS NULL OR length(a.chunk) = 0 THEN ''
               WHEN b.s IS NOT NULL THEN ${ts("b.s || '.'")}
               ELSE ${ts("a.chunk")} END AS preview
        FROM armed a LEFT JOIN best3 b USING (doc_id) WHERE a.arm = 3)
      SELECT doc_id, preview FROM arm1
      UNION ALL SELECT doc_id, preview FROM arm2
      UNION ALL SELECT doc_id, preview FROM arm3"""
    },
    "q62_highlight" ->
      """WITH h AS (
        SELECT doc_id, text,
          CASE doc_id % 3 WHEN 0 THEN 'merge' WHEN 1 THEN 'window'
            ELSE 'zzznotfound' END AS term
        FROM documents),
      p AS (SELECT doc_id, text, strpos(lower(text), lower(term)) AS pos FROM h)
      SELECT doc_id,
        CASE WHEN pos = 0 THEN substring(text, 1, 300)
             ELSE (CASE WHEN greatest(pos - 100, 1) > 1 THEN '...' ELSE '' END)
                  || substring(text, greatest(pos - 100, 1), 400) || '...'
        END AS excerpt
      FROM p""",
    "q59_domain_analysis" -> {
      // score SQL generated from the SAME maps as Scoring.domainScore
      val exact = graft.pipeline.Scoring.DomainScores.toSeq.sorted
        .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
      val tld = graft.pipeline.Scoring.TldScores.toSeq.sorted
        .map { case (k, v) => s"WHEN ends_with(domain, '$k') THEN $v" }
        .mkString(" ")
      s"""WITH dd AS (
        SELECT CASE doc_id % 6
          WHEN 0 THEN 'github.com' WHEN 1 THEN 'wikipedia.org'
          WHEN 2 THEN 'medium.com' WHEN 3 THEN source || '.edu'
          WHEN 4 THEN source || '.net' ELSE source || '.example' END AS domain
        FROM documents),
      top AS (SELECT domain, count(*) AS n FROM dd GROUP BY domain
              ORDER BY n DESC, domain LIMIT 10)
      SELECT domain, n,
        CAST(coalesce(CASE domain $exact END, CASE $tld ELSE 0.3 END) >= 0.8
          AS BIGINT) AS authoritative
      FROM top"""
    },
    "q60_authority" ->
      """WITH a AS (
        SELECT lower(text || CASE doc_id % 5
          WHEN 0 THEN ' official documentation here'
          WHEN 1 THEN ' written by a professor'
          WHEN 2 THEN ' discussed on stack overflow and github community'
          WHEN 3 THEN ' peer reviewed journal study'
          ELSE '' END) AS t
        FROM documents)
      SELECT
        CAST(sum(CASE WHEN regexp_matches(t, 'official documentation|docs\.') THEN 1 ELSE 0 END) AS BIGINT) AS official_docs,
        CAST(sum(CASE WHEN regexp_matches(t, '\bphd|professor|researcher\b') THEN 1 ELSE 0 END) AS BIGINT) AS expert,
        CAST(sum(CASE WHEN regexp_matches(t, 'stack overflow|github|community') THEN 1 ELSE 0 END) AS BIGINT) AS community,
        CAST(sum(CASE WHEN regexp_matches(t, '\bjournal|study|peer.reviewed\b') THEN 1 ELSE 0 END) AS BIGINT) AS academic
      FROM a""",
    "q55_quality_dist" ->
      """SELECT CAST(sum(CASE WHEN q >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS high,
               CAST(sum(CASE WHEN q >= 0.5 AND q < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS medium,
               CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS low,
               round(avg(q), 6) AS avg_q, round(max(q), 6) AS max_q,
               round(min(q), 6) AS min_q
        FROM (SELECT n_chars / 1000.0 AS q FROM documents)""",
    "q56_topic_clusters" ->
      """WITH sel AS (SELECT text FROM documents WHERE doc_id % 50 = 0),
        n AS (SELECT count(*) AS n FROM sel),
        tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM sel),
        f AS (SELECT w, count(*) AS cnt FROM tk WHERE length(w) >= 4
              GROUP BY w HAVING count(*) >= 2)
        SELECT w, cnt, round(CAST(cnt AS DOUBLE) / n.n, 6) AS relevance
        FROM f, n ORDER BY cnt DESC, w LIMIT 5""",
    "q57_freshness" ->
      """WITH y AS (
          SELECT doc_id, list_max(list_filter(list_transform(
            regexp_extract_all(t, '\b(19|20)\d{2}\b'),
            x -> CAST(x AS INTEGER)), v -> v BETWEEN 1900 AND 2026)) AS max_year
          FROM (SELECT doc_id, text || CASE doc_id % 5
            WHEN 0 THEN ' published 2025' WHEN 1 THEN ' from 2021 and 2023'
            WHEN 2 THEN ' revised 2019' WHEN 3 THEN ' archive 1999'
            ELSE '' END AS t FROM documents))
        SELECT doc_id, max_year,
          CASE WHEN max_year IS NULL THEN 'unknown'
               WHEN max_year >= 2024 THEN 'very_recent'
               WHEN max_year >= 2022 THEN 'recent'
               WHEN max_year >= 2018 THEN 'older'
               ELSE 'outdated' END AS freshness
        FROM y""",
    "q58_date_range" ->
      """SELECT strftime(min(ts), '%Y-%m-%d') AS earliest,
               strftime(max(ts), '%Y-%m-%d') AS latest,
               date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS span_days,
               count(ts) AS dated_results
        FROM events""",
    "q54_web_noise" -> webNoiseSql,
    "q53_fallback" -> Seq(
        fallbackSql(Seq("src3"), "src3", qid = 0),
        fallbackSql(Seq("merge", "src5"), "merge src5", qid = 1),
        fallbackSql(Seq("rc3"), "rc3", qid = 2))
      .map(q => s"SELECT * FROM ($q)").mkString("\nUNION ALL\n"),
    "q52_fuzzy" -> Seq(
        bm25Sql(Seq("spak", "mege"), 10, diversity = false, qid = Some(0),
          fuzzy = true),
        bm25Sql(Seq("windoww", "tble"), 10, diversity = false, qid = Some(1),
          fuzzy = true))
      .map(q => s"SELECT * FROM ($q)").mkString("\nUNION ALL\n"),
    "q51_reference_query" -> Seq(
        refQuerySql(Seq("spark", "merge", "join"), 10, phraseBoost = 2.0, qid = 0),
        refQuerySql(Seq("window", "scan", "fast"), 10, phraseBoost = 0.0, qid = 1))
      .map(q => s"SELECT * FROM ($q)").mkString("\nUNION ALL\n"),
    "q18_phrase_engine" ->
      s"""WITH $ToksPos,
        nxt AS (SELECT doc_id, term,
                lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM ptoks)
        SELECT doc_id, count(*) AS occurrences FROM nxt
        WHERE term = 'merge' AND nxt = 'join' GROUP BY doc_id""",
    "q16_phrase_count" ->
      s"""WITH $ToksPos,
        nxt AS (SELECT doc_id, term,
                lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM ptoks)
        SELECT doc_id, count(*) AS occurrences FROM nxt
        WHERE term = 'merge' AND nxt = 'join' GROUP BY doc_id""",

    "q20_dedup_exact" ->
      """WITH sigs AS (
          SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS sig
          FROM documents)
        SELECT doc_id, sig,
               count(*) OVER (PARTITION BY sig) AS group_size,
               CAST(CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY sig)
                    THEN 1 ELSE 0 END AS INT) AS is_dup
        FROM sigs""",
    "q21_minhash_sig" -> {
      val h = hpSql("term")
      s"""WITH dtoks AS (
          SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents WHERE doc_id % 10 = 0)
        SELECT doc_id,
          ${(0 until 4).map(i => s"min(${uhashSql(h, i)}) AS mh_$i").mkString(",\n          ")}
        FROM dtoks GROUP BY doc_id"""
    },
    "q22_lsh_pairs" -> {
      val h = hpSql("term")
      s"""WITH dtoks AS (
          SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents WHERE doc_id % 10 = 0),
        sigs AS (
          SELECT doc_id,
            ${(0 until 4).map(i => s"min(${uhashSql(h, i)}) AS mh_$i").mkString(",\n            ")}
          FROM dtoks GROUP BY doc_id)
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND
          ((a.mh_0 = b.mh_0 AND a.mh_1 = b.mh_1) OR (a.mh_2 = b.mh_2 AND a.mh_3 = b.mh_3))"""
    },
    "q23_simhash" -> {
      s"""WITH tfs AS (
          SELECT doc_id, term, count(*) AS w FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents WHERE doc_id % 10 = 0) GROUP BY doc_id, term),
        hs AS (SELECT doc_id, w, ${h60Sql("term")} AS h FROM tfs),
        bitsums AS (
          SELECT doc_id, j,
            sum(CASE WHEN ((h >> CAST(j AS INT)) & 1) = 1 THEN w ELSE -w END) AS s
          FROM hs, generate_series(0, 19) AS g(j) GROUP BY doc_id, j)
        SELECT doc_id,
          CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bitsums GROUP BY doc_id"""
    },
    "q35_simhash_pairs" ->
      s"""WITH tfs AS (
          SELECT doc_id, term, count(*) AS w FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
            FROM documents WHERE doc_id % 10 = 0) GROUP BY doc_id, term),
        hs AS (SELECT doc_id, w, ${h60Sql("term")} AS h FROM tfs),
        bitsums AS (
          SELECT doc_id, j,
            sum(CASE WHEN ((h >> CAST(j AS INT)) & 1) = 1 THEN w ELSE -w END) AS s
          FROM hs, generate_series(0, 19) AS g(j) GROUP BY doc_id, j),
        fps AS (
          SELECT doc_id,
            CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END) AS BIGINT) AS sh
          FROM bitsums GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS dist
        FROM fps a JOIN fps b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 6""",
    "q24_ngram_pairs" ->
      s"""WITH sample AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
          UNION ALL
          SELECT doc_id + 1000000000, text || ' graft twin probe tail'
          FROM documents WHERE doc_id % 100 = 0),
        ptoks AS (
          SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS term
          FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM sample)),
        grams AS (
          SELECT doc_id, term, lead(term, 1) OVER w AS t1, lead(term, 2) OVER w AS t2
          FROM ptoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        sh0 AS (SELECT DISTINCT doc_id, term || ' ' || t1 || ' ' || t2 AS shingle
               FROM grams WHERE t2 IS NOT NULL),
        keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 50),
        sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5""",
    "q25_langid" -> {
      val markers = TextAnalysis.LangMarkers
        .map { case (l, m) => s"('$l','$m')" }.mkString(",")
      s"""WITH $Toks, $Dl,
        markers(cand_lang, marker) AS (VALUES $markers),
        hits AS (
          SELECT toks.doc_id, cand_lang, count(*) AS hits
          FROM toks JOIN markers ON term = marker GROUP BY toks.doc_id, cand_lang),
        scored AS (
          SELECT h.doc_id, cand_lang, CAST(hits AS DOUBLE) / dl.dl AS score
          FROM hits h JOIN dl ON h.doc_id = dl.doc_id)
        SELECT doc_id, cand_lang AS predicted_lang, round(score, 6) AS confidence
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, cand_lang) AS rn FROM scored)
        WHERE rn = 1"""
    },
    "q26_quality" ->
      s"""WITH base AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
        m AS (
          SELECT doc_id, len(toks) AS wc,
            CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq,
            CAST(len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is'))) AS DOUBLE)
              / len(toks) AS stopr
          FROM base)
        SELECT doc_id, CAST(wc AS BIGINT) AS word_count,
          round(uniq, 6) AS uniq_ratio, round(stopr, 6) AS stop_ratio,
          round((CASE WHEN wc >= 300 THEN 40.0 WHEN wc >= 100 THEN 30.0
                      WHEN wc >= 30 THEN 20.0 ELSE 5.0 END) +
                (CASE WHEN uniq >= 0.6 THEN 30.0 WHEN uniq >= 0.4 THEN 20.0 ELSE 10.0 END) +
                (CASE WHEN stopr BETWEEN 0.1 AND 0.5 THEN 30.0
                      WHEN stopr < 0.1 THEN 15.0 ELSE 10.0 END), 1) AS quality
        FROM m""",
    "q27_token_counts" ->
      """SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS re_tokens,
        CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est
        FROM documents""",
    "q28_fingerprint" ->
      s"""WITH $ToksPos
        SELECT doc_id,
          CAST((sum((${hpSql("term")} * ((pos + 1) % 997)) % 2147483647) % 2147483647) AS BIGINT) AS fingerprint
        FROM ptoks GROUP BY doc_id""",

    "q30_knn_brute" ->
      s"""WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
        prs AS (SELECT vec_id, embedding AS x, q.e AS y FROM embeddings, q WHERE vec_id <> 0),
        terms AS (SELECT vec_id, generate_subscripts(x, 1) AS i, unnest(x) AS xv, unnest(y) AS yv FROM prs),
        dots AS (SELECT vec_id, ${cosSql("xv", "yv")} AS dot,
                        ${cosSql("xv", "xv")} AS na, ${cosSql("yv", "yv")} AS nb
                 FROM terms GROUP BY vec_id),
        cs AS (SELECT vec_id, dot / (sqrt(na) * sqrt(nb)) AS cos FROM dots)
        SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk,
               vec_id, round(cos, 6) AS cos
        FROM (SELECT * FROM cs ORDER BY cos DESC, vec_id LIMIT 10)""",
    "q31_ann_bucket" ->
      s"""WITH wb AS (
          SELECT vec_id, embedding,
            ${(0 until 4).map(j => s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")} AS bucket
          FROM embeddings),
        q AS (SELECT embedding AS e, bucket AS qb FROM wb WHERE vec_id = 1),
        prs AS (SELECT vec_id, embedding AS x, q.e AS y, bucket FROM wb, q
                WHERE bucket = q.qb AND vec_id <> 1),
        terms AS (SELECT vec_id, bucket, generate_subscripts(x, 1) AS i, unnest(x) AS xv, unnest(y) AS yv FROM prs),
        dots AS (SELECT vec_id, bucket, ${cosSql("xv", "yv")} AS dot,
                        ${cosSql("xv", "xv")} AS na, ${cosSql("yv", "yv")} AS nb
                 FROM terms GROUP BY vec_id, bucket),
        cs AS (SELECT vec_id, bucket, dot / (sqrt(na) * sqrt(nb)) AS cos FROM dots)
        SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk,
               vec_id, round(cos, 6) AS cos, bucket
        FROM (SELECT * FROM cs ORDER BY cos DESC, vec_id LIMIT 5)""",
    "q32_near_dup_cosine" ->
      s"""WITH sample AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
        wb AS (
          SELECT vec_id, embedding,
            ${(0 until 4).map(j => s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")} AS bucket
          FROM sample),
        prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS x, b.embedding AS y
                FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        terms AS (SELECT id_a, id_b, generate_subscripts(x, 1) AS i, unnest(x) AS xv, unnest(y) AS yv FROM prs),
        dots AS (SELECT id_a, id_b, ${cosSql("xv", "yv")} AS dot,
                        ${cosSql("xv", "xv")} AS na, ${cosSql("yv", "yv")} AS nb
                 FROM terms GROUP BY id_a, id_b),
        cs AS (SELECT id_a, id_b, dot / (sqrt(na) * sqrt(nb)) AS cos FROM dots)
        SELECT id_a, id_b, round(cos, 6) AS cos FROM cs WHERE cos >= 0.25""",
    "q34_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        pairs AS (SELECT e.vec_id, c.cid, e.embedding AS x, c.cvec AS y FROM embeddings e, cents c),
        tms AS (SELECT vec_id, cid, generate_subscripts(x, 1) AS i,
                       unnest(x) AS xv, unnest(y) AS yv FROM pairs),
        dots AS (SELECT vec_id, cid, ${cosSql("xv", "yv")} AS dot,
                        ${cosSql("xv", "xv")} AS na, ${cosSql("yv", "yv")} AS nb
                 FROM tms GROUP BY vec_id, cid),
        cos_c AS (SELECT vec_id, cid, dot / (sqrt(na) * sqrt(nb)) AS cos FROM dots),
        assigned AS (SELECT vec_id, cid AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
          FROM cos_c) WHERE rn = 1),
        probe AS (SELECT cid FROM cos_c WHERE vec_id = 3 ORDER BY cos DESC, cid LIMIT 2),
        qv AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 3),
        cand AS (SELECT e.vec_id, a.cell, e.embedding AS x, qv.e AS y
                 FROM embeddings e JOIN assigned a USING (vec_id), qv
                 WHERE a.cell IN (SELECT cid FROM probe)),
        t2 AS (SELECT vec_id, cell, generate_subscripts(x, 1) AS i,
                      unnest(x) AS xv, unnest(y) AS yv FROM cand),
        d2 AS (SELECT vec_id, cell, ${cosSql("xv", "yv")} AS dot,
                      ${cosSql("xv", "xv")} AS na, ${cosSql("yv", "yv")} AS nb
               FROM t2 GROUP BY vec_id, cell),
        cs AS (SELECT vec_id, cell, dot / (sqrt(na) * sqrt(nb)) AS cos FROM d2)
        SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk,
               vec_id, round(cos, 6) AS cos, CAST(cell AS BIGINT) AS cell
        FROM (SELECT * FROM cs ORDER BY cos DESC, vec_id LIMIT 10)""",
    "q33_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
               round(avg(CAST(v AS DOUBLE)), 6) AS centroid
        FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
                     unnest(embedding) AS v FROM embeddings)
        GROUP BY label, dim""",

    "q40_media_meta" ->
      s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
        CAST($metaSqlWidth AS BIGINT) AS width,
        CAST($metaSqlHeight AS BIGINT) AS height,
        CAST($metaSqlFrames AS BIGINT) AS n_frames
        FROM documents""",

    "q48_media_resize" ->
      s"""WITH m AS (
          SELECT doc_id,
            CAST($metaSqlWidth AS BIGINT) AS width,
            CAST($metaSqlHeight AS BIGINT) AS height
          FROM documents)
        SELECT doc_id, width, height,
          CAST(floor(width * least(512.0 / width, 384.0 / height)) AS BIGINT) AS out_w,
          CAST(floor(height * least(512.0 / width, 384.0 / height)) AS BIGINT) AS out_h
        FROM m""",
    "q49_frame_sample" ->
      s"""WITH m AS (
          SELECT doc_id, CAST($metaSqlFrames AS BIGINT) AS nf FROM documents)
        SELECT doc_id, CAST(g.i AS BIGINT) AS frame_idx
        FROM m JOIN generate_series(0, 63, 7) AS g(i) ON g.i <= m.nf - 1""",
    "q41_domain_extract" ->
      """WITH u AS (
          SELECT doc_id,
            'https://www.' || source || '.example.org/d/' || doc_id AS url
          FROM documents),
        dm AS (
          SELECT doc_id, url,
            regexp_replace(lower(regexp_extract(url, '^https?://([^/:?#]+)', 1)),
              '^www\.', '') AS domain
          FROM u)
        SELECT doc_id, url, domain,
          CASE WHEN domain = 'wikipedia.org' THEN 0.9
               WHEN domain = 'github.com' THEN 0.85
               WHEN domain = 'stackoverflow.com' THEN 0.85
               WHEN domain = 'arxiv.org' THEN 0.85
               WHEN domain = 'mozilla.org' THEN 0.8
               WHEN domain = 'python.org' THEN 0.85
               WHEN domain = 'medium.com' THEN 0.6
               WHEN domain = 'reddit.com' THEN 0.55
               WHEN domain LIKE '%.edu' THEN 0.8
               WHEN domain LIKE '%.gov' THEN 0.85
               WHEN domain LIKE '%.org' THEN 0.6
               WHEN domain LIKE '%.io' THEN 0.55
               WHEN domain LIKE '%.com' THEN 0.5
               WHEN domain LIKE '%.net' THEN 0.45
               WHEN domain LIKE '%.info' THEN 0.4
               WHEN domain LIKE '%.biz' THEN 0.35
               ELSE 0.3 END AS domain_score
        FROM dm""",
    "q42_corpus_insights" ->
      """SELECT count(*) AS total_results,
          count(DISTINCT source) AS unique_domains,
          count(DISTINCT lang) AS unique_types,
          round(avg(n_chars / 1000.0), 2) AS avg_quality,
          round(least(CAST(count(DISTINCT source) + count(DISTINCT lang) AS DOUBLE)
                / greatest(count(*), 1), 1.0), 6) AS diversity
        FROM documents""",
    "q43_keywords" -> {
      val stops = graft.pipeline.TextPipeline.StopWords
        .map(w => s"'$w'").mkString(",")
      s"""WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
          FROM documents WHERE doc_id % 20 = 0),
        cnts AS (
          SELECT doc_id, w, count(*) AS cnt FROM toks
          WHERE length(w) > 3 AND regexp_full_match(w, '[a-z]+')
            AND w NOT IN ($stops)
          GROUP BY doc_id, w HAVING count(*) >= 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY cnt DESC, w) AS rnk FROM cnts)
        SELECT doc_id, w AS keyword, cnt, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 5"""
    },
    "q44_semantic_metrics" ->
      """WITH m AS (
          SELECT doc_id,
            len(list_filter(regexp_split_to_array(text, '\s+'), w -> len(w) > 2)) AS wc,
            greatest(len(string_split(text, '.')) - 1, 0) AS sc,
            greatest(len(string_split(text, chr(10))), 1) AS pc,
            length(regexp_replace(text, '\s', '', 'g')) AS nospace,
            length(text) AS tlen
          FROM documents)
        SELECT doc_id, CAST(wc AS BIGINT) AS word_count,
          CAST(sc AS BIGINT) AS sentence_count,
          CAST(pc AS BIGINT) AS paragraph_count,
          round(CAST(wc AS DOUBLE) / 200.0, 6) AS reading_time_min,
          round(CAST(wc AS DOUBLE) / greatest(sc, 1), 6) AS avg_sentence_len,
          round(CAST(nospace AS DOUBLE) / greatest(tlen, 1), 6) AS content_density
        FROM m""",
    "q45_url_resolve" ->
      """WITH u AS (
          SELECT doc_id,
            'https://www.' || source || '.example.org/dir/page' AS base_url,
            CASE WHEN doc_id % 4 = 0 THEN 'http://abs.example.net/x/' || doc_id
                 WHEN doc_id % 4 = 1 THEN '//cdn.example.net/a/' || doc_id
                 WHEN doc_id % 4 = 2 THEN '/rooted/' || doc_id
                 ELSE 'rel/' || doc_id END AS href,
            source
          FROM documents)
        SELECT doc_id, base_url, href,
          CASE WHEN doc_id % 4 = 0 THEN href
               WHEN doc_id % 4 = 1 THEN 'https:' || href
               WHEN doc_id % 4 = 2 THEN 'https://www.' || source || '.example.org' || href
               ELSE base_url || '/' || href END AS resolved
        FROM u""",
    "q46_json_dates" ->
      """WITH j AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'March ' || (doc_id % 28 + 1) || ', 2024'
                 WHEN doc_id % 3 = 1 THEN '2025-08-01T12:30:00+02:00'
                 ELSE 'not-a-date' END AS ds
          FROM documents)
        SELECT doc_id,
          '{"datePublished":"' || ds || '","note":"k"}' AS json,
          CASE WHEN doc_id % 3 = 0 THEN
                 '{"datePublished":"2024-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                   || 'T00:00:00Z","note":"k"}'
               WHEN doc_id % 3 = 1 THEN
                 '{"datePublished":"2025-08-01T10:30:00Z","note":"k"}'
               ELSE '{"note":"k"}' END AS cleaned
        FROM j""",
    "q47_norm_dates" ->
      """WITH r AS (
          SELECT doc_id, CAST(doc_id % 28 + 1 AS VARCHAR) AS day,
            lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd
          FROM documents)
        SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN 'Tue, ' || day || ' Jul 2025 10:30:00 +0200'
               WHEN doc_id % 4 = 1 THEN 'Mon, ' || day || ' Aug 2025 08:00:00 GMT'
               WHEN doc_id % 4 = 2 THEN '2024/03/' || dd || ' 06:15:00'
               ELSE 'garbage' END AS raw,
          CASE WHEN doc_id % 4 = 0 THEN '2025-07-' || dd || 'T08:30:00Z'
               WHEN doc_id % 4 = 1 THEN '2025-08-' || dd || 'T08:00:00Z'
               WHEN doc_id % 4 = 2 THEN '2024-03-' || dd || 'T06:15:00Z'
               ELSE NULL END AS normalized
        FROM r"""
  )
}
