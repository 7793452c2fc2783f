package graft.index

import graft.core.{Analyzer, Posting}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stored posting-block row. Blocks of a (field,term) are globally ordered
  * by (docGroup, blockIdx); docIds strictly increase within and across a
  * term's blocks. maxTf/minTf/minDl/maxDl let the query side compute exact
  * block-max WAND bounds from CURRENT corpus stats, so block metadata stays
  * valid across incremental appends. */
case class BlockRow(
    field: String, term: String, docGroup: Long, blockIdx: Int,
    firstDocId: Long, lastDocId: Long, n: Int, sumTf: Long,
    maxTf: Int, minTf: Int, minDl: Int, maxDl: Int, bytes: Array[Byte])

/** Streaming block builder over token occurrences sorted by
  * (field, term, docGroup, docId, pos): accumulates one posting at a time,
  * emits a compressed block every `blockSize` postings — memory is
  * O(blockSize), never a whole posting list. */
final class BlockBuildIterator(
    rows: Iterator[(String, String, Long, Long, Int, Int)],
    blockSize: Int,
    rawBytes: Long => Unit) extends Iterator[BlockRow] {

  private val buf = rows.buffered
  private val out = scala.collection.mutable.Queue[BlockRow]()

  override def hasNext: Boolean = {
    while (out.isEmpty && buf.hasNext) consumeKey()
    out.nonEmpty
  }
  override def next(): BlockRow = {
    if (!hasNext) throw new NoSuchElementException
    out.dequeue()
  }

  /** Consume all rows of the next (field, term, docGroup) key, enqueueing
    * its blocks. */
  private def consumeKey(): Unit = {
    val (f, t, g, _, _, _) = buf.head
    val block = new scala.collection.mutable.ArrayBuffer[Posting](blockSize)
    var blockIdx = 0

    var curDoc = Long.MinValue
    var curDl = 0
    val poss = new scala.collection.mutable.ArrayBuffer[Int]()

    def flushBlock(): Unit = if (block.nonEmpty) {
      val bytes = Codec.encodeBlock(block.head.docId, block.toSeq)
      rawBytes(Codec.rawSizeEstimate(block.toSeq))
      out.enqueue(BlockRow(f, t, g, blockIdx, block.head.docId, block.last.docId,
        block.size, block.iterator.map(_.tf.toLong).sum,
        block.iterator.map(_.tf).max, block.iterator.map(_.tf).min,
        block.iterator.map(_.dl).min, block.iterator.map(_.dl).max, bytes))
      blockIdx += 1
      block.clear()
    }
    def flushDoc(): Unit = if (curDoc != Long.MinValue) {
      block += Posting(curDoc, poss.length, curDl, poss.toArray)
      if (block.size >= blockSize) flushBlock()
      poss.clear()
    }

    var continue = true
    while (continue && buf.hasNext) {
      val h = buf.head
      if (h._1 != f || h._2 != t || h._3 != g) continue = false
      else {
        val (_, _, _, d, dl, p) = buf.next()
        if (d != curDoc) { flushDoc(); curDoc = d; curDl = dl }
        poss += p
      }
    }
    flushDoc()
    flushBlock()
  }
}

/** Distributed inverted-index build (SURVEY.md §7.2, north_rule).
  *
  * Layout under `dir` (parquet with the Iceberg-target schemas; the Iceberg
  * catalog binding is config-only in this sandbox):
  *
  *   docs/        docId, repo, path, lang, dl_<field>..., sha256, shaOk,
  *                qualityScore, repoScore          [partitioned by docGroup]
  *   postings/    BlockRow                          [partitioned by docGroup]
  *   dictionary/  field, term, df, totalTf
  *   stats/       field, n, avgdl
  *   lineage/     partitionId(=docGroup), inputSnapshot, status, docs,
  *                postingsEmitted, bytesCompressed, mergeFanIn, shaOk, updatedAt
  *   metrics/     field, docs, postingsEmitted, blocks, bytesCompressed,
  *                bytesRawEstimate, maxMergeFanIn, avgMergeFanIn, shaViolations
  *
  * Scale design:
  *   - Hot-term skew (code stop-words `the`, `if`, `return`... — cf. the
  *     reference stopword lists, data_pipeline/hybrid_processor.py:90-124):
  *     a term's posting list is never one aggregation group. Lists are
  *     segmented by docGroup = floor(docId / docGroupSize) — a deterministic
  *     range salt — bounding every group by docGroupSize regardless of df.
  *     Query-side merge fan-in per term = #docGroups it spans (metric).
  *   - groupBy(term, docGroup, docId) gets map-side partial aggregation;
  *     no collect of data rows anywhere (lineage metadata rows only).
  *   - Writes partitioned by docGroup with dynamic partition overwrite:
  *     rebuilding a group after a mid-build failure is idempotent — the
  *     lineage-driven resume is exactly-once w.r.t. postings (no
  *     double-counted tf).
  *
  * Per-row invariant (BASELINE.json input_hint): when the input has a
  * `sha256` column the build recomputes sha2(content,256) and records
  * equality per row (docs.shaOk), per group (lineage.shaOk) and globally
  * (metrics.shaViolations) — mirroring the reference's content-hash
  * discipline (crawler/src/storage/content_hash.h:16-28,
  * data_pipeline/hybrid_processor.py:171-172).
  */
object IndexBuilder {

  case class Params(
      blockSize: Int = 128,
      docGroupSize: Long = 4096L,
      fields: Seq[String] = Seq("content"),
      inputSnapshot: String = "snapshot-0",
      qualityScoreCol: () => Column = () => IndexBuilder.defaultQuality,
      repoScoreCol: () => Column = () => IndexBuilder.defaultRepoScore)

  /** Reference-style length step function (rust scorer.rs:138-147 shape). */
  def defaultQuality: Column = {
    val dl = col("dl_content")
    when(dl < 30, 0.05).when(dl < 100, 0.3).when(dl < 300, 0.7)
      .when(dl < 1000, 1.5).when(dl < 3000, 1.0).otherwise(1.2)
  }

  /** Deterministic repo tier (plays the reference domain_score Q1 role).
    * md5-based so the DuckDB correctness oracle can reproduce it exactly
    * (see graft.ops.Hashing). */
  def defaultRepoScore: Column =
    (lit(3) + pmod(conv(substring(md5(col("repo")), 1, 15), 16, 10).cast("long"),
      lit(7L))).cast("double") / 10.0

  case class Layout(dir: String) {
    def docs = s"$dir/docs"
    def postings = s"$dir/postings"
    def dictionary = s"$dir/dictionary"
    def stats = s"$dir/stats"
    def lineage = s"$dir/lineage"
    def metrics = s"$dir/metrics"
  }

  /** Deterministic docId for corpora without one (xxhash64 of the natural
    * key). NOTE: hash ids are uniform over the Long range, so the builder
    * groups them by `pmod(docId, nGroups)` instead of contiguous ranges —
    * deterministic for a fixed corpus, but NOT append-stable. Incremental /
    * streaming builds must supply dense monotone docIds (assigned once at
    * ingest, e.g. CorpusGen.generateDF), which get range grouping. */
  def withDocId(corpus: DataFrame): DataFrame =
    if (corpus.columns.contains("docId")) corpus
    else corpus.withColumn("docId", xxhash64(col("repo"), col("path"), col("commit")))

  /** Full build: wipes `dir` first. */
  def build(spark: SparkSession, corpus: DataFrame, dir: String,
      params: Params = Params()): Unit = {
    deleteDir(spark, dir)
    buildGroups(spark, corpus, dir, params, resume = false)
  }

  /** Resume: anti-join lineage (status=done), build only pending docGroups;
    * dictionary/stats/metrics re-derived from the FULL tables so a resumed
    * build is indistinguishable from a from-scratch build. */
  def resume(spark: SparkSession, corpus: DataFrame, dir: String,
      params: Params = Params()): Unit =
    buildGroups(spark, corpus, dir, params, resume = true)

  private def buildGroups(spark: SparkSession, corpus0: DataFrame, dir: String,
      params: Params, resume: Boolean): Unit = {
    import spark.implicits._
    val layout = Layout(dir)
    val sc = spark.sparkContext
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val hadDenseIds = corpus0.columns.contains("docId")
    val withIds = withDocId(corpus0)
    // dense ids -> contiguous ranges (append-stable: new ids = new groups);
    // hash ids -> pmod buckets sized from the corpus count (static builds).
    val corpus =
      if (hadDenseIds)
        withIds.withColumn("docGroup",
          floor($"docId" / params.docGroupSize.toDouble).cast("long"))
      else {
        val n = withIds.count()
        val nGroups = math.max(1L, math.ceil(n.toDouble / params.docGroupSize).toLong)
        withIds.withColumn("docGroup", pmod($"docId", lit(nGroups)))
      }

    val doneGroups: Set[Long] =
      if (resume && fileExists(spark, layout.lineage))
        spark.read.parquet(layout.lineage).filter($"status" === "done")
          .select($"partitionId").as[Long].collect().toSet
      else Set.empty

    val pendingCorpus =
      if (doneGroups.isEmpty) corpus
      else corpus.filter(!$"docGroup".isin(doneGroups.toSeq: _*))

    // ---- docs table ----
    val hasSrcSha = corpus.columns.contains("sha256")
    var docsDf = pendingCorpus
      .withColumn("sha256_computed", sha2(col("content"), 256))
      .withColumn("shaOk",
        if (hasSrcSha) col("sha256_computed") === col("sha256") else lit(true))
    params.fields.foreach { f =>
      docsDf = docsDf.withColumn(s"tokens_$f", Analyzer.tokensCol(col(f)))
        .withColumn(s"dl_$f", size(col(s"tokens_$f")))
    }
    docsDf = docsDf
      .withColumn("qualityScore", params.qualityScoreCol())
      .withColumn("repoScore", params.repoScoreCol())

    val metaCols = Seq("docId", "repo", "path", "lang") ++
      params.fields.map(f => s"dl_$f") ++
      Seq("sha256_computed", "shaOk", "qualityScore", "repoScore", "docGroup")
    docsDf.select(metaCols.map(col): _*)
      .withColumnRenamed("sha256_computed", "sha256")
      .repartition(col("docGroup")).sortWithinPartitions("docId")
      .write.mode(SaveMode.Overwrite).partitionBy("docGroup")
      .parquet(layout.docs)

    // ---- postings ----
    val tokens = params.fields.map { f =>
      docsDf.select($"docId", $"docGroup", col(s"dl_$f").as("dl"),
          posexplode(col(s"tokens_$f")).as(Seq("pos", "term")))
        .withColumn("field", lit(f))
    }.reduce(_ unionByName _)

    val bytesRaw = sc.longAccumulator("bytesRawEstimate")

    // ONE shuffle: hash-partition token occurrences by (field, term,
    // docGroup) — bounded by docGroupSize regardless of term df — then an
    // external sort within partitions and a streaming single-pass block
    // builder (O(blockSize) memory; tf/positions/blocks computed together,
    // no collect_list buffers).
    val blockSize = params.blockSize
    val blocks: Dataset[BlockRow] = tokens
      .select($"field", $"term", $"docGroup", $"docId", $"dl", $"pos")
      .repartition($"field", $"term", $"docGroup")
      .sortWithinPartitions($"field", $"term", $"docGroup", $"docId", $"pos")
      .as[(String, String, Long, Long, Int, Int)]
      .mapPartitions { it =>
        new BlockBuildIterator(it, blockSize, raw => bytesRaw.add(raw))
      }

    blocks.toDF()
      .repartition(col("docGroup"))
      .sortWithinPartitions("field", "term", "blockIdx")
      .write.mode(SaveMode.Overwrite).partitionBy("docGroup")
      .parquet(layout.postings)

    // ---- dictionary + stats from FULL tables ----
    val allBlocks = spark.read.parquet(layout.postings)
    allBlocks.groupBy($"field", $"term")
      .agg(sum($"n").as("df"), sum($"sumTf").as("totalTf"))
      .repartition(8, $"term").sortWithinPartitions("field", "term")
      .write.mode(SaveMode.Overwrite).parquet(layout.dictionary)

    // one job: N, per-field avgdl, sha violations
    val allDocs = spark.read.parquet(layout.docs)
    val docAggCols = count(lit(1)).as("n") +:
      sum(when(!$"shaOk", 1L).otherwise(0L)).as("shaViol") +:
      params.fields.map(f => avg(col(s"dl_$f")).as(s"avgdl_$f"))
    val docAgg = allDocs.agg(docAggCols.head, docAggCols.tail: _*).collect()(0)
    val nDocs = docAgg.getAs[Long]("n")
    val shaViol = docAgg.getAs[Long]("shaViol")
    params.fields.map { f =>
      (f, nDocs, docAgg.getAs[Double](s"avgdl_$f"))
    }.toDF("field", "n", "avgdl")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(layout.stats)

    // ---- lineage ----
    val newLineage = spark.read.parquet(layout.postings)
      .filter(if (doneGroups.isEmpty) lit(true) else !$"docGroup".isin(doneGroups.toSeq: _*))
      .groupBy($"docGroup")
      .agg(sum($"n").as("postingsEmitted"),
        sum(length($"bytes")).as("bytesCompressed"),
        countDistinct($"term").as("mergeFanIn"))
      .join(
        allDocs.filter(if (doneGroups.isEmpty) lit(true) else !$"docGroup".isin(doneGroups.toSeq: _*))
          .groupBy($"docGroup")
          .agg(count(lit(1)).as("docs"), min($"shaOk").as("shaOk")),
        Seq("docGroup"))
      .select($"docGroup".as("partitionId"),
        lit(params.inputSnapshot).as("inputSnapshot"), lit("done").as("status"),
        $"docs", $"postingsEmitted", $"bytesCompressed", $"mergeFanIn",
        $"shaOk", current_timestamp().as("updatedAt"))

    // lineage is docGroup-granular metadata (small even at 10^12 files:
    // one row per ~docGroupSize docs) — safe to merge on the driver.
    val schema = newLineage.schema
    val mergedRows: Seq[Row] =
      (if (resume && fileExists(spark, layout.lineage))
        spark.read.parquet(layout.lineage)
          .filter(!$"partitionId".isin(Seq(-1L): _*) && $"status" === "done")
          .collect().toSeq
      else Seq.empty[Row]) ++ newLineage.collect().toSeq
    spark.createDataFrame(sc.parallelize(mergedRows, 1), schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/lineage_next")
    replaceDir(spark, s"$dir/lineage_next", layout.lineage)

    // ---- metrics (one job over the dictionary-grain aggregate) ----
    val perField = allBlocks.groupBy($"field", $"term")
      .agg(countDistinct($"docGroup").as("g"), sum($"n").as("p"),
        count(lit(1)).as("bl"), sum(length($"bytes")).as("bc"))
      .groupBy($"field").agg(max($"g").as("maxFan"), avg($"g").as("avgFan"),
        sum($"p").as("postings"), sum($"bl").as("blocks"), sum($"bc").as("bytes"))
      .collect().map(r => r.getString(0) -> r).toMap
    params.fields.map { f =>
      val r = perField.get(f)
      (f, nDocs,
        r.map(_.getAs[Long]("postings")).getOrElse(0L),
        r.map(_.getAs[Long]("blocks")).getOrElse(0L),
        r.map(_.getAs[Long]("bytes")).getOrElse(0L),
        bytesRaw.value.longValue(),
        r.map(_.getAs[Long]("maxFan")).getOrElse(0L),
        r.map(_.getAs[Double]("avgFan")).getOrElse(0.0), shaViol)
    }.toDF("field", "docs", "postingsEmitted", "blocks", "bytesCompressed",
        "bytesRawEstimate", "maxMergeFanIn", "avgMergeFanIn", "shaViolations")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(layout.metrics)
  }

  def fileExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  private def replaceDir(spark: SparkSession, src: String, dst: String): Unit = {
    val s = new org.apache.hadoop.fs.Path(src)
    val d = new org.apache.hadoop.fs.Path(dst)
    val fs = s.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(d)) fs.delete(d, true)
    fs.rename(s, d)
  }
}
