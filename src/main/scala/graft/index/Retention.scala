package graft.index

import graft.io.{ParquetTableIO, TableIO}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retention / rollover lifecycle for the index — the engine's analog of
  * the reference's ISM policy (indexer/ism_policy.json:1-36 deletes indices
  * older than 90 days) and daily-alias swap (indexer/indexer.py:263-266,
  * 359-383).
  *
  * The SEGMENT (one per input snapshot / micro-batch epoch) plays the
  * daily-index role: expiry drops whole committed segments as partition
  * directories — one metadata-scale fs op per (docGroup, segment) dir,
  * never a row-level delete — removes their lineage partitions, and
  * re-derives dictionary/stats/metrics from the survivors
  * (IndexBuilder.refreshDerived), so queries over the post-expiry index are
  * indistinguishable from a fresh build of the surviving rows (the alias
  * swap: readers always see a consistent view through the derived tables).
  */
object Retention {

  private def markerPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_pending_expiry")

  /** Crash recovery for the expiry window: `expireSnapshots` writes this
    * marker BEFORE deleting partition dirs and clears it only after
    * `refreshDerived` commits, so a crash in between can never leave the
    * derived tables (df/avgdl/nBlocks) silently referencing expired
    * segments. Recovery re-runs the deletes (idempotent — glob no-match is
    * a no-op) and the refresh. Called at the start of every expiry, by
    * `IndexBuilder.resume` (append over a possibly-dirty index), and by the
    * `SearchIndex` constructor (query-side open) — one fs.exists in the
    * common no-marker case. */
  def recoverPendingExpiry(spark: SparkSession, dir: String,
      io: TableIO = ParquetTableIO): Boolean = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // lock-free fast path (readers open indexes through here); a marker
    // means a writer died mid-expiry — finishing it is a mutation, so it
    // runs under the writer lease (re-probing inside)
    if (!fs.exists(p)) return false
    WriterLock.withLock(spark, dir) { doRecoverExpiry(spark, dir, io) }
  }

  private def doRecoverExpiry(spark: SparkSession, dir: String,
      io: TableIO): Boolean = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val in = fs.open(p)
    val pending =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    KeyMap.invalidate(spark, dir) // expiry changes the live key view
    val layout = IndexBuilder.Layout(dir)
    pending.filter(_.nonEmpty).foreach { s =>
      io.deletePartitions(spark, layout.docs, Seq("docGroup" -> "*", "segment" -> s))
      io.deletePartitions(spark, layout.postings, Seq("docGroup" -> "*", "segment" -> s))
      io.deletePartitions(spark, layout.lineage, Seq("inputSnapshot" -> s))
    }
    IndexBuilder.refreshDerived(spark, dir, io)
    fs.delete(p, false)
    true
  }

  /** Drop the given snapshots' segments from docs/postings + their lineage
    * partitions, then refresh the derived tables. No-op for unknown ids. */
  def expireSnapshots(spark: SparkSession, dir: String,
      snapshots: Seq[String], io: TableIO = ParquetTableIO): Unit =
    WriterLock.withLock(spark, dir) {
    recoverPendingExpiry(spark, dir, io)
    // an unresolved compaction must be settled first: post-commit its old
    // segments are half-deleted (lineage would misreport the survivors);
    // pre-commit its partial new segment must not shadow an expiry target
    Compaction.recoverPendingCompaction(spark, dir, io)
    if (snapshots.isEmpty) return
    val layout = IndexBuilder.Layout(dir)
    // refuse to expire the ENTIRE index: an empty docs/postings table has
    // no schema to re-derive from (and "retention" deleting everything is
    // a caller bug — ISM never deletes the live index either); drop the
    // directory explicitly if that is really intended.
    val surviving = io.read(spark, layout.lineage)
      .select(col("inputSnapshot")).distinct()
      .collect().map(_.getString(0)).toSet -- snapshots
    require(surviving.nonEmpty,
      s"expiring ${snapshots.mkString(",")} would delete every segment of $dir; " +
        "drop the index directory instead of expiring all snapshots")
    // marker first: a crash after any delete but before refreshDerived is
    // recovered by recoverPendingExpiry (re-delete + re-refresh)
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(snapshots.mkString("\n").getBytes("UTF-8")) finally out.close()
    KeyMap.invalidate(spark, dir) // expiry changes the live key view
    snapshots.foreach { s =>
      io.deletePartitions(spark, layout.docs, Seq("docGroup" -> "*", "segment" -> s))
      io.deletePartitions(spark, layout.postings, Seq("docGroup" -> "*", "segment" -> s))
      io.deletePartitions(spark, layout.lineage, Seq("inputSnapshot" -> s))
    }
    IndexBuilder.refreshDerived(spark, dir, io)
    fs.delete(p, false)
    ()
  }

  /** Expire every snapshot whose NEWEST lineage row is older than `cutoff`
    * (the ISM `min_index_age: 90d` analog). Returns the expired snapshot
    * ids. The lineage scan is an aggregation over the lineage table; only
    * the resulting snapshot ID LIST (one per batch, not per group) reaches
    * the driver. */
  def expireOlderThan(spark: SparkSession, dir: String,
      cutoff: java.sql.Timestamp, io: TableIO = ParquetTableIO): Seq[String] =
      WriterLock.withLock(spark, dir) {
    val layout = IndexBuilder.Layout(dir)
    if (!io.exists(spark, layout.lineage)) return Seq.empty
    val expired = io.read(spark, layout.lineage)
      .groupBy(col("inputSnapshot"))
      .agg(max(col("updatedAt")).as("newest"))
      .filter(col("newest") < lit(cutoff))
      .select("inputSnapshot").collect().map(_.getString(0)).toSeq
    expireSnapshots(spark, dir, expired, io)
    expired
  }
}
