package graft.streaming

import graft.index.IndexBuilder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental index maintenance via Structured Streaming.
  *
  * Mirrors the reference indexer's semantics (SURVEY §2.10): a file-watch
  * micro-batch loop with idempotent id-keyed writes and daily-index-style
  * rollover — no event-time/watermark semantics in the ingest path. Here:
  * a parquet file source + Trigger.AvailableNow, where each micro-batch is
  * appended as NEW docGroup segments (the rollover analog: incremental
  * appends are docGroup-aligned; a batch never rewrites a committed group).
  * Dictionary and stats are re-derived from the full tables after each
  * batch (IndexBuilder.resume), so queries over the growing index stay
  * exactly consistent with a from-scratch build of the same rows.
  *
  * Checkpointing composes two layers: the streaming checkpoint (source
  * offsets — which input files were consumed) and the engine's own lineage
  * table (which docGroups are committed), giving end-to-end exactly-once.
  */
object StreamingIndexer {

  /** Start (and run to completion, AvailableNow) the incremental build over
    * all parquet files in `inputDir`. Rows must carry a `docId` column or
    * one is derived (IndexBuilder.withDocId). `segmentPrefix` names the
    * lineage segments (`<prefix>-N`) so multiple sources feeding one index
    * (dual-priority) never collide.
    *
    * `maxSegments` > 0 enables the tiered auto-merge: after a micro-batch
    * leaves more than that many committed segments, the cheapest contiguous
    * window is force-merged down to the budget (Compaction.compactToBudget,
    * amortized-logarithmic rewrite cost) — the Lucene-merge-policy analog
    * of the reference's single-shard/30s-refresh tuning. Crash-safe in both directions: compaction has its own marker
    * protocol, and a batch retried AFTER its segments were merged resumes
    * to zero pending rows (lineage carries the committed state forward). */
  def runAvailableNow(spark: SparkSession, inputDir: String, schema: StructType,
      indexDir: String, checkpointDir: String,
      params: IndexBuilder.Params = IndexBuilder.Params(),
      segmentPrefix: String = "epoch", maxSegments: Int = 0,
      vacuumRetain: Int = 0): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4) // backpressure (reference S8/K6 analog)
      .parquet(inputDir)

    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          // one segment per micro-batch: the epoch id is stable across
          // crash-retries of the same batch (checkpointed), so the resume's
          // dynamic partition overwrite of (docGroup, segment=epoch-N) is
          // exactly-once; distinct batches never share a segment, so a
          // batch straddling a docGroup boundary APPENDS to the group
          // instead of being dropped (IndexBuilder.pendingRows).
          IndexBuilder.resume(spark, batch, indexDir,
            params.copy(inputSnapshot = s"$segmentPrefix-$epochId"))
          if (maxSegments > 0) {
            graft.index.Compaction.compactToBudget(spark, indexDir, maxSegments,
              params.blockSize, params.io)
            ()
          }
          // snapshot-storage debt stays bounded on an infinite stream, like
          // segment count (budget merge) and dead docs (purge-at-merge);
          // no-op on in-place parquet io
          if (vacuumRetain > 0) {
            graft.index.Vacuum.vacuumIndex(spark, indexDir, vacuumRetain, params.io)
            ()
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** CONTINUOUS RE-CRAWL ingestion: the reference's actual production loop —
    * the crawler re-emits pages forever, and the indexer upserts them by
    * content hash (crawler content_hash.h:16-28; the indexer's `_id`-keyed
    * bulk upsert) — as a streaming mode. Each micro-batch goes through
    * [[graft.index.Upsert]] keyed by `keyCols`: unchanged content is a
    * no-op, changed content tombstones the stale docId and appends the new
    * version under a fresh dense id, new keys are plain adds. The first
    * batch bootstraps the index from nothing.
    *
    * Exactly-once composes three layers: the streaming checkpoint (which
    * files were consumed), the epoch-stable segment name (`<prefix>-N`
    * survives crash-retries, so the resume's partition overwrite is
    * idempotent), and the upsert's own convergence (a retry skips adds that
    * committed and re-issues tombstones that didn't — UpsertSpec's crash
    * window). `maxSegments` bounds segment count via the tiered auto-merge,
    * which also PURGES the accumulated tombstones whenever it touches their
    * segments — the merge keeps both the segment count and the dead-doc
    * debt bounded under an infinite re-crawl stream. */
  def runUpsertAvailableNow(spark: SparkSession, inputDir: String,
      schema: StructType, indexDir: String, checkpointDir: String,
      keyCols: Seq[String], params: IndexBuilder.Params = IndexBuilder.Params(),
      segmentPrefix: String = "recrawl", maxSegments: Int = 0,
      vacuumRetain: Int = 0): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(inputDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          graft.index.Upsert.upsert(spark, batch.drop("docId"), indexDir,
            params.copy(inputSnapshot = s"$segmentPrefix-$epochId"), keyCols)
          if (maxSegments > 0) {
            graft.index.Compaction.compactToBudget(spark, indexDir, maxSegments,
              params.blockSize, params.io)
            ()
          }
          if (vacuumRetain > 0) { // bounded snapshot-storage debt (see above)
            graft.index.Vacuum.vacuumIndex(spark, indexDir, vacuumRetain, params.io)
            ()
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** S8 TRUE dual-priority drain (indexer.py:81-123 DualPriorityQueue.get +
    * :737-742 main loop): fresh files ALWAYS preempt backlog — the backlog
    * is processed one micro-batch at a time, and before EVERY backlog
    * micro-batch the fresh source is drained to empty, so a backlog batch
    * never runs while fresh files are pending (fresh arriving mid-backlog
    * is picked up before the next backlog batch, exactly the reference's
    * "process backlog only if no fresh files were processed" loop).
    *
    * Each source keeps its own streaming checkpoint and lineage-segment
    * prefix (fresh-N / backlog-N), so exactly-once holds independently per
    * source. `beforeBacklogBatch` is a test seam for injecting fresh files
    * mid-drain; production callers leave it default. */
  def runDualPriority(spark: SparkSession, freshDir: String, backlogDir: String,
      schema: StructType, indexDir: String, checkpointDir: String,
      params: IndexBuilder.Params = IndexBuilder.Params(),
      beforeBacklogBatch: Long => Unit = _ => ()): Unit = {
    def drainFresh(): Unit =
      runAvailableNow(spark, freshDir, schema, indexDir,
        s"$checkpointDir/fresh", params, segmentPrefix = "fresh")
    drainFresh()
    val backlog = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 4)
      .parquet(backlogDir)
    val q = backlog.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$checkpointDir/backlog")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        beforeBacklogBatch(epochId)
        drainFresh() // fresh preempts: drained before EVERY backlog batch
        if (!batch.isEmpty) {
          IndexBuilder.resume(spark, batch, indexDir,
            params.copy(inputSnapshot = s"backlog-$epochId"))
        }
        ()
      }
      .start()
    q.awaitTermination()
    // fresh files that arrived DURING the last backlog batch have no later
    // backlog batch to drain ahead of — close the exit window (the
    // reference's loop never exits, so it has no such window)
    drainFresh()
  }

  /** Event-time windowed aggregation over an event stream (watermarked) —
    * the Structured Streaming surface beyond the reference's file loop:
    * 5-minute tumbling counts+sums per event_type, 10-minute watermark. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
}
