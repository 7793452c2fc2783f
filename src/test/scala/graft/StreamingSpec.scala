package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import graft.streaming.StreamingIndexer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = IndexBuilder.Params(blockSize = 32, docGroupSize = 128L,
    fields = Seq("content"))

  test("file-source AvailableNow ingest builds a queryable index incrementally") {
    import spark.implicits._
    val base = "/tmp/graft-test/stream2"
    IndexBuilder.deleteDir(spark, base)
    val input = s"$base/in"
    val indexDir = s"$base/index"
    val ckpt = s"$base/ckpt"

    // deterministic docIds from the generator row index (id column)
    def gen(from: Long, until: Long) = {
      val n = until - from
      spark.range(from, until).map(i => (i, CorpusGen.row(23L, i)))
        .select(col("_1").as("docId"), col("_2.repo").as("repo"),
          col("_2.path").as("path"), col("_2.commit").as("commit"),
          col("_2.lang").as("lang"), col("_2.content").as("content"),
          col("_2.sha256").as("sha256"))
    }

    // batch 1 on disk -> stream -> index
    gen(0L, 200L).write.mode("overwrite").parquet(input)
    val schema = spark.read.parquet(input).schema
    StreamingIndexer.runAvailableNow(spark, input, schema, indexDir, ckpt, params)

    val idx1 = new SearchIndex(spark, indexDir)
    val q = "python tutorial"
    val afterB1 = QueryEngine.search(idx1, q, SearchOpts()).collect().map(_.toSeq).toSeq

    val batchDir1 = s"$base/batch1"
    IndexBuilder.build(spark, gen(0L, 200L).toDF(), batchDir1, params)
    val batch1 = QueryEngine.search(new SearchIndex(spark, batchDir1), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    assert(afterB1 == batch1, "stream(b1) != batch(b1)")

    // batch 2 arrives (docGroup-disjoint ids 1000..1199); stream resumes from
    // its checkpoint and only processes the new files
    gen(1000L, 1200L).write.mode("append").parquet(input)
    StreamingIndexer.runAvailableNow(spark, input, schema, indexDir, ckpt, params)

    val idx2 = new SearchIndex(spark, indexDir)
    val afterB2 = QueryEngine.search(idx2, q, SearchOpts()).collect().map(_.toSeq).toSeq
    val batchDir2 = s"$base/batch12"
    IndexBuilder.build(spark,
      gen(0L, 200L).toDF().unionByName(gen(1000L, 1200L).toDF()), batchDir2, params)
    val batch12 = QueryEngine.search(new SearchIndex(spark, batchDir2), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    assert(afterB2 == batch12, "stream(b1+b2) != batch(b1 ∪ b2)")
  }

  test("micro-batches straddling docGroup boundaries lose no documents") {
    import spark.implicits._
    // docGroupSize=128 but files of ~25 ids and maxFilesPerTrigger=4 →
    // micro-batch boundaries never align to groups; every batch straddles a
    // committed group (the exactly-once trap ADVICE flagged in round 1)
    val base = "/tmp/graft-test/stream-straddle"
    IndexBuilder.deleteDir(spark, base)
    val input = s"$base/in"

    def gen(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).map(i => (i, CorpusGen.row(29L, i)))
        .select(col("_1").as("docId"), col("_2.repo").as("repo"),
          col("_2.path").as("path"), col("_2.commit").as("commit"),
          col("_2.lang").as("lang"), col("_2.content").as("content"),
          col("_2.sha256").as("sha256"))

    gen(0L, 300L, 12).write.mode("overwrite").parquet(input) // ~25 ids/file
    val schema = spark.read.parquet(input).schema
    StreamingIndexer.runAvailableNow(spark, input, schema,
      s"$base/index", s"$base/ckpt", params)

    assert(spark.read.parquet(s"$base/index/docs").count() == 300L,
      "straddling micro-batches dropped documents")

    val batchDir = s"$base/batch"
    IndexBuilder.build(spark, gen(0L, 300L, 12).toDF(), batchDir, params)
    val q = "python tutorial"
    val streamed = QueryEngine.search(new SearchIndex(spark, s"$base/index"), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    val batched = QueryEngine.search(new SearchIndex(spark, batchDir), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    assert(streamed == batched, "stream(straddled batches) != batch(all)")
  }

  test("tiered auto-merge keeps the streaming index within its segment budget") {
    import spark.implicits._
    val base = "/tmp/graft-test/stream-automerge"
    IndexBuilder.deleteDir(spark, base)
    val input = s"$base/in"

    def gen(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).map(i => (i, CorpusGen.row(31L, i)))
        .select(col("_1").as("docId"), col("_2.repo").as("repo"),
          col("_2.path").as("path"), col("_2.commit").as("commit"),
          col("_2.lang").as("lang"), col("_2.content").as("content"),
          col("_2.sha256").as("sha256"))

    // three arrivals of 4 files each (= 1 micro-batch each at
    // maxFilesPerTrigger=4); budget 2 → the third batch triggers a tail
    // merge of the two newest segments
    gen(0L, 100L, 4).write.mode("overwrite").parquet(input)
    val schema = spark.read.parquet(input).schema
    def run(): Unit = StreamingIndexer.runAvailableNow(spark, input, schema,
      s"$base/index", s"$base/ckpt", params, maxSegments = 2)
    run()
    gen(100L, 200L, 4).write.mode("append").parquet(input)
    run()
    gen(200L, 300L, 4).write.mode("append").parquet(input)
    run()

    val segs = spark.read.parquet(s"$base/index/lineage")
      .select("inputSnapshot").distinct().as[String].collect().toSet
    assert(segs.size <= 2, s"auto-merge left ${segs.size} segments: $segs")
    assert(segs.exists(_.startsWith("compact-")), "no merged segment present")
    assert(spark.read.parquet(s"$base/index/docs").count() == 300L)

    val batchDir = s"$base/batch"
    IndexBuilder.build(spark, gen(0L, 300L, 4).toDF(), batchDir, params)
    val q = "python tutorial"
    val streamed = QueryEngine.search(new SearchIndex(spark, s"$base/index"), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    val batched = QueryEngine.search(new SearchIndex(spark, batchDir), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    assert(streamed == batched, "auto-merged stream != batch(all)")
  }

  test("dual-priority drain: fresh files always preempt backlog (S8)") {
    import spark.implicits._
    val base = "/tmp/graft-test/stream-dual"
    IndexBuilder.deleteDir(spark, base)
    val fresh = s"$base/fresh"
    val backlog = s"$base/backlog"

    def gen(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).map(i => (i, CorpusGen.row(37L, i)))
        .select(col("_1").as("docId"), col("_2.repo").as("repo"),
          col("_2.path").as("path"), col("_2.commit").as("commit"),
          col("_2.lang").as("lang"), col("_2.content").as("content"),
          col("_2.sha256").as("sha256"))

    // fresh f1 (ids 0-49), backlog b (ids 1000-1199 in 8 files -> 2
    // micro-batches at maxFilesPerTrigger=4)
    gen(0L, 50L, 2).write.mode("overwrite").parquet(fresh)
    gen(1000L, 1200L, 8).write.mode("overwrite").parquet(backlog)
    val schema = spark.read.parquet(fresh).schema

    // inject NEW fresh files (ids 2000-2049) at the start of the SECOND
    // backlog micro-batch — the drain must index them before that batch
    StreamingIndexer.runDualPriority(spark, fresh, backlog, schema,
      s"$base/index", s"$base/ckpt", params,
      beforeBacklogBatch = { epochId =>
        if (epochId == 1L)
          gen(2000L, 2050L, 2).write.mode("append").parquet(fresh)
        ()
      })

    // nothing lost: 50 + 200 + 50 docs
    assert(spark.read.parquet(s"$base/index/docs").count() == 300L)

    // lineage commit order proves preemption: every fresh segment is
    // committed no later than any backlog segment that ran after it; in
    // particular the mid-drain fresh batch (docIds 2000+) commits BEFORE
    // backlog epoch 1
    val lin = spark.read.parquet(s"$base/index/lineage")
      .select(col("inputSnapshot"), col("updatedAt").cast("long").as("ts"),
        col("maxDocId"))
      .collect()
    val freshLateTs = lin.filter(r => r.getAs[String]("inputSnapshot")
      .startsWith("fresh") && r.getAs[Long]("maxDocId") >= 2000L)
      .map(_.getAs[Long]("ts"))
    val backlog1Ts = lin.filter(_.getAs[String]("inputSnapshot") == "backlog-1")
      .map(_.getAs[Long]("ts"))
    assert(freshLateTs.nonEmpty, "mid-drain fresh batch never indexed")
    assert(backlog1Ts.nonEmpty, "backlog epoch 1 missing")
    assert(freshLateTs.max <= backlog1Ts.min,
      "a backlog batch ran while fresh files were pending")

    // and the result equals a from-scratch batch build of the union
    val batchDir = s"$base/batch"
    IndexBuilder.build(spark,
      gen(0L, 50L, 2).toDF().unionByName(gen(1000L, 1200L, 8).toDF())
        .unionByName(gen(2000L, 2050L, 2).toDF()), batchDir, params)
    val q = "python tutorial"
    val streamed = QueryEngine.search(new SearchIndex(spark, s"$base/index"), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    val batched = QueryEngine.search(new SearchIndex(spark, batchDir), q,
      SearchOpts()).collect().map(_.toSeq).toSeq
    assert(streamed == batched, "dual-priority result != batch build of union")
  }

  test("streaming re-crawl upsert: bootstrap + change detection; expunged index equals a fresh build of the live state") {
    import spark.implicits._
    val base = "/tmp/graft-test/stream-upsert"
    IndexBuilder.deleteDir(spark, base)
    val input = s"$base/in"
    val indexDir = s"$base/index"

    // crawl rows carry NO docId (ids are owned by the index) and no sha
    // (the builder recomputes it from content)
    def gen(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).map(i => (i, CorpusGen.row(41L, i)))
        .select(col("_2.repo").as("repo"), col("_2.path").as("path"),
          col("_2.commit").as("commit"), col("_2.lang").as("lang"),
          col("_2.content").as("content"))

    // crawl snapshot 1 (pages 0-149): bootstraps the index from nothing
    gen(0L, 150L, 4).write.mode("overwrite").parquet(input)
    val schema = spark.read.parquet(input).schema
    def run(): Unit = StreamingIndexer.runUpsertAvailableNow(spark, input,
      schema, indexDir, s"$base/ckpt", Seq("repo", "path"), params,
      maxSegments = 3)
    run()
    assert(spark.read.parquet(s"$indexDir/docs").count() == 150L)

    // crawl snapshot 2 (re-crawl): 0-49 changed content, 50-149 re-presented
    // byte-identical, 150-199 brand new — split across micro-batches
    val changed = gen(0L, 50L, 2)
      .withColumn("content", concat(col("content"), lit(" zzedit refreshed")))
    changed.unionByName(gen(50L, 150L, 2)).unionByName(gen(150L, 200L, 2))
      .write.mode("append").parquet(input)
    run()

    // mid-lifecycle state: 200 live keys, the 50 stale versions tombstoned,
    // unchanged pages keep their bootstrap ids, every add got a fresh id
    val docs = spark.read.parquet(s"$indexDir/docs")
    val dead = graft.index.Deletes.df(spark, indexDir).get.select("docId")
    val live = docs.join(dead, Seq("docId"), "left_anti")
    assert(live.count() == 200L, "live view wrong size")
    assert(graft.index.Deletes.count(spark, indexDir) == 50L,
      "changed pages not tombstoned")
    val liveShas = live.select("repo", "path", "sha256")
      .as[(String, String, String)].collect().toSet
    val wantShas = changed.unionByName(gen(50L, 150L, 2))
      .unionByName(gen(150L, 200L, 2))
      .select(col("repo"), col("path"), sha2(col("content"), 256))
      .as[(String, String, String)].collect().toSet
    assert(liveShas == wantShas, "live (key, sha) view != final crawl state")
    val segs = spark.read.parquet(s"$indexDir/lineage")
      .select("inputSnapshot").distinct().count()
    assert(segs <= 3, s"auto-merge budget violated: $segs segments")

    // the changed content is searchable NOW and only under fresh ids (the
    // stale versions are dead even before any physical purge)
    val zz = QueryEngine.search(new SearchIndex(spark, indexDir), "zzedit",
      SearchOpts(k = 60, diversity = false)).collect()
    assert(zz.length == 50, s"expected 50 zzedit hits, got ${zz.length}")
    assert(zz.forall(_.getAs[Long]("docId") >= 150L),
      "a tombstoned stale version surfaced in search")

    // after an explicit purge, ranking over the streamed index is the same
    // multiset as a from-scratch batch build of the final live corpus
    // (id assignments differ by construction, so compare (score, key))
    graft.index.Compaction.expungeDeletes(spark, indexDir, params.blockSize)
    val batchDir = s"$base/batch"
    IndexBuilder.build(spark,
      changed.unionByName(gen(50L, 150L, 2)).unionByName(gen(150L, 200L, 2)),
      batchDir, params)
    def ranked(dir: String): Set[(String, String, String)] = {
      val idx = new SearchIndex(spark, dir)
      QueryEngine.search(idx, "python tutorial",
          SearchOpts(k = 250, diversity = false))
        .select("docId", "score")
        .join(idx.docs.select("docId", "repo", "path"), Seq("docId"))
        .select(format_number(col("score"), 9), col("repo"), col("path"))
        .as[(String, String, String)].collect().toSet
    }
    assert(ranked(indexDir) == ranked(batchDir),
      "streamed+expunged ranking != fresh build of the live corpus")
  }

  test("mapGroupsWithState recrawl scheduler: backoff doubles, resets on change, survives restart") {
    import spark.implicits._
    import graft.streaming.CrawlScheduler
    import graft.streaming.CrawlScheduler.Observation
    val base = "/tmp/graft-test/crawl-state"
    IndexBuilder.deleteDir(spark, base)
    val input = s"$base/in"

    def obs(rows: Seq[(String, String, String)]) =
      rows.map { case (d, h, t) =>
        Observation(d, h, java.sql.Timestamp.valueOf(t)) }.toDS().toDF()

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(input).schema).parquet(input)
        .as[Observation]
      val q = CrawlScheduler.track(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.CrawlScheduler.Schedule],
           _: Long) => b.write.mode("append").parquet(s"$base/out"); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: first sighting of both domains
    obs(Seq(("a.org", "h1", "2026-01-01 00:00:00"),
      ("b.org", "h9", "2026-01-01 00:00:00")))
      .write.mode("overwrite").parquet(input)
    runOnce()
    // batch 2 (new files; state recovered from the checkpoint across a
    // fresh query): a.org changes (reset), b.org unchanged twice (double x2)
    obs(Seq(("a.org", "h2", "2026-01-02 00:00:00"),
      ("b.org", "h9", "2026-01-02 00:00:00"),
      ("b.org", "h9", "2026-01-03 00:00:00")))
      .write.mode("append").parquet(input)
    runOnce()

    // latest schedule per domain = the row with the highest crawlCount
    val last = spark.read.parquet(s"$base/out")
      .orderBy(col("crawlCount").asc).collect()
      .map(r => r.getAs[String]("domain") -> (
        r.getAs[Long]("crawlCount"), r.getAs[Int]("backoffMultiplier"),
        r.getAs[Double]("changeFrequency"),
        r.getAs[Long]("nextCrawlDelayMinutes"))).toMap
    // a.org: 2 crawls, changed -> multiplier reset to 1, ema = 0.3; the
    // change stamps previous_change_time = now, so delta=0 -> 1h floor = 60
    assert(last("a.org") == ((2L, 1, 0.3, 60L)), s"got ${last("a.org")}")
    // b.org: 3 crawls, unchanged twice -> multiplier 1*2*2 = 4, ema 0.0;
    // last change was first sighting (01-01), last seen 01-03 -> delta 48h,
    // delay = min(720, 48*4) = 192h = 11520 min (crawl_metadata.h:41-43)
    assert(last("b.org") == ((3L, 4, 0.0, 11520L)), s"got ${last("b.org")}")
  }

  test("watermarked windowed aggregation over an event stream") {
    import spark.implicits._
    val base = "/tmp/graft-test/stream-events"
    IndexBuilder.deleteDir(spark, base)
    val events = Seq(
      ("2026-01-01 00:01:30", "click", 1.0),
      ("2026-01-01 00:02:10", "click", 2.0),
      ("2026-01-01 00:06:00", "view", 5.0),
      ("2026-01-01 00:07:30", "click", 3.0)
    ).toDF("ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    events.write.mode("overwrite").parquet(s"$base/in")

    val stream = spark.readStream.schema(spark.read.parquet(s"$base/in").schema)
      .parquet(s"$base/in")
    val agg = StreamingIndexer.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.sql("SELECT event_type, n, total FROM win_out ORDER BY event_type, n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // windows: [00:00,00:05) clicks n=2 total=3; [00:05,00:10) click n=1 t=3, view n=1 t=5
    assert(out.toSet == Set(("click", 1L, 3.0), ("click", 2L, 3.0), ("view", 1L, 5.0)))
  }
}
