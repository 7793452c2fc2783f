package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-resume semantics (north_rule): a build interrupted after some
  * docGroups completes via lineage anti-join, and the result is
  * indistinguishable from a from-scratch build — exactly-once postings, no
  * double-counted tf (SURVEY §7.6 hard-part 5). */
class ResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = IndexBuilder.Params(blockSize = 32, docGroupSize = 128L,
    fields = Seq("content"))

  test("partial build + resume == full build (dictionary, stats, lineage, search)") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 600L, seed = 11L, partitions = 4)
    val full = "/tmp/graft-test/resume-full"
    val part = "/tmp/graft-test/resume-part"

    IndexBuilder.build(spark, corpus, full, params)

    // simulate a mid-build crash: only half the docGroups were committed
    val groups = corpus.select(floor($"docId" / 128d).cast("long").as("g"))
      .distinct().as[Long].collect().sorted
    val firstHalf = groups.take(groups.length / 2).toSet
    val partial = corpus.filter(floor($"docId" / 128d).cast("long")
      .isin(firstHalf.toSeq: _*))
    IndexBuilder.build(spark, partial, part, params)

    // lineage after the "crash" covers only the first half
    val lin1 = spark.read.parquet(s"$part/lineage")
      .select("partitionId").as[Long].collect().toSet
    assert(lin1 == firstHalf)

    // resume with the FULL corpus under a fresh snapshot: only pending rows
    // get built (distinct inputSnapshot per input batch is the contract)
    IndexBuilder.resume(spark, corpus, part,
      params.copy(inputSnapshot = "snapshot-1"))

    val lin2 = spark.read.parquet(s"$part/lineage")
      .select("partitionId").as[Long].collect().toSet
    assert(lin2 == groups.toSet)

    def dict(dir: String) = spark.read.parquet(s"$dir/dictionary")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(dict(part) == dict(full), "dictionary differs after resume")

    def stats(dir: String) = spark.read.parquet(s"$dir/stats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stats(part) == stats(full), "stats differ after resume")

    val iFull = new SearchIndex(spark, full)
    val iPart = new SearchIndex(spark, part)
    Seq("python tutorial", "machine learning", "the if return").foreach { q =>
      val a = QueryEngine.search(iFull, q, SearchOpts()).collect().map(_.toSeq).toSeq
      val b = QueryEngine.search(iPart, q, SearchOpts()).collect().map(_.toSeq).toSeq
      assert(a == b, s"resumed index answers differently on '$q'")
    }
  }

  test("incremental derived maintenance == full re-derivation, bitwise") {
    import spark.implicits._
    // three straddled batches (cuts inside docGroups of 128) ingested three
    // ways: derived tables maintained incrementally, re-derived fully every
    // batch, and a monolithic fresh build
    val all = CorpusGen.generateDF(spark, 600L, seed = 53L, partitions = 4)
    val inc = "/tmp/graft-test/incderived-inc"
    val fullRe = "/tmp/graft-test/incderived-fullre"
    val mono = "/tmp/graft-test/incderived-mono"
    val cuts = Seq(0L -> 150L, 150L -> 400L, 400L -> Long.MaxValue)
    def ingest(dir: String, incremental: Boolean): Unit =
      cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
        val batch = all.filter($"docId" >= lo && $"docId" < hi)
        val p = params.copy(inputSnapshot = s"s$i",
          incrementalDerived = incremental)
        if (i == 0) IndexBuilder.build(spark, batch, dir, p)
        else IndexBuilder.resume(spark, batch, dir, p)
      }
    ingest(inc, incremental = true)
    ingest(fullRe, incremental = false)
    IndexBuilder.build(spark, all, mono, params)

    def rows(d: String, t: String, cols: Seq[String]) =
      spark.read.parquet(s"$d/$t").select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    // vs the SAME-segmentation twin (fullRe): everything must be bitwise
    // equal, including block-packing-dependent columns (nBlocks, bytes)
    val dictCols = Seq("field", "term", "df", "totalTf", "nBlocks",
      "maxTf", "minDl", "tlen")
    assert(rows(inc, "dictionary", dictCols) == rows(fullRe, "dictionary", dictCols),
      "incremental dictionary != full re-derivation")
    // vs the MONOLITHIC build: packing-independent columns must agree (a
    // 3-segment index legitimately has more, partial, blocks)
    val dictStable = Seq("field", "term", "df", "totalTf", "maxTf", "minDl", "tlen")
    assert(rows(inc, "dictionary", dictStable) == rows(mono, "dictionary", dictStable),
      "incremental dictionary != monolithic build on packing-independent columns")
    val statCols = Seq("field", "n", "avgdl", "sumDl")
    assert(rows(inc, "stats", statCols) == rows(mono, "stats", statCols),
      "incremental stats != monolithic build (avgdl must be BITWISE equal)")
    val combinable = Seq("field", "docs", "postingsEmitted", "blocks",
      "bytesCompressed", "bytesRawEstimate", "shaViolations", "docIdCollisions")
    assert(rows(inc, "metrics", combinable) == rows(fullRe, "metrics", combinable),
      "incremental metrics (combinable columns) != full re-derivation")

    // fan-in is CARRIED by the incremental path (not combinable from
    // aggregates): after batch 0 the corpus spanned 2 groups, the straddled
    // appends grew common terms to 5 — the stale carried value is also the
    // sentinel proving the incremental path actually ran (no silent
    // fallback to the full refresh)
    def maxFan(d: String) = spark.read.parquet(s"$d/metrics")
      .select("maxMergeFanIn").as[Long].collect().head
    assert(maxFan(mono) == 5L, s"corpus shape drifted: maxFan=${maxFan(mono)}")
    assert(maxFan(inc) == 2L,
      "expected the carried (stale) fan-in — did the incremental path silently fall back?")
    // ... and the full/audit refresh brings fan-in up to date (compare to
    // the same-segmentation twin — fan-in itself is packing-independent,
    // bytes/blocks are not)
    IndexBuilder.refreshDerived(spark, inc)
    val metricAll = combinable ++ Seq("maxMergeFanIn", "avgMergeFanIn")
    assert(rows(inc, "metrics", metricAll) == rows(fullRe, "metrics", metricAll),
      "audit refresh did not reconcile the carried fan-in")

    // query-level differential on top of the table-level one
    val iInc = new SearchIndex(spark, inc)
    val iMono = new SearchIndex(spark, mono)
    Seq("python tutorial", "machine learning", "the if return").foreach { q =>
      val a = QueryEngine.search(iInc, q, SearchOpts()).collect().map(_.toSeq).toSeq
      val b = QueryEngine.search(iMono, q, SearchOpts()).collect().map(_.toSeq).toSeq
      assert(a == b, s"incrementally-maintained index answers differently on '$q'")
    }
  }

  test("incremental dictionary maintenance rewrites ONLY the touched " +
      "(tlen, termBucket) partitions; untouched files are bit-identical") {
    import spark.implicits._
    val all = CorpusGen.generateDF(spark, 600L, seed = 67L, partitions = 4)
    val dir = "/tmp/graft-test/dict-buckets"
    // tiny target so the vocabulary spans many buckets at test scale
    val p = params.copy(dictTargetBucketRows = 32L)
    IndexBuilder.build(spark, all.filter($"docId" < 590), dir, p)
    val nb = IndexBuilder.dictBucketCount(spark, dir).get
    assert(nb >= 8, s"fixture too small to exercise bucketing (nBuckets=$nb)")

    // dictionary file inventory: (tlen, termBucket, fileName) -> length
    val hconf = spark.sparkContext.hadoopConfiguration
    val dictPath = new org.apache.hadoop.fs.Path(s"$dir/dictionary")
    val fs = dictPath.getFileSystem(hconf)
    def inventory(): Map[String, Long] = {
      val out = scala.collection.mutable.Map[String, Long]()
      val it = fs.listFiles(dictPath, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          out(st.getPath.toString.stripPrefix(dictPath.toString)) = st.getLen
      }
      out.toMap
    }
    val before = inventory()

    // a SMALL batch: its vocabulary touches a strict subset of buckets
    IndexBuilder.resume(spark, all.filter($"docId" >= 590), dir,
      p.copy(inputSnapshot = "s1"))
    val after = inventory()

    // touched pairs, recomputed from the committed segment's own terms
    val touched = spark.read.parquet(s"$dir/postings")
      .filter($"segment" === "s1").select($"term").distinct()
      .as[String].collect()
      .map(t => (t.length, IndexBuilder.termBucketOf(t, nb))).toSet
    def pair(f: String): (Int, Int) = {
      val m = "tlen=(\\d+)/termBucket=(\\d+)".r.findFirstMatchIn(f).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    val allPairs = before.keySet.map(pair)
    assert(touched.nonEmpty && (allPairs -- touched).nonEmpty,
      s"fixture must leave some partitions untouched " +
        s"(touched=${touched.size}, existing=${allPairs.size})")
    // every file in an UNTOUCHED partition survives byte-for-byte (same
    // path, same length) — the incremental path never rewrote it
    before.foreach { case (f, len) =>
      if (!touched.contains(pair(f)))
        assert(after.get(f).contains(len),
          s"untouched partition rewritten by the incremental path: $f")
    }
    // ... and some touched partition actually changed
    assert(before.keySet != after.keySet, "the incremental rewrite wrote nothing")
    // table-level result identical to a monolithic build (values, not files)
    val full = "/tmp/graft-test/dict-buckets-full"
    IndexBuilder.build(spark, all, full, p)
    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf", "maxTf", "minDl", "termBucket")
      .collect().map(_.toSeq).toSet
    assert(dict(dir) == dict(full), "bucketed incremental != monolithic")
  }

  test("dictionary_meta absent (crash window / pre-bucket index) -> " +
      "incremental refuses; the full refresh restores the marker") {
    import spark.implicits._
    val all = CorpusGen.generateDF(spark, 300L, seed = 71L, partitions = 2)
    val dir = "/tmp/graft-test/dict-meta-crash"
    IndexBuilder.build(spark, all.filter($"docId" < 150), dir, params)
    assert(IndexBuilder.dictBucketCount(spark, dir).isDefined)
    graft.io.ParquetTableIO.drop(spark, s"$dir/dictionary_meta")
    assert(!IndexBuilder.refreshDerivedIncremental(spark, dir, "sX"),
      "no bucket marker -> the incremental path cannot address buckets")
    // an ordinary resume falls back to the full refresh and heals the marker
    IndexBuilder.resume(spark, all.filter($"docId" >= 150), dir,
      params.copy(inputSnapshot = "s1"))
    assert(IndexBuilder.dictBucketCount(spark, dir).isDefined,
      "full refresh must restore dictionary_meta")
  }

  test("incremental refresh refuses a snapshot already baked in (crash-retry falls back to full)") {
    import spark.implicits._
    val all = CorpusGen.generateDF(spark, 300L, seed = 59L, partitions = 2)
    val dir = "/tmp/graft-test/incderived-retry"
    IndexBuilder.build(spark, all.filter($"docId" < 150), dir, params)
    IndexBuilder.resume(spark, all.filter($"docId" >= 150), dir,
      params.copy(inputSnapshot = "s1"))
    // s1 is in the manifest now: a direct incremental call for it must
    // refuse (its contribution may already be merged) ...
    assert(!IndexBuilder.refreshDerivedIncremental(spark, dir, "s1"),
      "re-merging an already-baked segment would double-count postings")
    // ... and so must one for a crashed-swap residue state
    val stage = s"$dir/dictionary._stage"
    graft.io.ParquetTableIO.overwritePartitions(
      spark.read.parquet(s"$dir/dictionary"), stage, Nil)
    assert(!IndexBuilder.refreshDerivedIncremental(spark, dir, "s2"),
      "stage residue must force the full (sweeping) refresh")
    graft.io.ParquetTableIO.drop(spark, stage)
  }

  test("resume on a complete index is a no-op for postings counts") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 300L, seed = 13L, partitions = 3)
    val dir = "/tmp/graft-test/resume-noop"
    IndexBuilder.build(spark, corpus, dir, params)
    val before = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().toSeq
    IndexBuilder.resume(spark, corpus, dir,
      params.copy(inputSnapshot = "snapshot-1"))
    val after = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().toSeq
    assert(before == after, "resume double-counted postings")
  }

  test("pending-row filter is a join against lineage — no driver isin/collect") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 300L, seed = 19L, partitions = 3)
    val dir = "/tmp/graft-test/resume-plan"
    IndexBuilder.build(spark, corpus, dir, params)
    val withGroups = corpus
      .withColumn("docGroup", floor(col("docId") / 128d).cast("long"))
    val pending = IndexBuilder.pendingRows(withGroups,
      spark.read.parquet(s"$dir/lineage"), denseIds = true)
    val plan = pending.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"pending filter is not a join:\n$plan")
    assert(!plan.contains(" IN ("), s"pending filter uses literal isin:\n$plan")
    assert(pending.count() == 0, "complete index should have no pending rows")
  }

  test("append to a committed group lands as a new segment, not a drop") {
    import spark.implicits._
    // group 0 is [0, 128); first batch fills it only partially
    val all = CorpusGen.generateDF(spark, 200L, seed = 23L, partitions = 2)
    val b1 = all.filter($"docId" < 100)
    val b2 = all.filter($"docId" >= 100) // 100..127 straddle committed group 0
    val dir = "/tmp/graft-test/resume-straddle"
    val full = "/tmp/graft-test/resume-straddle-full"
    IndexBuilder.build(spark, b1, dir, params)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))
    IndexBuilder.build(spark, all, full, params)

    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict(dir) == dict(full), "straddled append lost or duplicated postings")
    assert(spark.read.parquet(s"$dir/docs").count() == 200L)

    val iApp = new SearchIndex(spark, dir)
    val iFull = new SearchIndex(spark, full)
    Seq("python tutorial", "machine learning", "the if return").foreach { q =>
      val a = QueryEngine.search(iApp, q, SearchOpts()).collect().map(_.toSeq).toSeq
      val b = QueryEngine.search(iFull, q, SearchOpts()).collect().map(_.toSeq).toSeq
      assert(a == b, s"appended index answers differently on '$q'")
    }
  }

  test("crash between segment write and lineage commit: retry is exactly-once") {
    import spark.implicits._
    val all = CorpusGen.generateDF(spark, 300L, seed = 31L, partitions = 2)
    val b1 = all.filter($"docId" < 150)
    val b2 = all.filter($"docId" >= 150)
    val dir = "/tmp/graft-test/resume-crash"
    val full = "/tmp/graft-test/resume-crash-full"
    IndexBuilder.build(spark, b1, dir, params)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))
    // simulate the crash window: postings/docs for snapshot-1 are on disk
    // but its lineage partition (the commit marker, written last) is not
    graft.io.ParquetTableIO.deletePartitions(spark, s"$dir/lineage",
      Seq("inputSnapshot" -> "snapshot-1"))
    // the retry re-presents the same batch under the SAME snapshot: its
    // dynamic partition overwrite must replace its own partitions, not
    // duplicate them
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))

    IndexBuilder.build(spark, all, full, params)
    assert(spark.read.parquet(s"$dir/docs").count() == 300L,
      "crash-retry duplicated or lost docs")
    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict(dir) == dict(full), "crash-retry double-counted postings")
    val q = "python tutorial"
    val a = QueryEngine.search(new SearchIndex(spark, dir), q, SearchOpts())
      .collect().map(_.toSeq).toSeq
    val b = QueryEngine.search(new SearchIndex(spark, full), q, SearchOpts())
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("a batch of zero-token docs still commits its lineage (no re-ingest loop)") {
    import spark.implicits._
    val b1 = CorpusGen.generateDF(spark, 100L, seed = 41L, partitions = 2)
    // batch 2: docs whose content tokenizes to NOTHING — no postings at all
    val b2 = spark.range(100, 120)
      .select($"id".as("docId"), lit("r0").as("repo"),
        concat(lit("p/"), $"id").as("path"), lit("c").as("commit"),
        lit("en").as("lang"), lit("!!! ??? ***").as("content"))
    val b3 = CorpusGen.generateDF(spark, 300L, seed = 41L, partitions = 2)
      .filter($"docId" >= 200 && $"docId" < 220)
    val dir = "/tmp/graft-test/resume-zerotok"
    IndexBuilder.build(spark, b1, dir, params)
    IndexBuilder.resume(spark, b2.toDF(), dir, params.copy(inputSnapshot = "s1"))
    // the zero-posting batch must be committed: its groups carry lineage
    val committedMax = spark.read.parquet(s"$dir/lineage")
      .agg(max($"maxDocId")).collect()(0).getLong(0)
    assert(committedMax == 119L,
      s"zero-token batch not committed (maxDocId=$committedMax)")
    // and later appends neither re-ingest it nor trip the collision audit
    IndexBuilder.resume(spark, b3, dir, params.copy(inputSnapshot = "s2"))
    assert(spark.read.parquet(s"$dir/docs").count() == 140L)
  }

  test("lineage int32 partitionId (pre-contract index) is migrated once at resume") {
    import spark.implicits._
    val all = CorpusGen.generateDF(spark, 300L, seed = 61L, partitions = 2)
    val dir = "/tmp/graft-test/lineage-v1"
    val full = "/tmp/graft-test/lineage-v1-full"
    IndexBuilder.build(spark, all.filter($"docId" < 150), dir, params)

    // fabricate the pre-contract state: lineage partitionId downcast to
    // int32, width marker absent
    val hconf = spark.sparkContext.hadoopConfiguration
    val linPath = new org.apache.hadoop.fs.Path(s"$dir/lineage")
    val fs = linPath.getFileSystem(hconf)
    val casted = spark.read.parquet(s"$dir/lineage")
      .withColumn("partitionId", col("partitionId").cast("int"))
    graft.io.ParquetTableIO.overwriteTable(casted, s"$dir/lineage_tmp",
      Seq("inputSnapshot"))
    fs.delete(linPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/lineage_tmp"), linPath)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_lineage_v2"), false)
    assert(spark.read.parquet(s"$dir/lineage").schema("partitionId").dataType ==
      org.apache.spark.sql.types.IntegerType, "fixture failed to downcast")

    // resume must detect the int32 width and rewrite BEFORE appending long
    // rows beside it (mixed-width parquet poisons schema merging)
    IndexBuilder.resume(spark, all.filter($"docId" >= 150), dir,
      params.copy(inputSnapshot = "snapshot-1"))

    // every lineage partition file is int64 now (probe per segment dir —
    // a merged-schema read can mask a single stale int32 file)
    fs.listStatus(linPath).filter(_.isDirectory).foreach { st =>
      assert(spark.read.parquet(st.getPath.toString)
        .schema("partitionId").dataType ==
        org.apache.spark.sql.types.LongType,
        s"${st.getPath.getName} still int32 after migration")
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_lineage_v2")),
      "migration must stamp the width marker")
    // and the migrated index behaves exactly like a monolithic build
    IndexBuilder.build(spark, all, full, params)
    assert(spark.read.parquet(s"$dir/docs").count() == 300L)
    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict(dir) == dict(full), "migration changed index contents")
  }

  test("hash-id corpora (no docId column): resume skips whole done groups") {
    import spark.implicits._
    // static-build contract: ids derive from xxhash64 -> pmod group buckets;
    // resume of the SAME corpus must be a no-op (group-level anti-join)
    val corpus = CorpusGen.generateDF(spark, 200L, seed = 37L, partitions = 2)
      .drop("docId")
    val dir = "/tmp/graft-test/resume-hashids"
    IndexBuilder.build(spark, corpus, dir, params)
    val before = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().head
    assert(before > 0)
    IndexBuilder.resume(spark, corpus, dir,
      params.copy(inputSnapshot = "snapshot-1"))
    val after = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().head
    assert(after == before, "hash-id resume re-ingested done groups")
    assert(spark.read.parquet(s"$dir/docs").count() == 200L)
  }

  test("docId collision audit fails the build") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 100L, seed = 29L, partitions = 2)
      .withColumn("docId", col("docId") % 50) // force collisions
    val e = intercept[IllegalStateException] {
      IndexBuilder.build(spark, corpus, "/tmp/graft-test/resume-collide", params)
    }
    assert(e.getMessage.contains("docId collision"))
  }

  test("sha256 invariant: corrupted content is detected per row and per group") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 200L, seed = 17L, partitions = 2)
    // corrupt one row: content changes but carried sha256 does not
    val corrupted = corpus.withColumn("content",
      when($"docId" === corpus.select(min($"docId")).as[Long].collect()(0),
        concat($"content", lit(" tampered"))).otherwise($"content"))
    val dir = "/tmp/graft-test/sha-violation"
    IndexBuilder.build(spark, corrupted, dir, params)
    val viol = spark.read.parquet(s"$dir/metrics")
      .select("shaViolations").as[Long].collect().head
    assert(viol == 1L, s"expected exactly 1 sha violation, got $viol")
    assert(spark.read.parquet(s"$dir/lineage").filter(!$"shaOk").count() == 1)
    assert(spark.read.parquet(s"$dir/docs").filter(!$"shaOk").count() == 1)
  }
}
