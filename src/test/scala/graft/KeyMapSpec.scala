package graft

import graft.core.CorpusGen
import graft.index.{Deletes, IndexBuilder, KeyMap, Upsert}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KeyMap — the live natural-key → (docId, sha256) sidecar that makes the
  * steady re-crawl upsert probe O(touched buckets) instead of O(index):
  *
  *   - differential: a batch classified through the keymap produces the
  *     SAME result, docs table and live view as the ground-truth docs
  *     probe, and the incrementally-maintained keymap equals a rebuild
  *     from ground truth (bitwise row set, including buckets);
  *   - a bucket whose rows all die without a same-key add is CLEARED
  *     (dynamic overwrite alone would leave its stale rows behind);
  *   - crash/out-of-band semantics: no marker -> keymap never read, upsert
  *     stays correct against arbitrary keymap-table garbage, marker
  *     restored after;
  *   - out-of-band mutations (resume, deleteIds) drop the marker;
  *   - the probe's scan is partition-pruned to the touched buckets.
  */
class KeyMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = IndexBuilder.Params(blockSize = 32, docGroupSize = 64L,
    fields = Seq("content"), inputSnapshot = "snapshot-km1")
  private val key = Seq("repo", "path")
  private val N = 150L

  private def v1 = CorpusGen.generateDF(spark, N, seed = 31L, partitions = 3)

  private def build(dir: String): Unit = {
    IndexBuilder.deleteDir(spark, dir)
    IndexBuilder.build(spark, v1,
      dir, params.copy(inputSnapshot = "snapshot-base"))
  }

  /** A re-crawl batch touching a key slice: updates ids %7==0, adds
    * `fresh` new paths, re-presents ids %7==1 unchanged. */
  private def batch(tag: String, fresh: Int): DataFrame = {
    val changed = v1.filter(col("docId") % 7 === 0).drop("docId")
      .withColumn("content", concat(col("content"), lit(s" upd$tag")))
    val unchanged = v1.filter(col("docId") % 7 === 1).drop("docId")
    val brandNew = v1.filter(col("docId") < fresh).drop("docId")
      .withColumn("path", concat(col("path"), lit(s".$tag")))
      .withColumn("content", concat(lit(s"new$tag body "), col("content")))
    changed.unionByName(unchanged).unionByName(brandNew)
      .withColumn("sha256", sha2(col("content"), 256))
  }

  private def liveView(dir: String): Set[(String, String, String)] = {
    val docs = spark.read.parquet(s"$dir/docs")
    val dead = Deletes.df(spark, dir).map(_.select("docId"))
      .getOrElse(docs.select("docId").limit(0))
    docs.join(dead, Seq("docId"), "left_anti")
      .select("repo", "path", "sha256").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
  }

  private def keymapRows(dir: String): Set[Seq[Any]] =
    spark.read.parquet(KeyMap.table(dir))
      .select(col("repo"), col("path"), col("docId").cast("long"),
        col("sha256"), col("keyBucket").cast("long"))
      .collect().map(_.toSeq).toSet

  test("differential: keymap-probed batch == ground-truth-probed batch, " +
      "and incremental maintenance == rebuild from ground truth") {
    val dA = "/tmp/graft-test/km-diff-a"
    val dB = "/tmp/graft-test/km-diff-b"
    build(dA); build(dB)

    // batch 1 bootstraps the keymap on both (fallback probe + rebuild)
    val b1 = batch("one", fresh = 5)
    val p1 = params.copy(inputSnapshot = "snap-km-b1")
    assert(Upsert.upsert(spark, b1, dA, p1, key) ==
      Upsert.upsert(spark, b1, dB, p1, key))
    // auto-provisioned: max(16, liveKeys/512) = 16 at this corpus size
    assert(KeyMap.validBuckets(spark, dA, key).contains(16))

    // batch 2: dA probes THROUGH the keymap; dB is forced onto the
    // ground-truth docs probe by invalidating its marker
    KeyMap.invalidate(spark, dB)
    val b2 = batch("two", fresh = 9)
    val p2 = params.copy(inputSnapshot = "snap-km-b2")
    val rA = Upsert.upsert(spark, b2, dA, p2, key)
    val rB = Upsert.upsert(spark, b2, dB, p2, key)
    assert(rA == rB, "keymap probe must classify identically to ground truth")
    assert(rA.added > 0 && rA.tombstoned > 0 && rA.unchangedSkipped > 0,
      "the differential batch must exercise all three arms")
    assert(liveView(dA) == liveView(dB))
    def docsOf(d: String) = spark.read.parquet(s"$d/docs")
      .select("docId", "repo", "path", "sha256").collect().map(_.toSeq).toSet
    assert(docsOf(dA) == docsOf(dB), "fresh-id assignment must not depend on probe path")

    // dA's keymap came from applyBatch (incremental), dB's from rebuild
    // (its batch-2 probe was invalid) — they must be the same table
    assert(keymapRows(dA) == keymapRows(dB),
      "incremental bucket maintenance must equal a ground-truth rebuild")

    // and the keymap IS the live view
    assert(keymapRows(dA).map(s => (s(0), s(1), s(3))) ==
      liveView(dA).map(t => (t._1: Any, t._2: Any, t._3: Any)))
  }

  test("a tombstone-only bucket is cleared, not left stale " +
      "(dynamic-overwrite gap)") {
    val dir = "/tmp/graft-test/km-deadbucket"
    build(dir)
    KeyMap.rebuild(spark, dir, key)
    val nb = KeyMap.validBuckets(spark, dir, key).get

    // tombstone ONE key with no same-key add: its bucket may contain other
    // keys or not — either way the dead row must be gone from the probe
    val victim = v1.filter(col("docId") === 3)
      .select(col("docId"), col("repo"), col("path"))
    val empty = v1.limit(0).select(col("repo"), col("path"), col("docId"),
      sha2(col("content"), 256).as("sha256"))
    KeyMap.applyBatch(spark, dir, empty, victim, key, nb)

    // the probe returns the whole touched bucket (other live keys may share
    // it under auto-provisioned counts) — the VICTIM's row must be gone
    val probed = KeyMap.probe(spark, dir, victim.select("repo", "path"), key, nb)
      .collect()
    assert(!probed.exists(_.getAs[Long]("_oldId") == 3L),
      "tombstoned row survived in its keymap bucket")
    // the rest of the table is intact: a full rebuild differs by exactly
    // the victim row
    val after = keymapRows(dir)
    KeyMap.rebuild(spark, dir, key)
    val full = keymapRows(dir)
    assert((full -- after).map(_(2)) == Set(3L) && (after -- full).isEmpty)
  }

  test("no marker -> keymap never read: upsert survives keymap-table " +
      "garbage and restores the marker") {
    val dir = "/tmp/graft-test/km-garbage"
    build(dir)
    val b1 = batch("one", fresh = 4)
    Upsert.upsert(spark, b1, dir, params.copy(inputSnapshot = "snap-g1"), key)
    val view = liveView(dir)

    // simulate the crash residue: marker gone (every mutation drops it
    // first), keymap table arbitrarily wrong (half-rewritten buckets)
    KeyMap.invalidate(spark, dir)
    val junk = v1.limit(7).select(col("repo"), col("path"),
      (col("docId") + 100000L).as("docId"), lit("deadbeef").as("sha256"))
      .withColumn("keyBucket", lit(0L))
    junk.write.mode("overwrite").partitionBy("keyBucket")
      .parquet(KeyMap.table(dir))

    // idempotent re-run classifies against ground truth: complete no-op
    val r = Upsert.upsert(spark, b1, dir, params.copy(inputSnapshot = "snap-g1"), key)
    assert(r.added == 0L && r.tombstoned == 0L)
    assert(liveView(dir) == view)
    // and the maintenance step rebuilt a correct keymap + marker
    assert(KeyMap.validBuckets(spark, dir, key).nonEmpty)
    assert(keymapRows(dir).map(s => (s(0), s(1), s(3))) ==
      view.map(t => (t._1: Any, t._2: Any, t._3: Any)))
  }

  test("out-of-band mutations drop the marker; a different key spec " +
      "does not validate") {
    val dir = "/tmp/graft-test/km-invalid"
    build(dir)
    KeyMap.rebuild(spark, dir, key)
    assert(KeyMap.validBuckets(spark, dir, key).nonEmpty)
    assert(KeyMap.validBuckets(spark, dir, Seq("repo")).isEmpty,
      "a keymap built for (repo,path) must not serve a repo-keyed probe")

    // plain resume (non-upsert append) invalidates
    val extra = CorpusGen.generateDF(spark, 170L, seed = 31L, partitions = 2)
      .filter(col("docId") >= N)
    IndexBuilder.resume(spark, extra, dir, params.copy(inputSnapshot = "snap-r2"))
    assert(KeyMap.validBuckets(spark, dir, key).isEmpty, "resume must invalidate")

    KeyMap.rebuild(spark, dir, key)
    // out-of-band tombstones invalidate
    Deletes.deleteIds(spark, dir, v1.filter(col("docId") === 1).select("docId"))
    assert(KeyMap.validBuckets(spark, dir, key).isEmpty, "deleteIds must invalidate")
  }

  test("auto-provision: 10x organic growth through upserts re-provisions " +
      "the bucket count and keeps a fixed probe flat — no manual keymapBuckets") {
    val dir = "/tmp/graft-test/km-grow"
    build(dir)
    // tiny per-bucket target so the growth guard triggers at test scale;
    // keymapBuckets stays 0 (auto) throughout — the point of the test
    val p = params.copy(keymapTargetKeys = 8L)
    Upsert.upsert(spark, batch("g0", fresh = 3), dir,
      p.copy(inputSnapshot = "snap-g0"), key)
    val nb0 = KeyMap.validBuckets(spark, dir, key).get
    assert(nb0 >= 16, s"bootstrap rebuild must auto-provision (nb=$nb0)")

    def probeBytes(): Double = {
      val nb = KeyMap.validBuckets(spark, dir, key).get
      val probe = KeyMap.probe(spark, dir,
        v1.filter(col("docId") < 20).select("repo", "path"), key, nb)
      probe.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.totalFileSize.toDouble
      }.sum
    }
    val bytes1x = probeBytes()

    // ~10x the live keys through upsert ADDS (fresh keys per seed), marker
    // valid throughout — the steady loop, no out-of-band mutations
    (1 to 10).foreach { i =>
      val fresh = CorpusGen.generateDF(spark, N, seed = 1000L + i, partitions = 3)
        .drop("docId").withColumn("sha256", sha2(col("content"), 256))
      val r = Upsert.upsert(spark, fresh, dir,
        p.copy(inputSnapshot = s"snap-g$i"), key)
      assert(r.added > 0)
    }
    val nb1 = KeyMap.validBuckets(spark, dir, key).get
    assert(nb1 > nb0,
      s"organic 10x growth must re-provision the bucket count ($nb0 -> $nb1)")
    // the growth guard held: no bucket beyond SplitFactor x target
    val maxBucket = spark.read.parquet(KeyMap.table(dir))
      .groupBy(col("keyBucket")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxBucket <= KeyMap.SplitFactor * 8L * 2,
      s"bucket outgrew the re-provisioned layout: $maxBucket rows")
    // the SAME fixed probe reads ~flat bytes at 10x the corpus (footer +
    // pinned bucket size; without re-provision this grows ~10x)
    val bytes10x = probeBytes()
    assert(bytes10x <= 3.0 * bytes1x,
      s"probe not flat under growth: $bytes1x -> $bytes10x bytes")
    // and the keymap still equals ground truth (the differential that makes
    // the re-provision trustworthy)
    val view = liveView(dir)
    assert(keymapRows(dir).map(s => (s(0), s(1), s(3))) ==
      view.map(t => (t._1: Any, t._2: Any, t._3: Any)))
  }

  test("probe scan is partition-pruned to the touched buckets") {
    val dir = "/tmp/graft-test/km-prune"
    build(dir)
    KeyMap.rebuild(spark, dir, key)
    val nb = KeyMap.validBuckets(spark, dir, key).get
    val probe = KeyMap.probe(spark, dir,
      v1.filter(col("docId") < 3).select("repo", "path"), key, nb)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("keyBucket"),
      s"probe must prune on the keyBucket partition key:\n$plan")
    // the pruned scan reads at most the touched buckets' directories
    val touchedDirs = probe.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }.sum
    assert(touchedDirs <= 3, s"expected <=3 touched buckets, scanned $touchedDirs")
  }
}
