package graft

import graft.core.CorpusGen
import graft.index.{IndexBuilder, Retention}
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retention/rollover: expiring a committed segment must leave an index
  * indistinguishable from a fresh build of the surviving rows (the ISM
  * delete + alias-swap analog, reference indexer/ism_policy.json:1-36). */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = IndexBuilder.Params(blockSize = 32, docGroupSize = 128L,
    fields = Seq("content"))

  test("expireSnapshots drops a segment; survivors == fresh build of survivors") {
    import spark.implicits._
    val b1 = CorpusGen.generateDF(spark, 200L, seed = 41L, partitions = 2)
    val b2 = CorpusGen.generateDF(spark, 200L, seed = 41L, partitions = 2)
      .withColumn("docId", $"docId" + 1000L)
    val dir = "/tmp/graft-test/retention"
    val fresh = "/tmp/graft-test/retention-fresh"
    IndexBuilder.build(spark, b1, dir, params)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))

    Retention.expireSnapshots(spark, dir, Seq("snapshot-0"))

    assert(spark.read.parquet(s"$dir/docs").count() == 200L)
    val snaps = spark.read.parquet(s"$dir/lineage")
      .select("inputSnapshot").distinct().as[String].collect().toSet
    assert(snaps == Set("snapshot-1"))

    IndexBuilder.build(spark, b2, fresh, params)
    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict(dir) == dict(fresh), "post-expiry dictionary != fresh build")
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stats(dir) == stats(fresh), "post-expiry stats != fresh build")

    val iExp = new SearchIndex(spark, dir)
    val iFresh = new SearchIndex(spark, fresh)
    Seq("python tutorial", "machine learning").foreach { q =>
      val a = QueryEngine.search(iExp, q, SearchOpts()).collect().map(_.toSeq).toSeq
      val b = QueryEngine.search(iFresh, q, SearchOpts()).collect().map(_.toSeq).toSeq
      assert(a == b, s"expired index answers differently on '$q'")
    }
  }

  test("expiring the entire index is refused; glob metacharacters in ids are inert") {
    import spark.implicits._
    val dir = "/tmp/graft-test/retention-guard"
    IndexBuilder.build(spark,
      CorpusGen.generateDF(spark, 100L, seed = 47L, partitions = 2), dir, params)
    val e = intercept[IllegalArgumentException] {
      Retention.expireSnapshots(spark, dir, Seq("snapshot-0"))
    }
    assert(e.getMessage.contains("every segment"))
    // glob-metacharacter snapshot ids must only match themselves
    val b2 = CorpusGen.generateDF(spark, 100L, seed = 47L, partitions = 2)
      .withColumn("docId", $"docId" + 1000L)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snap[2026]"))
    Retention.expireSnapshots(spark, dir, Seq("snap[2026]"))
    assert(spark.read.parquet(s"$dir/docs").count() == 100L,
      "bracketed snapshot id expired the wrong partitions")
    val snaps = spark.read.parquet(s"$dir/lineage")
      .select("inputSnapshot").distinct().as[String].collect().toSet
    assert(snaps == Set("snapshot-0"))
  }

  test("crash between partition deletes and refreshDerived is recovered via the pending marker") {
    import spark.implicits._
    val dir = "/tmp/graft-test/retention-crash"
    val fresh = "/tmp/graft-test/retention-crash-fresh"
    val b1 = CorpusGen.generateDF(spark, 200L, seed = 53L, partitions = 2)
    val b2 = CorpusGen.generateDF(spark, 200L, seed = 53L, partitions = 2)
      .withColumn("docId", $"docId" + 1000L)
    IndexBuilder.build(spark, b1, dir, params)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))

    // Simulate the crash window: marker written, docs partitions deleted,
    // postings/lineage NOT yet touched, refreshDerived never ran.
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_pending_expiry")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(marker, true)
    try out.write("snapshot-0".getBytes("UTF-8")) finally out.close()
    graft.io.ParquetTableIO.deletePartitions(spark, s"$dir/docs",
      Seq("docGroup" -> "*", "segment" -> "snapshot-0"))

    // Recovery must finish the deletes AND re-derive dictionary/stats.
    assert(Retention.recoverPendingExpiry(spark, dir))
    assert(!fs.exists(marker), "marker must be cleared after recovery")
    assert(spark.read.parquet(s"$dir/docs").count() == 200L)
    val snaps = spark.read.parquet(s"$dir/lineage")
      .select("inputSnapshot").distinct().as[String].collect().toSet
    assert(snaps == Set("snapshot-1"), "lineage of the expired segment survived the crash")

    IndexBuilder.build(spark, b2, fresh, params)
    def dict(d: String) = spark.read.parquet(s"$d/dictionary")
      .select("field", "term", "df", "totalTf").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict(dir) == dict(fresh), "recovered dictionary != fresh build of survivors")
    def stats(d: String) = spark.read.parquet(s"$d/stats")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stats(dir) == stats(fresh), "recovered stats != fresh build of survivors")

    // idempotent: a second recover call is a no-op
    assert(!Retention.recoverPendingExpiry(spark, dir))
  }

  test("expireOlderThan picks snapshots by lineage age") {
    import spark.implicits._
    val dir = "/tmp/graft-test/retention-age"
    val b1 = CorpusGen.generateDF(spark, 150L, seed = 43L, partitions = 2)
    IndexBuilder.build(spark, b1, dir, params)
    val ts1 = spark.read.parquet(s"$dir/lineage")
      .agg(max($"updatedAt")).collect()(0).getTimestamp(0)
    Thread.sleep(1500)
    val b2 = CorpusGen.generateDF(spark, 150L, seed = 43L, partitions = 2)
      .withColumn("docId", $"docId" + 1000L)
    IndexBuilder.resume(spark, b2, dir, params.copy(inputSnapshot = "snapshot-1"))

    val cutoff = new java.sql.Timestamp(ts1.getTime + 500)
    val expired = Retention.expireOlderThan(spark, dir, cutoff)
    assert(expired == Seq("snapshot-0"))
    assert(spark.read.parquet(s"$dir/docs").count() == 150L)
    assert(spark.read.parquet(s"$dir/docs").agg(min($"docId"))
      .collect()(0).getLong(0) == 1000L)
  }
}
