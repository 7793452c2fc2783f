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

    // resume with the FULL corpus: only pending groups get built
    IndexBuilder.resume(spark, corpus, part, params)

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

  test("resume on a complete index is a no-op for postings counts") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, 300L, seed = 13L, partitions = 3)
    val dir = "/tmp/graft-test/resume-noop"
    IndexBuilder.build(spark, corpus, dir, params)
    val before = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().toSeq
    IndexBuilder.resume(spark, corpus, dir, params)
    val after = spark.read.parquet(s"$dir/metrics")
      .select("postingsEmitted").as[Long].collect().toSeq
    assert(before == after, "resume double-counted postings")
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
