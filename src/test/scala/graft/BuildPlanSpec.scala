package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 optimization invariants for the build's scale-adaptive exchange
  * plan and the guarded warm() driver pin.
  *
  * The builder picks between a FUSED single exchange (batch docGroups ≥
  * 32 × shuffle partitions — the deployment regime, where the finished
  * blocks need no second shuffle) and the classic two-exchange plan (the
  * small/local regime, where a docGroup-keyed stage would be lumpy).
  * Block/dictionary CONTENT must be identical either way — only file
  * arrangement may differ. */
class BuildPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def blockRows(dir: String): Seq[(String, String, Long, Int, Long, Long,
      Int, Long, Int, Int, Int, Int, Seq[Byte])] =
    spark.read.parquet(s"$dir/postings")
      .selectExpr("field", "term", "cast(docGroup as long) docGroup", "blockIdx",
        "firstDocId", "lastDocId", "n", "sumTf", "maxTf", "minTf", "minDl",
        "maxDl", "bytes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getInt(6), r.getLong(7),
        r.getInt(8), r.getInt(9), r.getInt(10), r.getInt(11),
        r.getAs[Array[Byte]](12).toSeq))
      .toSeq.sortBy(t => (t._1, t._2, t._3, t._4))

  private def dictRows(dir: String): Seq[(String, String, Long, Long, Long, Int, Int)] =
    spark.read.parquet(s"$dir/dictionary")
      .select("field", "term", "df", "totalTf", "nBlocks", "maxTf", "minDl")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
      .toSeq.sorted

  test("fused single-exchange build (groups >= 32x shuffle partitions) is " +
      "content-identical to the two-exchange plan") {
    val n = 600L
    // docGroupSize 2 -> 300 groups: >= 32*8 under the test session's 8
    // shuffle partitions (fused), < 32*512 under 512 (two-exchange)
    val params = IndexBuilder.Params(blockSize = 8, docGroupSize = 2L,
      fields = Seq("content"))
    val corpus = CorpusGen.generateDF(spark, n, 7L, partitions = 3)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val fusedDir = "/tmp/graft-test/fused-build"
    val twoDir = "/tmp/graft-test/twoex-build"
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      IndexBuilder.deleteDir(spark, fusedDir)
      IndexBuilder.build(spark, corpus, fusedDir, params)
      spark.conf.set("spark.sql.shuffle.partitions", "512")
      IndexBuilder.deleteDir(spark, twoDir)
      IndexBuilder.build(spark, corpus, twoDir, params)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert(blockRows(fusedDir).nonEmpty)
    assert(blockRows(fusedDir) == blockRows(twoDir),
      "posting blocks differ between the fused and two-exchange plans")
    assert(dictRows(fusedDir) == dictRows(twoDir))

    val opts = SearchOpts(k = 10, overfetch = 3, diversity = true)
    val a = QueryEngine.search(new SearchIndex(spark, fusedDir),
      "python tutorial", opts).collect().toSeq
    val b = QueryEngine.search(new SearchIndex(spark, twoDir),
      "python tutorial", opts).collect().toSeq
    assert(a == b, "search diverged between build plans")
  }

  test("warm() refuses the driver dictionary pin above the budget and keeps " +
      "search identical on the probe path") {
    val dir = "/tmp/graft-test/warm-guard"
    IndexBuilder.deleteDir(spark, dir)
    IndexBuilder.build(spark,
      CorpusGen.generateDF(spark, 300L, 9L, partitions = 3), dir,
      IndexBuilder.Params(blockSize = 32, docGroupSize = 128L))
    val pinned = new SearchIndex(spark, dir).warm()
    assert(pinned.dictionaryPinned, "small dictionary must pin")
    val refused = new SearchIndex(spark, dir).warm(maxDictTerms = 1L)
    assert(!refused.dictionaryPinned, "over-budget dictionary must refuse the pin")
    val opts = SearchOpts(k = 10, overfetch = 3, diversity = false)
    val a = QueryEngine.search(pinned, "machine learning", opts).collect().toSeq
    val b = QueryEngine.search(refused, "machine learning", opts).collect().toSeq
    assert(a == b, "refused pin changed results")
  }
}
