package graft.bench

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{LocalSearcher, OracleBM25, QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.SparkSession

/** One-off large differential: engine (exhaustive, WAND, serving mode) vs
  * the single-threaded oracle on a 20k-doc corpus — 16x the CI suite's
  * corpus, exercising many more block/group boundaries. Prints PASS/FAIL
  * per query set. Usage: runMain graft.bench.BigDiff [nDocs] */
object BigDiff {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/tmp/graft-bigdiff/index"
    val corpus = CorpusGen.generateDF(spark, n, seed = 101L, partitions = 16)
    IndexBuilder.build(spark, corpus, dir,
      IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
        fields = Seq("content", "path")))
    val index = new SearchIndex(spark, dir)
    val local = LocalSearcher.load(index)

    // the same corpus through the full ingest LIFECYCLE: three straddled
    // resume batches, a tail merge, then a full compaction — must answer
    // every combo identically to the monolithic build
    val dirL = "/tmp/graft-bigdiff/index-lifecycle"
    val paramsL = IndexBuilder.Params(blockSize = 128, docGroupSize = 1024L,
      fields = Seq("content", "path"))
    import org.apache.spark.sql.functions.col
    IndexBuilder.build(spark, corpus.filter(col("docId") < n / 3), dirL,
      paramsL.copy(inputSnapshot = "b0"))
    IndexBuilder.resume(spark, corpus.filter(col("docId") < 2 * n / 3), dirL,
      paramsL.copy(inputSnapshot = "b1"))
    IndexBuilder.resume(spark, corpus, dirL, paramsL.copy(inputSnapshot = "b2"))
    graft.index.Compaction.compactToBudget(spark, dirL, maxSegments = 2)
    graft.index.Compaction.compact(spark, dirL)
    val indexL = new SearchIndex(spark, dirL)

    // oracle over the same docs
    val meta = index.docs
      .select("docId", "repo", "path", "qualityScore", "repoScore")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4))).toMap
    val docs = corpus.select("docId", "content", "path").collect().map { r =>
      val id = r.getLong(0)
      val (repo, path, q, rs) = meta(id)
      OracleBM25.OracleDoc(id, repo, path,
        Map("content" -> r.getString(1), "path" -> r.getString(2)), q, rs)
    }.toSeq
    val oidx = new OracleBM25.Index(docs, Seq("content", "path"))

    val queries = Seq(
      "python tutorial", "javascript async await", "machine learning basics",
      "react hooks useState", "python optimization",
      "machine learning algorithms", "react hooks tutorial",
      "database performance tuning", "python machine learning optimization",
      "javascript async programming", "python programming tutorial",
      "machine learning optimization")
    val optsList = Seq(
      ("single-field", SearchOpts(k = 10)),
      ("single-field WAND", SearchOpts(k = 10, wand = true)),
      ("multi-field+phrase", SearchOpts(k = 10,
        fields = Seq("content" -> 1.5, "path" -> 2.5), phraseBoost = 2.0)),
      ("multi-field+phrase WAND", SearchOpts(k = 10,
        fields = Seq("content" -> 1.5, "path" -> 2.5), phraseBoost = 2.0,
        wand = true)))

    var failures = 0
    optsList.foreach { case (label, opts) =>
      queries.foreach { q =>
        val want = OracleBM25.search(oidx, docs, q, opts)
          .map(h => (h.rank, h.docId, h.score))
        val dist = QueryEngine.search(index, q, opts).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
        val serv = LocalSearcher.search(local, q, opts)
          .map(h => (h.rank, h.docId, h.score))
        val life = QueryEngine.search(indexL, q, opts).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
        if (dist != want || serv != want || life != want) {
          failures += 1
          println(s"FAIL [$label] '$q'\n  oracle=$want\n  dist=$dist\n  serv=$serv\n  lifecycle=$life")
        }
      }
      println(s"checked [$label]: ${queries.size} queries")
    }
    println(if (failures == 0)
      s"BIGDIFF PASS: ${optsList.size * queries.size} query/config combos rank+score " +
        s"identical at n=$n (exhaustive, WAND, serving, resume+compact lifecycle)"
    else s"BIGDIFF FAIL: $failures combos diverged")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
