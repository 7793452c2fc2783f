package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{LocalSearcher, QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.scalatest.funsuite.AnyFunSuite

/** Serving mode must be rank- AND score-identical to the distributed
  * engine — same index tables, same scoring code, no Spark jobs per query. */
class LocalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val (index, local) = {
    val dir = "/tmp/graft-test/local-index"
    IndexBuilder.build(spark,
      CorpusGen.generateDF(spark, 1000L, seed = 19L, partitions = 4), dir,
      IndexBuilder.Params(blockSize = 64, docGroupSize = 256L,
        fields = Seq("content", "path")))
    val idx = new SearchIndex(spark, dir)
    (idx, LocalSearcher.load(idx))
  }

  private val queries = Seq("python tutorial", "machine learning basics",
    "database performance tuning", "javascript async await",
    "react hooks usestate", "the if return")

  test("serving mode == distributed search (rank + score), incl. diversity") {
    val opts = SearchOpts(k = 10)
    queries.foreach { q =>
      val dist = QueryEngine.search(index, q, opts)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val loc = LocalSearcher.search(local, q, opts)
        .map(h => (h.rank, h.docId, h.score))
      assert(loc == dist, s"serving mode diverged on '$q'")
    }
  }

  test("serving mode == distributed search with multi-field + phrase") {
    val opts = SearchOpts(k = 10, fields = Seq("content" -> 1.5, "path" -> 2.5),
      phraseBoost = 2.0)
    Seq("machine learning", "python tutorial").foreach { q =>
      val dist = QueryEngine.search(index, q, opts)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val loc = LocalSearcher.search(local, q, opts)
        .map(h => (h.rank, h.docId, h.score))
      assert(loc == dist, s"serving mode diverged on '$q' (multi-field)")
    }
  }

  test("sharded serving (scatter-gather over docGroup shards) == unsharded") {
    val sharded = LocalSearcher.loadSharded(index, nShards = 3)
    // shards partition the doc space exactly
    assert(sharded.shards.map(_.docs.size).sum == local.docs.size)
    assert(sharded.shards.forall(_.docs.nonEmpty))
    for {
      opts <- Seq(SearchOpts(k = 10),
        SearchOpts(k = 10, diversity = false),
        SearchOpts(k = 10, fields = Seq("content" -> 1.5, "path" -> 2.5),
          phraseBoost = 2.0))
      q <- queries
    } {
      val one = LocalSearcher.search(local, q, opts)
      val many = LocalSearcher.searchSharded(sharded, q, opts)
      assert(many == one, s"sharded serving diverged on '$q' ($opts)")
    }
  }

  test("serving-mode latency is reference-class (sub-20ms once warm)") {
    val opts = SearchOpts(k = 10)
    queries.foreach(q => LocalSearcher.search(local, q, opts)) // warm
    val times = (1 to 5).flatMap { _ =>
      queries.map { q =>
        val t0 = System.nanoTime()
        LocalSearcher.search(local, q, opts)
        (System.nanoTime() - t0) / 1e6
      }
    }.sorted
    val p50 = times(times.length / 2)
    // generous bound: the reference reports 3-20ms on comparable corpus size
    assert(p50 < 50.0, s"serving p50 ${p50}ms too slow: $times")
  }

  test("empty/unknown queries return empty") {
    assert(LocalSearcher.search(local, "", SearchOpts()).isEmpty)
    assert(LocalSearcher.search(local, "zzzznotaword", SearchOpts()).isEmpty)
  }
}
