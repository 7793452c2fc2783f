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
    // shards partition the doc space exactly (probed at page grain now —
    // doc metadata is served by the bounded cache, not an at-open map)
    val allIds = index.docs.select("docId").collect().map(_.getLong(0)).toSeq
    val perShard = sharded.shards.map(_.docsOf(allIds))
    assert(perShard.map(_.size).sum == allIds.size,
      "shards must partition the doc space without overlap or loss")
    assert(perShard.forall(_.nonEmpty))
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

  test("block-max WAND skips block decodes on a tf-skewed corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 4000 docs: 30 planted docs at the FRONT carry 'needle' at tf=40;
    // ~1/3 of the rest carry it at tf=1 (df < N/2 keeps idf positive).
    // The heap floor rises to the planted scores within the first block,
    // after which every later block's upper bound (tf=1) falls below it —
    // the WAND machinery must skip those decodes entirely.
    val docs = spark.range(0, 4000).map { i =>
      val tf = if (i < 30) 40 else if (i % 3 == 0) 1 else 0
      val filler = (0 until (30 + (i % 40)).toInt)
        .map(j => s"w${(i * 7 + j) % 199}").mkString(" ")
      (i, "r" + (i % 5), s"p/$i", "en", (("needle " * tf) + filler).trim)
    }.toDF("docId", "repo", "path", "lang", "content")
    val dir = "/tmp/graft-test/skew-index"
    IndexBuilder.build(spark, docs, dir,
      IndexBuilder.Params(blockSize = 64, docGroupSize = 4096L))
    val li = LocalSearcher.load(new SearchIndex(spark, dir))
    val totalBlocks = li.blocksFor("content", "needle").length
    assert(totalBlocks > 10, s"expected many blocks, got $totalBlocks")

    li.decodeCount.set(0L)
    val hits = LocalSearcher.search(li, "needle",
      SearchOpts(k = 10, overfetch = 3, diversity = false))
    val decoded = li.decodeCount.get
    assert(hits.nonEmpty && hits.head.docId < 30L,
      s"top hit must be a planted high-tf doc, got ${hits.map(_.docId)}")
    assert(decoded < totalBlocks,
      s"block-max WAND decoded all $totalBlocks blocks — no pruning")
    // and pruning never changes results: exhaustive-equivalent check
    val dist = QueryEngine.search(new SearchIndex(spark, dir), "needle",
      SearchOpts(k = 10, overfetch = 3, diversity = false, wand = false))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(hits.map(h => (h.rank, h.docId, h.score)) == dist)
  }

  test("byte-budgeted block cache: identity under constant eviction + bounded footprint") {
    // a budget far below the index's postings bytes forces eviction on
    // every query; results must stay identical to the unbounded image and
    // the resident footprint must respect the cap
    val budget = 16 * 1024L
    val capped = LocalSearcher.load(index, blockCacheBytes = budget)
    for {
      opts <- Seq(SearchOpts(k = 10),
        SearchOpts(k = 10, fields = Seq("content" -> 1.5, "path" -> 2.5),
          phraseBoost = 2.0))
      q <- queries
    } {
      val a = LocalSearcher.search(capped, q, opts)
      val b = LocalSearcher.search(local, q, opts)
      assert(a == b, s"budgeted serving diverged on '$q' ($opts)")
      assert(capped.residentBlockBytes <= budget,
        s"cache over budget: ${capped.residentBlockBytes} > $budget")
    }
    // repeat pass: still identical (evicted terms re-fetch correctly)
    queries.foreach { q =>
      assert(LocalSearcher.search(capped, q, SearchOpts(k = 10)) ==
        LocalSearcher.search(local, q, SearchOpts(k = 10)))
    }
    assert(capped.residentBlockTerms > 0)
  }

  test("budgeted doc-metadata cache: identity under eviction + bounded residency") {
    // a cap below one page (k*overfetch = 30) forces eviction on every
    // paginate; results must stay identical and residency must respect it
    val cap = 10
    val capped = LocalSearcher.load(index, docCacheEntries = cap)
    for {
      opts <- Seq(SearchOpts(k = 10),
        SearchOpts(k = 10, fields = Seq("content" -> 1.5, "path" -> 2.5),
          phraseBoost = 2.0))
      q <- queries
    } {
      val a = LocalSearcher.search(capped, q, opts)
      val b = LocalSearcher.search(local, q, opts)
      assert(a == b, s"doc-capped serving diverged on '$q' ($opts)")
      assert(capped.residentDocs <= cap,
        s"doc cache over cap: ${capped.residentDocs} > $cap")
    }
    // repeat pass: evicted metadata re-probes correctly
    queries.foreach { q =>
      assert(LocalSearcher.search(capped, q, SearchOpts(k = 10)) ==
        LocalSearcher.search(local, q, SearchOpts(k = 10)))
    }
    assert(capped.residentDocs > 0)
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
