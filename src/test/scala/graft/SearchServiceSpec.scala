package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{QueryEngine, SearchIndex, SearchService}
import graft.query.QueryEngine.SearchOpts
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end query lifecycle (SURVEY §3.1): validation -> correction ->
  * intent/entities -> search -> fallback -> insights -> summary. */
class SearchServiceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val index: SearchIndex = {
    val dir = "/tmp/graft-test/service-index"
    IndexBuilder.build(spark,
      CorpusGen.generateDF(spark, 800L, seed = 29L, partitions = 3), dir,
      IndexBuilder.Params(blockSize = 64, docGroupSize = 256L,
        fields = Seq("content", "path")))
    new SearchIndex(spark, dir)
  }

  test("full lifecycle: corrected, classified, searched, summarized") {
    val r = SearchService.search(index, "pyton tutorail basics").get
    assert(r.correctedQuery == "python tutorial basics")
    assert(r.intent.intent == "learning")
    assert(r.entities.technologies == Seq("python"))
    assert(!r.usedFallback)
    assert(r.totalResults > 0)
    assert(r.summary.contains("python tutorial basics"))
    assert(r.results.columns.contains("rank"))
    // the result page equals a direct engine search for the same query
    val direct = QueryEngine.search(index, "python tutorial basics", SearchOpts())
      .collect().map(_.toSeq).toSeq
    assert(r.results.collect().map(_.toSeq).toSeq == direct)
  }

  test("query-result LRU cache: hit flags fromCache, evicts beyond capacity") {
    val cache = SearchService.newCache(maxEntries = 2)
    val first = SearchService.search(index, "python tutorial",
      cache = Some(cache)).get
    assert(!first.fromCache)
    val second = SearchService.search(index, "python tutorial",
      cache = Some(cache)).get
    assert(second.fromCache) // reference integration matrix's from_cache flag
    assert(second.totalResults == first.totalResults &&
      second.summary == first.summary)
    // distinct k -> distinct key (reference key = search:{query}:{limit})
    val otherK = SearchService.search(index, "python tutorial",
      SearchOpts(k = 5), cache = Some(cache)).get
    assert(!otherK.fromCache)
    // any option that changes the page keys separately too
    val otherOpts = SearchService.search(index, "python tutorial",
      SearchOpts(diversity = false), cache = Some(cache)).get
    assert(!otherOpts.fromCache, "differing SearchOpts shared a cache entry")
    val expanded = SearchService.search(index, "python tutorial",
      expand = true, cache = Some(cache)).get
    assert(!expanded.fromCache, "expand=true shared the non-expanded entry")
    // capacity 2, third distinct key evicts the least-recently-used
    SearchService.search(index, "machine learning", cache = Some(cache))
    assert(cache.size == 2)
  }

  test("invalid queries are rejected by the gate (F9)") {
    assert(SearchService.search(index, "").isEmpty)
    assert(SearchService.search(index, "@#$%").isEmpty)
    assert(SearchService.search(index, "x" * 600).isEmpty)
  }

  test("fallback path fires when the primary search is empty (R6)") {
    // a term that exists only in paths ("src" appears in every path)
    val r = SearchService.search(index, "zzzznotindexed src").get
    assert(r.usedFallback)
    assert(r.totalResults > 0)
  }

  test("expansion pulls synonym and fuzzy terms into the term set") {
    val r = SearchService.search(index, "pythn", expand = true, fuzzy = true).get
    assert(r.expandedTerms.contains("python"), s"terms=${r.expandedTerms}")
  }
}
