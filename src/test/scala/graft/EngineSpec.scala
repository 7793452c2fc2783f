package graft

import graft.core.CorpusGen
import graft.index.IndexBuilder
import graft.query.{BM25, OracleBM25, QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rank-identity gate (north_rule): the distributed engine must match
  * the single-threaded oracle — identical docIds AND scores — on the 12
  * reference queries (BASELINE.md), and the WAND path must match the
  * exhaustive path exactly. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val ReferenceQueries: Seq[String] = Seq(
    "python tutorial", "javascript async await", "machine learning basics",
    "react hooks useState", "python optimization",
    "machine learning algorithms", "react hooks tutorial",
    "database performance tuning", "python machine learning optimization",
    "javascript async programming", "python programming tutorial",
    "machine learning optimization")

  val dir = "/tmp/graft-test/engine-index"
  val nDocs = 1200L

  lazy val index: SearchIndex = {
    val corpus = CorpusGen.generateDF(spark, nDocs, seed = 7L, partitions = 5)
    IndexBuilder.build(spark, corpus, dir,
      IndexBuilder.Params(blockSize = 64, docGroupSize = 256L,
        fields = Seq("content", "path")))
    new SearchIndex(spark, dir)
  }

  lazy val oracle: (OracleBM25.Index, Seq[OracleBM25.OracleDoc]) = {
    val meta = index.docs
      .select("docId", "repo", "path", "lang", "qualityScore", "repoScore")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getDouble(4), r.getDouble(5))).toMap
    val corpus = CorpusGen.generateDF(spark, nDocs, seed = 7L, partitions = 5)
    val docs = corpus.select("docId", "content", "path").collect().map { r =>
      val id = r.getLong(0)
      val (repo, path, q, rs) = meta(id)
      OracleBM25.OracleDoc(id, repo, path,
        Map("content" -> r.getString(1), "path" -> r.getString(2)), q, rs)
    }.toSeq
    (new OracleBM25.Index(docs, Seq("content", "path")), docs)
  }

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Double)] =
    df.select("rank", "docId", "score").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq

  test("index build invariants: sha ok, postings/blocks/metrics present") {
    index // force the lazy build
    val m = spark.read.parquet(s"$dir/metrics").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.contains("content") && m.contains("path"))
    val c = m("content")
    assert(c.getAs[Long]("shaViolations") == 0)
    assert(c.getAs[Long]("postingsEmitted") > 0)
    assert(c.getAs[Long]("bytesCompressed") < c.getAs[Long]("bytesRawEstimate"))
    assert(c.getAs[Long]("maxMergeFanIn") >= 2) // hot terms span docGroups
    val lineage = spark.read.parquet(s"$dir/lineage")
    assert(lineage.filter(col("status") === "done").count() ==
      spark.read.parquet(s"$dir/docs").select("docGroup").distinct().count())
    assert(lineage.filter(!col("shaOk")).count() == 0)
  }

  test("dictionary df/totalTf match a direct recount") {
    import spark.implicits._
    val corpus = CorpusGen.generateDF(spark, nDocs, seed = 7L, partitions = 5)
    val direct = corpus
      .select($"docId", explode(graft.core.Analyzer.tokensCol($"content")).as("term"))
      .groupBy($"term")
      .agg(countDistinct($"docId").as("df"), count(lit(1)).as("totalTf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dict = index.dictionary.filter($"field" === "content").collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(dict.keySet == direct.keySet)
    dict.foreach { case (t, v) => assert(v == direct(t), s"term $t") }
  }

  test("exhaustive engine is rank- and score-identical to the oracle (12 reference queries)") {
    val (oidx, odocs) = oracle
    val opts = SearchOpts(k = 10, fields = Seq("content" -> 1.0))
    ReferenceQueries.foreach { q =>
      val got = hits(QueryEngine.search(index, q, opts))
      val want = OracleBM25.search(oidx, odocs, q, opts)
        .map(h => (h.rank, h.docId, h.score))
      assert(got == want, s"query '$q':\n got=$got\nwant=$want")
      assert(got.nonEmpty, s"query '$q' returned nothing")
    }
  }

  test("WAND path == exhaustive path (differential, all queries)") {
    val base = SearchOpts(k = 10, fields = Seq("content" -> 1.0))
    ReferenceQueries.foreach { q =>
      val ex = hits(QueryEngine.search(index, q, base))
      val wd = hits(QueryEngine.search(index, q, base.copy(wand = true)))
      assert(ex == wd, s"WAND diverged on '$q'")
    }
  }

  test("multi-field boosts + phrase match oracle (R4/R5 shape)") {
    val (oidx, odocs) = oracle
    val opts = SearchOpts(k = 10,
      fields = Seq("content" -> 1.5, "path" -> 2.5),
      phraseBoost = 2.0, phraseField = "content")
    Seq("machine learning", "python tutorial", "database performance tuning")
      .foreach { q =>
        val got = hits(QueryEngine.search(index, q, opts))
        val want = OracleBM25.search(oidx, odocs, q, opts)
          .map(h => (h.rank, h.docId, h.score))
        assert(got == want, s"multi-field query '$q':\n got=$got\nwant=$want")
        val gotW = hits(QueryEngine.search(index, q, opts.copy(wand = true)))
        assert(gotW == got, s"multi-field WAND diverged on '$q'")
      }
  }

  test("diversity semantics: at most max(1,k/3) per repo before backfill") {
    val df = QueryEngine.search(index, "machine learning", SearchOpts(k = 9))
    val repos = df.select("repo").collect().map(_.getString(0))
    // with backfill the cap can be exceeded only after every repo hit cap
    assert(repos.length <= 9)
  }

  test("same results regardless of input partitioning (local[2]-vs-local[8] proxy)") {
    val dir2 = "/tmp/graft-test/engine-index-p13"
    val corpus13 = CorpusGen.generateDF(spark, nDocs, seed = 7L, partitions = 13)
      .repartition(13)
    IndexBuilder.build(spark, corpus13, dir2,
      IndexBuilder.Params(blockSize = 64, docGroupSize = 256L,
        fields = Seq("content", "path")))
    val index2 = new SearchIndex(spark, dir2)
    val opts = SearchOpts(k = 10)
    ReferenceQueries.take(4).foreach { q =>
      assert(hits(QueryEngine.search(index2, q, opts)) ==
        hits(QueryEngine.search(index, q, opts)), s"partitioning changed '$q'")
    }
  }

  test("fallback query returns path matches when content misses") {
    val fb = QueryEngine.fallback(index, "zzznotaterm file_3", SearchOpts())
    assert(fb.count() >= 0) // shape check; relaxed arm unioned with wildcard
  }

  test("fuzzy AUTO expansion recovers misspelled terms (R4 fuzziness)") {
    val expanded = QueryEngine.fuzzyExpand(index, "pythn tutorail")
    assert(expanded.contains("python"), s"expanded=$expanded")
    assert(expanded.contains("tutorial"))
    val hits = QueryEngine.searchFuzzy(index, "pythn tutorail", SearchOpts())
    assert(hits.count() > 0)
    // short terms get edit distance 0 — no expansion
    val strict = QueryEngine.fuzzyExpand(index, "th")
    assert(strict == Seq.empty || strict == Seq("th"))
  }

  test("empty query and unknown terms return empty, not error") {
    assert(QueryEngine.search(index, "", SearchOpts()).count() == 0)
    assert(QueryEngine.search(index, "zz qq", SearchOpts()).count() == 0) // <3 chars dropped
    assert(QueryEngine.search(index, "zzzzzzunknown", SearchOpts()).count() == 0)
  }
}
