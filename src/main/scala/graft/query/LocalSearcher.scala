package graft.query

import graft.core.Analyzer
import graft.index.BlockRow
import graft.query.QueryEngine.SearchOpts

/** Serving mode: the reference engine answers queries IN-PROCESS over a
  * resident index (3-20 ms on 22.8k docs, README.md:102). This is our
  * equivalent: load the SAME index tables (postings blocks stay compressed
  * in memory, dictionary + doc metadata as maps) and run the SAME scoring
  * code — QueryEngine.scoreGroup / BoundedTopK, i.e. block-max WAND with
  * identical float-op order — on the serving thread. Results are
  * rank- and score-identical to the distributed path (LocalSpec), latency
  * is microseconds-to-milliseconds.
  *
  * Scale posture: this is the QUERY-SERVICE tier, not the build tier. A
  * 10^12-file deployment shards this loader by docGroup ranges across
  * serving nodes (each node loads its groups' blocks; results merge by
  * (score, docId) — exactly the per-partition-heap merge the distributed
  * path already implements). The sandbox demonstrates one shard.
  */
object LocalSearcher {

  case class DocMeta(repo: String, path: String, lang: String,
      qualityScore: Double, repoScore: Double)

  case class Hit(rank: Int, docId: Long, score: Double, repo: String,
      path: String, lang: String, qualityScore: Double, repoScore: Double)

  /** In-memory image of an index dir (blocks remain varint-compressed). */
  final class LocalIndex(index: SearchIndex) {
    val stats: Map[String, (Long, Double)] = index.stats
    val dict: Map[(String, String), Long] =
      index.dictionary.select("field", "term", "df").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    /** (field, term) -> blocks ordered by (docGroup, firstDocId) — segments
      * of an incrementally-grown group restart blockIdx, so firstDocId is
      * the global within-group order. */
    val blocks: Map[(String, String), Array[BlockRow]] = {
      import org.apache.spark.sql.functions.col
      val sp = index.spark
      import sp.implicits._
      index.postings
        .select(col("field"), col("term"), col("docGroup").cast("long").as("docGroup"),
          col("blockIdx"), col("firstDocId"), col("lastDocId"), col("n"),
          col("sumTf"), col("maxTf"), col("minTf"), col("minDl"), col("maxDl"),
          col("bytes"))
        .as[BlockRow]
        .collect()
        .groupBy(b => (b.field, b.term))
        .view.mapValues(_.sortBy(b => (b.docGroup, b.firstDocId, b.blockIdx))).toMap
    }
    val docs: Map[Long, DocMeta] =
      index.docs.select("docId", "repo", "path", "lang", "qualityScore", "repoScore")
        .collect()
        .map(r => r.getLong(0) -> DocMeta(r.getString(1), r.getString(2),
          r.getString(3), r.getDouble(4), r.getDouble(5))).toMap
  }

  def load(index: SearchIndex): LocalIndex = new LocalIndex(index)

  /** Mirrors QueryEngine.search step-for-step on the serving thread. */
  def search(li: LocalIndex, query: String, opts: SearchOpts = SearchOpts()): Seq[Hit] = {
    val terms = Analyzer.distinctQueryTerms(query).sorted
    if (terms.isEmpty) return Seq.empty
    val fieldNames = opts.fields.map(_._1)
    val boosts = opts.fields.toMap
    val dfs = (for (f <- fieldNames; t <- terms; d <- li.dict.get((f, t)))
      yield (f, t) -> d).toMap
    if (dfs.isEmpty) return Seq.empty

    val weights = dfs.map { case ((f, t), df) =>
      (f, t) -> boosts(f) * BM25.idf(li.stats(f)._1, df, opts.bm25)
    }
    val avgdls = li.stats.map { case (f, (_, a)) => f -> a }

    val pTerms = if (opts.phraseBoost > 0) Analyzer.queryTerms(query)
      else Array.empty[String]
    val phraseOn = pTerms.length >= 2 &&
      pTerms.forall(t => dfs.contains((opts.phraseField, t)))
    val phraseIdf = if (phraseOn)
      pTerms.map(t => BM25.idf(li.stats(opts.phraseField)._1,
        dfs((opts.phraseField, t)), opts.bm25)).min
    else 0.0
    val phraseUb = if (phraseOn)
      math.max(0.0, opts.phraseBoost * phraseIdf * (opts.bm25.k1 + 1.0)) else 0.0

    val m = opts.k * opts.overfetch
    val heap = new QueryEngine.BoundedTopK(m)
    val allBlocks = dfs.keys.toSeq.flatMap(k => li.blocks.getOrElse(k, Array.empty[BlockRow]))
    allBlocks.groupBy(_.docGroup).toSeq.sortBy(_._1).foreach { case (_, grp) =>
      QueryEngine.scoreGroup(grp, weights, avgdls, opts.bm25, heap, phraseOn,
        pTerms, opts.phraseField, opts.phraseBoost, phraseIdf, phraseUb)
    }

    val top = heap.results.sortBy { case (d, s) => (-s, d) }.take(m)
    val composite = top.map { case (d, s) => (d, s, li.docs(d)) }
      .sortBy { case (d, s, meta) =>
        (-s, -meta.qualityScore, -meta.repoScore, d)
      }
    val page =
      if (!opts.diversity) composite.take(opts.k)
      else {
        val cap = math.max(1, opts.k / 3)
        val counts = scala.collection.mutable.Map[String, Int]()
        val p0 = scala.collection.mutable.ArrayBuffer[(Long, Double, DocMeta)]()
        val p1 = scala.collection.mutable.ArrayBuffer[(Long, Double, DocMeta)]()
        composite.foreach { h =>
          val c = counts.getOrElse(h._3.repo, 0)
          if (c < cap) { counts(h._3.repo) = c + 1; p0 += h } else p1 += h
        }
        (p0 ++ p1).take(opts.k).toSeq
      }
    page.zipWithIndex.map { case ((d, s, meta), i) =>
      Hit(i + 1, d, s, meta.repo, meta.path, meta.lang,
        meta.qualityScore, meta.repoScore)
    }
  }
}
