package graft.bench

import graft.core.CorpusGen
import graft.index.{BlockRow, IndexBuilder}
import graft.query.{BM25, QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: why does block-max WAND prune (or not) on a given corpus?
  * Prints, per query term: df, idf, block count, and the distribution of
  * per-block upper bounds vs the top-m heap floor. A flat corpus (every
  * block's maxTf similar) gives bounds that always clear the floor — no
  * pruning opportunity regardless of algorithm quality.
  * Usage: runMain graft.bench.WandDiag [nDocs] */
object WandDiag {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = "/tmp/graft-wanddiag/index"
    IndexBuilder.build(spark, CorpusGen.generateDF(spark, n, 42L, 8), dir,
      IndexBuilder.Params(blockSize = 128, docGroupSize = 8192L))
    val index = new SearchIndex(spark, dir)
    val (nDocs, avgdl) = index.stats("content")
    val p = BM25.Params()

    Seq("python tutorial", "machine learning basics",
        "database performance tuning").foreach { q =>
      val terms = graft.core.Analyzer.distinctQueryTerms(q).sorted
      val dfs = index.lookup(Seq("content"), terms.toSeq)
      val cand = QueryEngine.candidates(index, q,
        SearchOpts(k = 10, overfetch = 3, wand = false))
      val top = cand.orderBy($"score".desc, $"docId".asc).limit(30)
        .collect().map(_.getDouble(1))
      val floor = if (top.length >= 30) top.min else Double.NegativeInfinity
      println(s"QUERY '$q'  floor(top-30)=$floor")
      terms.foreach { t =>
        val df = dfs.getOrElse(("content", t), 0L)
        val idf = BM25.idf(nDocs, df, p)
        val ubs = index.postings
          .filter(col("field") === "content" && col("term") === t)
          .select("maxTf", "minTf", "minDl", "maxDl").collect()
          .map { r =>
            val maxN = BM25.tfNorm(r.getInt(0), r.getInt(2), avgdl, p)
            val minN = BM25.tfNorm(r.getInt(1), r.getInt(3), avgdl, p)
            BM25.blockUpperBound(idf, maxN, minN)
          }.sorted
        if (ubs.isEmpty) {
          println(s"  term ${t.padTo(14, ' ')} df=0 (no postings)")
        } else {
          val below = ubs.count(_ < floor)
          println(s"  term ${t.padTo(14, ' ')} df=$df idf=${"%8.4f".format(idf)} " +
            s"blocks=${ubs.length} ubMin=${"%8.4f".format(ubs.head)} " +
            s"ubMed=${"%8.4f".format(ubs(ubs.length / 2))} " +
            s"ubMax=${"%8.4f".format(ubs.last)} blocksBelowFloorAlone=$below")
        }
      }
    }
    spark.stop()
  }
}
