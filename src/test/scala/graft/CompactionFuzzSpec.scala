package graft

import graft.core.CorpusGen
import graft.index.{Compaction, IndexBuilder}
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential for the compaction protocol: random batch cuts
  * (including cuts inside docGroups — the straddled-append shape), then a
  * random sequence of full/tail merges at random budgets and block sizes.
  * After every sequence the index must stay LOGICALLY identical to a
  * monolithic build of the same corpus: same decoded postings (docId, tf,
  * dl, positions per (field, term)), same dictionary term stats, same
  * stats table, same search pages. Deterministic seed — failures
  * reproduce. */
class CompactionFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Every posting fully decoded — packing-independent logical content. */
  private def decodedPostings(dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/postings")
      .select("field", "term", "firstDocId", "bytes")
      .as[(String, String, Long, Array[Byte])]
      .flatMap { case (f, t, first, bytes) =>
        graft.index.Codec.decodeBlock(first, bytes).iterator.map(p =>
          (f, t, p.docId, p.tf, p.dl, p.positions.toSeq))
      }.collect().toSet
  }

  private def dictCore(dir: String) = spark.read.parquet(s"$dir/dictionary")
    .select("field", "term", "df", "totalTf", "maxTf", "minDl")
    .collect().map(_.toSeq).toSet

  test("random batch cuts x random merge sequences stay identical to a monolithic build") {
    val rng = new scala.util.Random(20260817L)
    val queries = Seq("python tutorial", "machine learning", "data")
    (1 to 5).foreach { trial =>
      val n = 120L + rng.nextInt(240)
      val params = IndexBuilder.Params(
        blockSize = 8 + rng.nextInt(40),
        docGroupSize = 32L + rng.nextInt(96),
        fields = Seq("content"))
      val corpus = CorpusGen.generateDF(spark, n, seed = 100L + trial,
        partitions = 2)
      val dir = s"/tmp/graft-test/compact-fuzz-$trial"
      val fresh = s"/tmp/graft-test/compact-fuzz-$trial-fresh"

      // 2-5 batches at random ascending cut points
      val nBatches = 2 + rng.nextInt(4)
      val cuts = (Seq.fill(nBatches - 1)(1L + rng.nextInt(n.toInt - 1).toLong)
        .distinct.sorted :+ n).distinct
      cuts.zipWithIndex.foreach { case (upTo, i) =>
        val slice = corpus.filter(col("docId") < upTo)
        val p = params.copy(inputSnapshot = f"snap-$i%02d")
        if (i == 0) IndexBuilder.build(spark, slice, dir, p)
        else IndexBuilder.resume(spark, slice, dir, p)
      }

      // random merge sequence: 1-2 operations of random flavor/size
      (0 until 1 + rng.nextInt(2)).foreach { _ =>
        val bs = 8 + rng.nextInt(40)
        if (rng.nextBoolean()) Compaction.compact(spark, dir, blockSize = bs)
        else Compaction.compactToBudget(spark, dir,
          maxSegments = 1 + rng.nextInt(3), blockSize = bs)
      }

      IndexBuilder.build(spark, corpus, fresh, params)
      assert(decodedPostings(dir) == decodedPostings(fresh),
        s"trial $trial: decoded postings diverged from monolithic build")
      assert(dictCore(dir) == dictCore(fresh), s"trial $trial: dictionary drifted")
      def stats(d: String) = spark.read.parquet(s"$d/stats")
        .collect().map(_.toSeq).toSet
      assert(stats(dir) == stats(fresh), s"trial $trial: stats drifted")
      val iM = new SearchIndex(spark, dir)
      val iF = new SearchIndex(spark, fresh)
      queries.foreach { q =>
        val a = QueryEngine.search(iM, q, SearchOpts()).collect().map(_.toSeq).toSeq
        val b = QueryEngine.search(iF, q, SearchOpts()).collect().map(_.toSeq).toSeq
        assert(a == b, s"trial $trial: query '$q' diverged after merges")
      }
    }
  }
}
