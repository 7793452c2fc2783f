package graft

import graft.index.IndexBuilder
import graft.query.{QueryEngine, SearchIndex}
import graft.query.QueryEngine.SearchOpts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential for the block-max WAND path: tiny vocabularies
  * force df > N/2 (NEGATIVE idf — the regime where the block-max pivot
  * bound must clamp), tiny blocks/groups maximize boundary traffic, and
  * random queries mix present/absent/rare/ubiquitous terms. WAND must stay
  * rank- AND score-identical to the exhaustive baseline on every draw.
  * Deterministic seeds — failures reproduce. */
class WandFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def corpus(rng: scala.util.Random, n: Int, vocab: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val len = 3 + rng.nextInt(25)
      val words = (0 until len).map(_ => s"v${rng.nextInt(vocab)}")
      // occasional heavy repetition -> extreme tf skew within docs
      val content =
        if (rng.nextInt(5) == 0) (words ++ Seq.fill(30)(s"v${rng.nextInt(3)}")).mkString(" ")
        else words.mkString(" ")
      (i.toLong, s"r${i % 3}", s"p/$i", "en", content)
    }.toDF("docId", "repo", "path", "lang", "content")
  }

  test("WAND == exhaustive on 12 random corpora x 6 random queries (incl. negative idf)") {
    val rng = new scala.util.Random(20260816L)
    (1 to 12).foreach { trial =>
      val n = 20 + rng.nextInt(180)
      val vocab = 4 + rng.nextInt(20) // tiny vocab -> many df > N/2 terms
      val df = corpus(rng, n, vocab)
      val dir = s"/tmp/graft-test/wand-fuzz-$trial"
      IndexBuilder.build(spark, df, dir, IndexBuilder.Params(
        blockSize = 2 + rng.nextInt(6), docGroupSize = 8L + rng.nextInt(40)))
      val idx = new SearchIndex(spark, dir)
      (1 to 6).foreach { _ =>
        val nTerms = 1 + rng.nextInt(4)
        val q = (0 until nTerms)
          .map(_ => s"v${rng.nextInt(vocab + 2)}").mkString(" ") // +2: absent terms
        val k = 1 + rng.nextInt(8)
        val pb = if (rng.nextBoolean() && nTerms >= 2) 2.0 else 0.0
        val base = SearchOpts(k = k, overfetch = 1 + rng.nextInt(3),
          diversity = false, phraseBoost = pb)
        val ex = QueryEngine.search(idx, q, base.copy(wand = false))
          .collect().map(_.toSeq).toSeq
        val wd = QueryEngine.search(idx, q, base.copy(wand = true))
          .collect().map(_.toSeq).toSeq
        assert(wd == ex,
          s"WAND diverged: trial=$trial n=$n vocab=$vocab q='$q' k=$k pb=$pb\n" +
            s"wand=$wd\nexhaustive=$ex")
      }
      IndexBuilder.deleteDir(spark, dir)
    }
  }

  test("WAND == exhaustive on the Zipfian-tf bench generator (reference queries)") {
    // the corpus the bench's skewed_refquery_block_skip_ratio is measured
    // on: rank identity must hold exactly where the block-max skips bite
    import graft.core.CorpusGen
    val df = CorpusGen.generateSkewedDF(spark, 3000L, seed = 42L, partitions = 4)
    val dir = "/tmp/graft-test/wand-fuzz-skew"
    IndexBuilder.build(spark, df, dir,
      IndexBuilder.Params(blockSize = 32, docGroupSize = 512L))
    val idx = new SearchIndex(spark, dir)
    val li = graft.query.LocalSearcher.load(idx)
    graft.Bench.ReferenceQueries.foreach { q =>
      val base = SearchOpts(k = 10, overfetch = 3, diversity = false)
      val ex = QueryEngine.search(idx, q, base.copy(wand = false))
        .collect().map(_.toSeq).toSeq
      val wd = QueryEngine.search(idx, q, base.copy(wand = true))
        .collect().map(_.toSeq).toSeq
      assert(wd == ex, s"WAND diverged on skewed corpus for '$q'")
      // and the serving path agrees too (same scoring code, one heap)
      val sv = graft.query.LocalSearcher.search(li, q, base)
        .map(h => Seq(h.rank, h.docId, h.score, h.repo, h.path, h.lang,
          h.qualityScore, h.repoScore))
      assert(sv == ex.map(_.toSeq), s"serving diverged on skewed corpus for '$q'")
    }
    IndexBuilder.deleteDir(spark, dir)
  }

  test("WAND == exhaustive with multi-field boosts (6 random corpora)") {
    val rng = new scala.util.Random(8261620L)
    (1 to 6).foreach { trial =>
      val n = 30 + rng.nextInt(120)
      val vocab = 5 + rng.nextInt(15)
      val df = corpus(rng, n, vocab)
        // path field shares the vocabulary so both fields match query terms
        .withColumn("path",
          concat_ws("/", lit("d"), col("docId"),
            lit(s"v${rng.nextInt(vocab)}"), lit(s"v${rng.nextInt(vocab)}")))
      val dir = s"/tmp/graft-test/wand-fuzz-mf-$trial"
      IndexBuilder.build(spark, df, dir, IndexBuilder.Params(
        blockSize = 2 + rng.nextInt(6), docGroupSize = 8L + rng.nextInt(40),
        fields = Seq("content", "path")))
      val idx = new SearchIndex(spark, dir)
      (1 to 4).foreach { _ =>
        val q = (0 until 1 + rng.nextInt(3))
          .map(_ => s"v${rng.nextInt(vocab + 1)}").mkString(" ")
        val base = SearchOpts(k = 1 + rng.nextInt(8), overfetch = 1 + rng.nextInt(3),
          diversity = false,
          fields = Seq("content" -> (0.5 + rng.nextDouble() * 3),
            "path" -> (0.5 + rng.nextDouble() * 3)),
          phraseBoost = if (rng.nextBoolean()) 2.0 else 0.0)
        val ex = QueryEngine.search(idx, q, base.copy(wand = false))
          .collect().map(_.toSeq).toSeq
        val wd = QueryEngine.search(idx, q, base.copy(wand = true))
          .collect().map(_.toSeq).toSeq
        assert(wd == ex, s"multi-field WAND diverged: trial=$trial q='$q' $base")
      }
      IndexBuilder.deleteDir(spark, dir)
    }
  }
}
