package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (3L, "completely different content about spark engines"),
    (4L, "der hund und die katze ist das haus und der baum")
  ).toDF("doc_id", "text")

  test("exact dedup: identical normalized text flagged, first wins") {
    val r = Dedup.exact(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getInt(3))).toMap
    assert(r(0L) == (2L, 0)) // group of 2, keeper
    assert(r(1L) == (2L, 1)) // dup
    assert(r(2L) == (1L, 0))
    assert(r(3L) == (1L, 0))
  }

  test("minhash: identical docs share signatures; LSH pairs find the dup") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toSeq).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash: identical fingerprints for dups, hamming pairs detect near-dups") {
    val fps = Dedup.simhash(docs, "doc_id", "text", bits = 20)
    val m = fps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == m(1L))
    val pairs = Dedup.simhashPairs(fps, "doc_id", maxDist = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhashPairs banded equi-join == naive all-pairs; no cartesian product") {
    // bigger corpus with genuine near-dups at several hamming distances
    val many = (0 until 40).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta doc$i"
      (i.toLong, if (i % 3 == 0) base + " extra tail words" else base)
    }.toDF("doc_id", "text")
    val fps = Dedup.simhash(many, "doc_id", "text", bits = 20)
    for (maxDist <- Seq(0, 2, 5)) {
      val banded = Dedup.simhashPairs(fps, "doc_id", maxDist, bits = 20)
      // naive quadratic reference computed driver-side
      val raw = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = (for {
        (ia, sa) <- raw; (ib, sb) <- raw
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxDist
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
      val got = banded.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue())).toSet
      assert(got == naive, s"banded != naive at maxDist=$maxDist")
      assert(!banded.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        "simhashPairs must not plan a cartesian product")
    }
  }

  test("ngram jaccard shingle-df cap: identical results when no shingle is hot") {
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == uncapped)
    // cap=1 drops every shared shingle -> no candidate pairs at all
    val cap1 = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.0,
      maxShingleDf = Some(1))
    assert(!cap1.collect().exists(r => Set(r.getLong(0), r.getLong(1)) == Set(0L, 1L)),
      "df-capped join must not generate candidates from dropped hot shingles")
  }

  test("native minhash expression == HOF formulation, bitwise") {
    val rng = new scala.util.Random(99L)
    val many = (0 until 80).map { i =>
      (i.toLong, (0 until 5 + rng.nextInt(60))
        .map(_ => s"w${rng.nextInt(300)}").mkString(" "))
    }.toDF("doc_id", "text")
    for (k <- Seq(1, 4, 8)) {
      val native = Dedup.minhashSignatures(many, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
      val hof = Dedup.minhashSignaturesHof(many, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong).toSeq).toMap
      assert(native == hof, s"native minhash differs from HOF at k=$k")
    }
  }

  test("minhash: zero-token docs are excluded, not null-signed") {
    val withEmpty = docs.unionByName(Seq((9L, "!!! ???")).toDF("doc_id", "text"))
    val sigs = Dedup.minhashSignatures(withEmpty, "doc_id", "text", 4)
    assert(!sigs.collect().map(_.getLong(0)).contains(9L))
    assert(sigs.collect().forall(r => !r.isNullAt(1)))
  }

  test("ngram jaccard: near-dups above threshold, unrelated docs absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  private lazy val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 1),
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f), 2),
    (4L, Seq(0.8f, 0.2f, 0.0f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("knnBrute: correct neighbor order by cosine") {
    val r = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 3)
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSeq
    // cos with vec 0: v1=0.9939, v4=0.9701, v2=0, v3=-1
    assert(r == Seq((1, 1L), (2, 4L), (3, 2L)))
  }

  test("annBucketed searches only the query's sign bucket") {
    val r = Similarity.annBucketed(emb, "vec_id", "embedding", 0L, 10, bits = 2)
      .collect().map(x => x.getLong(1)).toSet
    // bucket of v0 = signs of dims 1..2 = (+,0) -> only v1, v4 share (+,+/0)?
    // dim>0 strictly: v0 bucket = 1 (dim0 pos), v1/v4 = 3 (both pos), v2 = 2, v3 = 0
    assert(!r.contains(3L)) // opposite sign never in bucket
  }

  test("cosineNearDupPairs finds the near-identical pair") {
    val r = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.99, bits = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.contains((0L, 1L)))
  }

  test("centroids: per-label per-dim averages") {
    val r = Similarity.centroids(emb, "label", "embedding").collect()
      .map(x => (x.getInt(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(math.abs(r((0, 0)) - (1.0 + 0.9 + 0.8) / 3) < 1e-6)
    assert(r((1, 1)) == 1.0)
    assert(r((2, 0)) == -1.0)
  }

  test("langId: marker-word heuristic picks the dominant language") {
    val r = TextAnalysis.langId(spark, docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) == "en")
    assert(r(4L) == "de")
  }

  test("quality + token counts are consistent") {
    val q = TextAnalysis.qualityScore(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(q(0L) == 9)
    val tc = TextAnalysis.tokenCounts(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getLong(3))).toMap
    assert(tc(0L)._1 == 9 && tc(0L)._2 == 9)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val d2 = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d2, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(2L))
    assert(fp(0L) != fp(1L))
  }

  test("multimodal resize plan + frame sampling plumbing") {
    val meta = Seq((1L, 1024, 768, 15), (2L, 200, 800, 3), (3L, 100, 50, 1))
      .toDF("id", "width", "height", "n_frames")
    val rs = Multimodal.resizePlan(meta, "id", targetW = 512, targetH = 384)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rs(1L) == ((512L, 384L))) // exact 2x downscale
    assert(rs(2L) == ((96L, 384L)))  // height-bound, aspect preserved
    assert(rs(3L) == ((512L, 256L))) // fit-to-box upscale, aspect preserved
    val fs = Multimodal.frameSample(meta.withColumnRenamed("id", "doc"), "doc", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fs.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0L, 7L, 14L))
    assert(fs.filter(_._1 == 2L).map(_._2).toSeq == Seq(0L))
    assert(fs.filter(_._1 == 3L).map(_._2).toSeq == Seq(0L))
    // zero-frame payloads emit no rows instead of crashing sequence()
    val empty = Seq((9L, 100, 100, 0)).toDF("doc", "width", "height", "n_frames")
    assert(Multimodal.frameSample(empty, "doc", 7).count() == 0L)
  }

  test("multimodal: typed batch decode == column-expression stub (parity)") {
    val viaPartitions = Multimodal.decodeAll(spark, docs, "doc_id", "text")
      .collect().map(m => m.id -> (m.byte_len, m.width, m.height, m.n_frames)).toMap
    val viaColumns = Multimodal.metaColumns(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(viaPartitions == viaColumns)
    // feature stub is deterministic
    val f1 = Multimodal.decodeAll(spark, docs, "doc_id", "text").collect()
      .find(_.id == 0L).get.feature
    val f2 = Multimodal.stubDecode(0L,
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")).feature
    assert(f1 == f2)
  }
}
