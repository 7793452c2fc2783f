package graft

import graft.ops.{AnnIvf, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: trained quantizer + nProbe search; recall vs brute force. */
class AnnIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  lazy val model = AnnIvf.fit(spark, emb, "embedding", k = 8)
  lazy val assigned = AnnIvf.assign(emb, "embedding", model).cache()

  test("every vector gets a cell; cells partition the corpus") {
    val n = emb.count()
    assert(assigned.filter(col("cell").isNull).count() == 0)
    assert(assigned.count() == n)
    val cells = assigned.select("cell").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("IVF search returns k hits and full-probe == brute force") {
    import spark.implicits._
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").as[Seq[Float]].collect()(0).toArray
    val hits = AnnIvf.search(assigned.filter(col("vec_id") =!= 0), "vec_id",
      "embedding", query, k = 10, model, nProbe = 2).collect()
    assert(hits.length == 10)
    assert(hits.map(_.getInt(0)).toSeq == (1 to 10))

    // probing ALL cells must equal exact brute force
    val all = AnnIvf.search(assigned.filter(col("vec_id") =!= 0), "vec_id",
      "embedding", query, k = 10, model, nProbe = 8)
      .collect().map(r => r.getLong(1)).toSeq
    val brute = Similarity.knnBrute(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(1)).toSeq
    assert(all == brute, "full-probe IVF != brute force")

    // nProbe=2 recall@10 vs brute force is decent even on weak clusters
    val ivf2 = hits.map(_.getLong(1)).toSet
    val recall = brute.count(ivf2.contains) / 10.0
    assert(recall >= 0.5, s"recall@10 too low: $recall")
  }

  test("degenerate (zero-norm) centroid is never selected; native == UDF baseline") {
    // a zero centroid makes every cosine against it NaN — Spark's NaN-is-
    // greatest ordering would otherwise park the whole corpus in that cell
    val degenerate = AnnIvf.Model(
      model.centroids :+ (model.centroids.length -> Array.fill(
        model.centroids.head._2.length)(0.0f)))
    val native = AnnIvf.assign(emb, "embedding", degenerate)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!native.values.exists(_ == model.centroids.length),
      "some vector was assigned to the zero-norm centroid")
    val udfBase = AnnIvf.assignUdfBaseline(emb, "embedding", degenerate)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == udfBase,
      "native and UDF baseline diverge in the presence of a degenerate centroid")
  }

  test("native codegen'd assign == interpreted-UDF baseline on every row") {
    val native = AnnIvf.assign(emb, "embedding", model)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val udfBase = AnnIvf.assignUdfBaseline(emb, "embedding", model)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == udfBase, "native cell assignment diverged from UDF baseline")
  }
}
