package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF-style approximate nearest neighbour: k-means coarse quantizer +
  * probe-the-nearest-cells search — the classic inverted-file ANN layout,
  * here with Spark MLlib KMeans as the trainer and the cell assignment as a
  * partition key.
  *
  * Scale posture: `fit` is a one-time (or periodic) training job; `assign`
  * adds a `cell` column that becomes the table's partition column, so a
  * query reads only `nProbe` cells — a partition-pruned scan at 100 TB.
  * Complements [[Similarity.annBucketed]] (sign-LSH: no training, weaker
  * recall) — IVF gives tunable recall via nProbe.
  */
object AnnIvf {

  case class Model(centroids: Array[(Int, Array[Float])])

  private def toVec = udf { (xs: Seq[Float]) =>
    Vectors.dense(xs.map(_.toDouble).toArray)
  }

  /** Train the coarse quantizer (deterministic seed). */
  def fit(spark: SparkSession, emb: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L): Model = {
    val feats = emb.select(toVec(col(vecCol)).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
    val model = km.fit(feats)
    Model(model.clusterCenters.zipWithIndex
      .map { case (c, i) => i -> c.toArray.map(_.toFloat) })
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Assign every vector to its nearest centroid (adds `cell`).
    *
    * This is the one pass that touches EVERY vector of the corpus, so it
    * runs on the native codegen'd `cosine_f32` expression: k is small
    * (coarse quantizer), so the argmax is k literal-centroid cosine columns
    * + `array_position(cos, array_max(cos))` — all inside whole-stage
    * codegen, no interpreted per-row lambda. Ties pick the LOWEST cell id
    * (array_position returns the first occurrence), matching the previous
    * minBy semantics bit-for-bit (same double accumulation order), so
    * existing cell layouts and the q34 gate hash are unchanged.
    *
    * A zero-norm centroid (or vector) makes its cosine NaN, and Spark's
    * ordering ranks NaN ABOVE every number — array_max would park the whole
    * corpus in the degenerate cell, where the minBy baseline (NaN largest
    * under TotalOrdering, so never the min of -cos) picks the true nearest.
    * `nanvl(cos, -2)` pins NaN below the cosine range so both paths agree:
    * degenerate centroids are never selected, and an all-NaN row (zero
    * vector) falls to cell 0 on both. */
  def assign(emb: DataFrame, vecCol: String, model: Model): DataFrame = {
    val ordered = model.centroids.sortBy(_._1)
    require(ordered.map(_._1).sameElements(ordered.indices),
      "centroid ids must be dense 0..k-1 for array_position cell derivation")
    val cosines = array(ordered.map { case (_, c) =>
      nanvl(Similarity.cosine(col(vecCol), typedLit(c)), lit(-2.0)) }: _*)
    emb.withColumn("cell",
      (array_position(cosines, array_max(cosines)) - 1).cast("int"))
  }

  /** The retired interpreted-UDF assignment, kept ONLY as the differential
    * baseline for AnnIvfSpec (native == UDF on every row). */
  private[graft] def assignUdfBaseline(emb: DataFrame, vecCol: String,
      model: Model): DataFrame = {
    val centroids = model.centroids
    val cellOf = udf { (xs: Seq[Float]) =>
      val v = xs.toArray
      centroids.minBy { case (_, c) => -cosine(v, c) }._1
    }
    emb.withColumn("cell", cellOf(col(vecCol)))
  }

  /** Top-k by cosine among the nProbe cells nearest to the query vector.
    * Scoring uses the native `cosine_f32` against the broadcast-literal
    * query vector (no UDF); the probe-cell ranking is driver-side over the
    * k tiny centroids. Returns (rank, id, cos, cell). */
  def search(assigned: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, model: Model, nProbe: Int = 2): DataFrame = {
    val probeCells = model.centroids
      .sortBy { case (_, c) => -cosine(query, c) }.take(nProbe).map(_._1).toSeq
    assigned
      .filter(col("cell").isin(probeCells: _*)) // partition-pruned at scale
      .withColumn("cos", Similarity.cosine(col(vecCol), typedLit(query)))
      .orderBy(col("cos").desc, col(idCol).asc) // unrounded order (tie-break id)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col(idCol).asc)))
      .select(col("rank"), col(idCol), round(col("cos"), 6).as("cos"), col("cell"))
  }
}
