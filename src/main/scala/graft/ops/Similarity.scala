package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle except the
  * final TakeOrderedAndProject. Scale path: sign-LSH bucketing (IVF-style
  * coarse partition) so the scan touches only the query's bucket; at 100 TB
  * the bucket table is partitioned by bucket id and the probe is a
  * partition-pruned read.
  *
  * Dot products use double accumulation in fixed left-to-right order via
  * `aggregate(zip_with(...))` — codegen'd, no UDF.
  */
object Similarity {

  /** Left-to-right double dot product of two float vectors (declarative
    * higher-order-function form; kept as the differential baseline for the
    * native expression). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Declarative three-aggregate cosine — bit-identical to [[cosine]]
    * (FunctionsSpec differential); the HOF lambdas evaluate interpreted. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd expression (graft.functions.CosineF32):
    * one fused loop inside whole-stage codegen — the hot scalar of every
    * kNN/near-dup scan. Accumulation order matches [[cosineHof]] and the
    * DuckDB oracles exactly. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.CosineF32(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Brute-force cosine top-k neighbors of the vector with id `queryId`.
    * Ordering uses the UNROUNDED cosine (tie-break id) — rounding happens
    * only in the final projection, so two cosines that round equal can
    * never flip top-k membership vs an exact-arithmetic oracle.
    * Returns (rank, vec_id, cos) — query row excluded. */
  def knnBrute(emb: DataFrame, id: String, vec: String, queryId: Long,
      k: Int): DataFrame = {
    val q = emb.filter(col(id) === queryId)
      .select(col(vec).as("qvec"))
    emb.filter(col(id) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(vec), col("qvec")))
      .select(col(id), col("cos"))
      .orderBy(col("cos").desc, col(id).asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col(id).asc)))
      .select(col("rank"), col(id), round(col("cos"), 6).as("cos"))
  }

  /** Sign-LSH bucket id: `bits` sign bits of the first dims (IVF-style
    * coarse quantizer; deterministic, SQL-portable). */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits).map { j =>
      when(element_at(vec, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN: search only the query's sign bucket (the 100 TB path —
    * bucket becomes a partition key and the probe is partition-pruned).
    * Returns (rank, vec_id, cos, bucket). */
  def annBucketed(emb: DataFrame, id: String, vec: String, queryId: Long,
      k: Int, bits: Int = 8): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col(vec), bits))
    val q = withBucket.filter(col(id) === queryId)
      .select(col(vec).as("qvec"), col("bucket").as("qbucket"))
    withBucket
      .crossJoin(broadcast(q))
      .filter(col("bucket") === col("qbucket") && col(id) =!= queryId)
      .withColumn("cos", cosine(col(vec), col("qvec")))
      .select(col(id), col("cos"), col("bucket"))
      .orderBy(col("cos").desc, col(id).asc) // unrounded order, see knnBrute
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos").desc, col(id).asc)))
      .select(col("rank"), col(id), round(col("cos"), 6).as("cos"), col("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, restricted to
    * same-bucket candidates (LSH-bounded quadratic). */
  def cosineNearDupPairs(emb: DataFrame, id: String, vec: String,
      threshold: Double, bits: Int = 6): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col(vec), bits))
    val a = withBucket.select(col(id).as("id_a"), col(vec).as("va"), col("bucket"))
    val b = withBucket.select(col(id).as("id_b"), col(vec).as("vb"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Per-label centroids: (label, dim, avg value) — vector aggregation via
    * posexplode + groupBy (map-side combinable). */
  def centroids(emb: DataFrame, label: String, vec: String): DataFrame =
    emb.select(col(label), posexplode(col(vec)).as(Seq("dim", "v")))
      .groupBy(col(label), col("dim"))
      .agg(round(avg(col("v").cast("double")), 6).as("centroid"))
}
