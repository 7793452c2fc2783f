package graft.bench

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native codegen'd cosine (graft.functions.CosineF32)
  * vs the higher-order-function formulation, over N random 64-dim float
  * vectors against one broadcast query vector — the exact shape of a
  * brute-force kNN scan. Usage: runMain graft.bench.CosineBench [nRows] */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dim = 64
    val vecs = spark.range(0, n, 1, 8)
      .select($"id", transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64($"id", i), lit(1000L)).cast("float") / 500f - 1f)
          .cast("float")).as("v"))
      .cache()
    vecs.count() // materialize
    val q = array((0 until dim).map(i => lit((i % 7 - 3) / 3.0f)): _*)

    def time(name: String, c: org.apache.spark.sql.Column): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        vecs.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"$name%-10s best=${best}%7.3f s  (${n / best / 1e6}%5.1f M rows/s)")
      best
    }
    val hof = time("hof", Similarity.cosineHof($"v", q))
    val native = time("native", Similarity.cosine($"v", q))
    println(f"speedup native vs hof: ${hof / native}%.2fx")
    spark.stop()
  }
}
