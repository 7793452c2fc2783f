package graft.bench

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native one-pass MinHash (graft.functions.MinhashF) vs
  * the K-transform higher-order-function formulation (md5 per token per
  * hash). Usage: runMain graft.bench.MinhashBench [nDocs] [numHashes] */
object MinhashBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val k = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.range(0, n, 1, 8)
      .select($"id".as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64($"id", lit(j)), lit(5000L)))): _*).as("text"))
      .cache()
    docs.count()

    def time(name: String, f: => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.agg(sum(col("mh_0"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"$name%-10s best=${best}%7.3f s  (${n / best / 1e3}%6.1f K docs/s)")
      best
    }
    val hof = time("hof", Dedup.minhashSignaturesHof(docs, "doc_id", "text", k))
    val native = time("native", Dedup.minhashSignatures(docs, "doc_id", "text", k))
    println(f"speedup native vs hof (k=$k): ${hof / native}%.2fx")
    spark.stop()
  }
}
