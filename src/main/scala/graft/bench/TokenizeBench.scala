package graft.bench

import graft.core.{Analyzer, CorpusGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native byte-scan tokenizer (graft.functions.TokenRuns)
  * vs the `regexp_extract_all(lower(x))` formulation — the build's hottest
  * pass (every byte of every document). Usage:
  * runMain graft.bench.TokenizeBench [nDocs] */
object TokenizeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = CorpusGen.generateDF(spark, n, seed = 42L, partitions = 8)
      .select(col("docId"), col("content")).cache()
    docs.count()
    val totalBytes = docs.agg(sum(length(col("content")))).collect()(0).getLong(0)

    def time(name: String, tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(sum(size(tok(col("content")))).as("t")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"$name%-8s best=${best}%7.3f s  (${n / best / 1e3}%6.1f K docs/s, " +
        f"${totalBytes / best / 1e6}%7.1f MB/s)")
      best
    }
    // identical token counts by construction (FunctionsSpec differential)
    val re = time("regex", Analyzer.tokensColRegex)
    val nat = time("native", Analyzer.tokensCol)
    println(f"speedup native vs regex: ${re / nat}%.2fx")
    spark.stop()
  }
}
