package graft.bench

import graft.core.{Analyzer, CorpusGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark isolating the shuffle-free compute kernel (generate +
  * tokenize + sha256): how much of the build's N-vs-4N scaling gap is the
  * machine (memory bandwidth) vs the engine (shuffles/commits).
  * Usage: CpuScaling <cpus> [nDocs] — prints one line. */
object CpuScaling {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = if (args.length > 1) args(1).toLong else 400000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = CorpusGen.generateDF(spark, n, 42L, partitions = cpus * 4)
    // warm-up
    df.limit(1000).select(sum(Analyzer.dlCol(col("content")))).collect()
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.select(sum(Analyzer.dlCol(col("content"))).as("toks"),
        count(sha2(col("content"), 256)).as("n")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"CPUSCALE cpus=$cpus n=$n bestSec=${times.min} docsPerSec=${n / times.min}")
    spark.stop()
  }
}
