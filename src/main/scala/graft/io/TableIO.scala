package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction for the engine's tables (docs, postings, dictionary,
  * stats, lineage, metrics — see graft.core.Schemas).
  *
  * The sandbox implementation is plain parquet with Spark's dynamic
  * partition overwrite; an Iceberg deployment implements the same four
  * operations with a catalog table (`overwritePartitions` becomes a
  * REPLACE/overwrite-by-filter snapshot commit, `deletePartitions` a
  * metadata delete) — nothing in the builder or query engine changes.
  */
trait TableIO {
  def read(spark: SparkSession, path: String): DataFrame
  def exists(spark: SparkSession, path: String): Boolean
  def drop(spark: SparkSession, path: String): Unit

  /** Overwrite-by-partition: replaces exactly the partitions present in
    * `df` (dynamic mode), leaving other partitions intact. With
    * `partitionCols` empty this is a full-table overwrite. Idempotent for a
    * fixed input — the engine's exactly-once primitive. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit

  /** Drop whole partition directories matched by partition col=value pairs
    * (retention/rollover path). */
  def deletePartitions(spark: SparkSession, path: String,
      partitionSpec: Seq[(String, String)]): Unit
}

object ParquetTableIO extends TableIO {

  override def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def drop(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  override def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Deletes `path/<c1>=<v1>/.../<cN>=<vN>` dirs; a `*` value globs that
    * level (e.g. docGroup=* / segment=snap-1 deletes one segment across all
    * groups). Partition-dir deletes are metadata-scale: one fs op per
    * directory, never per row. */
  override def deletePartitions(spark: SparkSession, path: String,
      partitionSpec: Seq[(String, String)]): Unit = {
    val glob = partitionSpec.map { case (c, v) => s"$c=$v" }.mkString("/")
    val p = new org.apache.hadoop.fs.Path(s"$path/$glob")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(p) match {
      case null => ()
      case sts => sts.foreach(st => fs.delete(st.getPath, true))
    }
  }
}
