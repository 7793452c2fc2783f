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

  /** True when [[overwriteTable]] is an ATOMIC, reader-isolated commit
    * (snapshot storage). Callers that otherwise need a staged dir-swap to
    * fake atomicity (primary-state tables like tombstones) can overwrite
    * in place — a dir-swap would physically delete files under a pinned
    * reader and defeat the snapshot layer's isolation. */
  def atomicOverwrites: Boolean = false

  /** Overwrite-by-partition: replaces exactly the partitions present in
    * `df` (dynamic mode), leaving other partitions intact. With
    * `partitionCols` empty this is a full-table overwrite. Idempotent for a
    * fixed input — the engine's exactly-once primitive. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit

  /** FULL-table overwrite that also removes partitions absent from `df` —
    * for fully-derived tables (dictionary) that must never retain stale
    * partitions after a rebuild (e.g. a term length that disappeared after
    * Retention expiry). */
  def overwriteTable(df: DataFrame, path: String, partitionCols: Seq[String]): Unit

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

  // The overwrite mode rides each write as a PER-WRITE option (documented
  // to take precedence over the session conf) instead of mutating the
  // session-global `spark.sql.sources.partitionOverwriteMode`: writes of
  // DIFFERENT modes may now run concurrently (refreshDerived overlaps the
  // dictionary overwriteTable with the small-table commits on another
  // thread; buildGroups overlaps the docs and postings writes), and a
  // session-conf set/restore pair on two threads is a lost-update race
  // that could silently flip a full-table overwrite to dynamic — leaving
  // stale partitions exactly when a vocabulary shrank (Retention expiry).

  override def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  override def overwriteTable(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    // static mode: the whole table (all partitions) is replaced
    val w = df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Deletes `path/<c1>=<v1>/.../<cN>=<vN>` dirs; the literal value `"*"`
    * globs that level (e.g. docGroup=* / segment=snap-1 deletes one segment
    * across all groups) — any OTHER value first gets Spark's partition-path
    * escaping (the on-disk dir for value `snap[2026]` is
    * `inputSnapshot=snap%5B2026%5D`), then residual glob metacharacters are
    * backslash-escaped, so ids match only themselves and can never wildcard
    * into foreign partitions. Partition-dir deletes are metadata-scale: one
    * fs op per directory, never per row. */
  override def deletePartitions(spark: SparkSession, path: String,
      partitionSpec: Seq[(String, String)]): Unit = {
    def esc(v: String): String =
      if (v == "*") v
      else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v).replaceAll("([\\\\*?\\[\\]{}])", "\\\\$1")
    val glob = partitionSpec.map { case (c, v) => s"$c=${esc(v)}" }.mkString("/")
    val p = new org.apache.hadoop.fs.Path(s"$path/$glob")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(p) match {
      case null => ()
      case sts => sts.foreach(st => fs.delete(st.getPath, true))
    }
  }
}
