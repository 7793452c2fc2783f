package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-isolated [[TableIO]] — an Iceberg-style table layer built from
  * scratch over plain parquet (no external dependency; the reference
  * deployment target is an Iceberg catalog, BASELINE.json north_star, and
  * this reproduces the property the engine actually needs from it:
  * readers NEVER observe a half-committed mutation).
  *
  * Why it exists: [[ParquetTableIO]] mutates tables in place — dynamic
  * partition overwrite deletes partition directories before rewriting them,
  * and `deletePartitions` removes files a concurrent reader's in-flight scan
  * may still be reading. [[graft.index.WriterLock]] serializes WRITERS, but
  * reader/writer isolation across compaction's segment swap, retention
  * expiry and the upsert's tombstone+append pair was documented as "the
  * Iceberg TableIO's job" (ADVICE r3). This is that TableIO.
  *
  * Layout under a table `path`:
  * {{{
  *   path/_manifests/v000000013.manifest   one text file per snapshot
  *   path/<part>=<val>/.../c<commit>-part-*.parquet   immutable data files
  *   path/_staging/<commit>/               transient writer scratch
  * }}}
  *
  * Manifest = schema json + partition cols + the RELATIVE file list of the
  * snapshot. COMMIT is one atomic `rename(tmp, v<N+1>.manifest)` — rename
  * onto an existing path fails on HDFS/local semantics, so claiming version
  * N+1 is exclusive (the engine additionally serializes writers with the
  * writer lease). The current snapshot is simply the highest committed
  * version; there is no mutable pointer file to torn-write.
  *
  * The four TableIO ops map to metadata-only commits:
  *  - `overwritePartitions` (dynamic): stage data files, move them into the
  *    standard `part=val/` dirs under commit-unique names (never clobbering
  *    live files), commit = old manifest minus the replaced partitions plus
  *    the new files;
  *  - `overwriteTable`: commit = the new files only;
  *  - `deletePartitions`: commit = old manifest minus matching partitions —
  *    NO filesystem deletes at all (retention/rollover becomes a pure
  *    metadata operation; physical reclaim is [[vacuum]]);
  *  - `read`: resolves the newest manifest ONCE at call time and plans over
  *    that immutable file list (`basePath` keeps partition columns and
  *    partition pruning), so an open scan keeps reading ITS snapshot while
  *    later commits land. A crash between data-file moves and the manifest
  *    rename leaves orphan files that no manifest references — invisible to
  *    every reader, reclaimed by [[vacuum]].
  *
  * Isolation contract: readers are isolated from writers for as long as
  * their snapshot's files exist, i.e. until a [[vacuum]] with a retention
  * horizon that drops their snapshot. [[vacuum]] must run under the index
  * writer lease (it is a physical mutation), and its `retain` bounds how
  * long a straggling reader may keep scanning.
  *
  * Same caller-visible quirks as plain parquet, deliberately: partition
  * columns come back path-type-inferred and ordered last (callers already
  * cast — the lineage-partitionId contract), EXCEPT for an empty snapshot,
  * where the read reconstructs that shape from the stored schema instead of
  * failing like `spark.read.parquet` would on zero files.
  */
object SnapshotTableIO extends TableIO {

  private val ManifestDir = "_manifests"
  private val StagingDir = "_staging"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Partition-directory part of a relative file path ("" if none). */
  private def partitionPathOf(rel: String): String = {
    val i = rel.lastIndexOf('/')
    if (i < 0) "" else rel.substring(0, i)
  }

  /** (version, schemaJson, partitionCols, relative files) */
  private[io] final case class Manifest(version: Long, schemaJson: String,
      partitionCols: Seq[String], files: Seq[String])

  private def manifestPath(path: String, v: Long) =
    new Path(f"$path/$ManifestDir/v$v%09d.manifest")

  private def listVersions(fs: FileSystem, path: String): Seq[Long] = {
    val dir = new Path(s"$path/$ManifestDir")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .flatMap(n => n.stripPrefix("v").stripSuffix(".manifest").toLongOption)
      .sorted
  }

  /** Newest committed snapshot, if the table exists. */
  def currentVersion(spark: SparkSession, path: String): Option[Long] =
    listVersions(fsOf(spark, path), path).lastOption

  private def readManifest(spark: SparkSession, path: String,
      v: Long): Manifest = {
    val fs = fsOf(spark, path)
    val in = fs.open(manifestPath(path, v))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    // line 1: schema json; line 2: partition cols (may be empty); rest: files
    require(lines.nonEmpty, s"empty manifest v$v at $path")
    val pcols = lines.drop(1).headOption.map(_.trim).filter(_.nonEmpty)
      .map(_.split(",", -1).toSeq).getOrElse(Seq.empty)
    Manifest(v, lines.head, pcols, lines.drop(2).filter(_.nonEmpty))
  }

  private def current(spark: SparkSession, path: String): Option[Manifest] =
    currentVersion(spark, path).map(readManifest(spark, path, _))

  /** Atomic commit: write to a temp name, rename to v<N+1>. The writer lease
    * serializes engine writers; the rename-no-clobber claim makes even a
    * rogue concurrent commit fail loudly instead of corrupting. */
  private def commit(spark: SparkSession, path: String, schemaJson: String,
      partitionCols: Seq[String], files: Seq[String]): Long = {
    val fs = fsOf(spark, path)
    fs.mkdirs(new Path(s"$path/$ManifestDir"))
    val body = (schemaJson +: partitionCols.mkString(",") +: files.sorted)
      .mkString("\n")
    var attempt = 0
    while (true) {
      val next = listVersions(fs, path).lastOption.getOrElse(0L) + 1
      val tmp = new Path(s"$path/$ManifestDir/.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, manifestPath(path, next))) return next
      fs.delete(tmp, false)
      attempt += 1
      require(attempt < 50, s"could not claim a manifest version at $path " +
        "(a concurrent writer is committing outside the writer lease)")
    }
    -1L // unreachable
  }

  /** Stage `df` as parquet and move its files into the table's standard
    * partition directories under commit-unique names. Returns the relative
    * file list (sorted) — nothing is visible to readers until [[commit]]. */
  private def stageFiles(df: DataFrame, path: String,
      partitionCols: Seq[String]): Seq[String] = {
    val spark = df.sparkSession
    val fs = fsOf(spark, path)
    val commitId = java.util.UUID.randomUUID().toString.take(12)
    val staging = new Path(s"$path/$StagingDir/$commitId")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging.toString)
    val stagingUri = staging.toUri.getPath
    def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.startsWith("part-")) Seq(st.getPath)
      else Seq.empty
    }
    val rels = walk(staging).map { f =>
      val rel = f.toUri.getPath.stripPrefix(stagingUri).stripPrefix("/")
      val i = rel.lastIndexOf('/')
      val (pdir, name) = if (i < 0) ("", rel) else (rel.substring(0, i), rel.substring(i + 1))
      val destRel = (if (pdir.isEmpty) "" else s"$pdir/") + s"c$commitId-$name"
      val dest = new Path(s"$path/$destRel")
      fs.mkdirs(dest.getParent)
      require(fs.rename(f, dest), s"staging move failed: $f -> $dest")
      destRel
    }.sorted
    fs.delete(staging, true)
    rels
  }

  override def read(spark: SparkSession, path: String): DataFrame =
    current(spark, path) match {
      case None =>
        // engine callers guard with io.exists; an unguarded read of a
        // manifest-less dir must fail loudly rather than fall back to a
        // raw-parquet read that would see orphan/stale files
        throw new IllegalStateException(
          s"SnapshotTableIO: no committed snapshot at $path")
      case Some(m) => readAt(spark, path, m)
    }

  /** Time travel: the table as of snapshot `version`. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame =
    readAt(spark, path, readManifest(spark, path, version))

  private def readAt(spark: SparkSession, path: String, m: Manifest): DataFrame =
    if (m.files.isEmpty) {
      // zero-file snapshot: reconstruct the read-back shape (data columns
      // then partition columns) from the stored schema
      val full = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
      val (pc, dc) = full.fields.partition(f => m.partitionCols.contains(f.name))
      val ordered = StructType(dc ++ m.partitionCols.flatMap(c => pc.find(_.name == c)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], ordered)
    } else {
      val abs = m.files.map(f => s"$path/$f")
      spark.read.option("basePath", path).parquet(abs: _*)
    }

  override def exists(spark: SparkSession, path: String): Boolean =
    currentVersion(spark, path).isDefined

  override def drop(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(spark, path)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  override def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val schemaJson = df.schema.json
    val files = stageFiles(df, path, partitionCols)
    val kept = current(spark, path) match {
      case Some(old) if partitionCols.nonEmpty =>
        // dynamic semantics: replace exactly the partitions present in df
        val replaced = files.map(partitionPathOf).toSet
        old.files.filterNot(f => replaced.contains(partitionPathOf(f)))
      case _ => Seq.empty // full overwrite (unpartitioned), or fresh table
    }
    commit(spark, path, schemaJson, partitionCols, kept ++ files)
    ()
  }

  override def overwriteTable(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val files = stageFiles(df, path, partitionCols)
    commit(df.sparkSession, path, df.schema.json, partitionCols, files)
    ()
  }

  /** Metadata-only: commit a manifest without the matching partitions.
    * Matching mirrors [[ParquetTableIO.deletePartitions]]: the spec's pairs
    * form a leading partition-path prefix, values are Spark path-escaped,
    * `"*"` globs one level. */
  override def deletePartitions(spark: SparkSession, path: String,
      partitionSpec: Seq[(String, String)]): Unit = {
    current(spark, path) match {
      case None => ()
      case Some(old) =>
        def esc(v: String): String = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(v)
        def matches(partPath: String): Boolean = {
          val segs = partPath.split("/", -1)
          segs.length >= partitionSpec.length && partitionSpec.zipWithIndex
            .forall { case ((c, v), i) =>
              if (v == "*") segs(i).startsWith(s"$c=")
              else segs(i) == s"$c=${esc(v)}"
            }
        }
        val kept = old.files.filterNot(f => matches(partitionPathOf(f)))
        if (kept.size != old.files.size)
          commit(spark, path, old.schemaJson, old.partitionCols, kept)
        ()
    }
  }

  /** Physically reclaim files unreachable from the newest `retain`
    * snapshots, drop their manifests, and sweep crashed staging dirs.
    * MUST run under the index writer lease: a live writer's just-moved
    * (not yet committed) files would look orphaned. Readers still scanning
    * a dropped snapshot lose isolation — `retain` IS the reader horizon.
    * Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, path: String, retain: Int = 2): Long = {
    require(retain >= 1, "vacuum must retain at least the current snapshot")
    val fs = fsOf(spark, path)
    val versions = listVersions(fs, path)
    if (versions.isEmpty) return 0L
    val keptVs = versions.takeRight(retain)
    val referenced = keptVs
      .flatMap(v => readManifest(spark, path, v).files).toSet
    val root = new Path(path)
    val rootUri = root.toUri.getPath
    def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory) {
        if (n == ManifestDir || n == StagingDir) Seq.empty else walk(st.getPath)
      } else if (n.endsWith(".parquet")) Seq(st.getPath)
      else Seq.empty // never touch markers/_SUCCESS residue
    }
    var deleted = 0L
    walk(root).foreach { f =>
      val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      if (!referenced.contains(rel)) { fs.delete(f, false); deleted += 1 }
    }
    versions.dropRight(retain).foreach(v => fs.delete(manifestPath(path, v), false))
    val staging = new Path(s"$path/$StagingDir")
    if (fs.exists(staging)) fs.delete(staging, true)
    // sweep now-empty partition directories (cosmetic; globs stay clean)
    def sweepEmpty(p: Path): Boolean = { // returns "is empty after sweep"
      val kids = fs.listStatus(p)
      val emptyKids = kids.filter(st => st.isDirectory &&
        st.getPath.getName != ManifestDir && sweepEmpty(st.getPath))
      emptyKids.foreach(st => fs.delete(st.getPath, false))
      fs.listStatus(p).isEmpty
    }
    sweepEmpty(root)
    deleted
  }
}
