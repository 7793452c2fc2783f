package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Another process holds the index writer lease and appears to be alive. */
final class ConcurrentWriterException(msg: String)
  extends IllegalStateException(msg)

/** Single-writer lease for an index directory (ADVICE r3: the staged-swap
  * protocols — compaction roll-forward, tombstone swap, expiry — assume ONE
  * writer; two concurrent writers can race recoverPendingCompaction and
  * interleave deletes/overwrites on plain-parquet TableIO).
  *
  * The lease is a `_writer_lock` file at the index root holding
  * `ownerUuid pid acquiredAtMillis`. Mutating entry points run under
  * [[withLock]]:
  *
  *   - in-process, a per-directory ReentrantLock serializes threads and
  *     makes nesting free (Upsert -> resume -> recover all share one hold);
  *   - cross-process, acquisition is an ATOMIC create (overwrite=false) of
  *     the lease file. A conflicting lease is honored unless it is STALE:
  *     its pid is provably dead on this host (local filesystems — the
  *     common crash case, detected instantly) or it is older than
  *     `staleMs` (non-local filesystems, where pid liveness means
  *     nothing). Stale leases are broken by RENAME (atomic: of two racing
  *     breakers exactly one wins) before re-acquiring.
  *
  * A crashed writer therefore blocks nothing on a local fs, and blocks a
  * shared fs for at most `staleMs`; `forceUnlock` is the operator override.
  * READERS never touch the lease — reader isolation against an in-flight
  * swap still requires a snapshotting TableIO (Iceberg); the lease only
  * guarantees writer-writer exclusion, which is what the marker protocols
  * need for their crash-recovery invariants to hold. */
object WriterLock {

  /** Identity of this JVM for reentrancy + liveness checks. */
  private val ownerUuid = java.util.UUID.randomUUID().toString
  private val pid = ProcessHandle.current().pid()

  /** Per-directory in-process locks (striped by canonical dir string). */
  private val local =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()
  /** Dirs whose lease FILE this process currently holds (hold depth). */
  private val held = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  def lockPath(dir: String): String = s"$dir/_writer_lock"

  val DefaultStaleMs: Long = 10 * 60 * 1000L

  /** Run `body` holding the writer lease on `dir`. Reentrant within the
    * process; throws [[ConcurrentWriterException]] if another live process
    * holds it. */
  def withLock[A](spark: SparkSession, dir: String,
      staleMs: Long = DefaultStaleMs)(body: => A): A = {
    val l = local.computeIfAbsent(dir,
      _ => new java.util.concurrent.locks.ReentrantLock())
    l.lock()
    try {
      val depth = held.getOrDefault(dir, 0)
      if (depth == 0) acquireFile(spark, dir, staleMs)
      held.put(dir, depth + 1)
      try body
      finally {
        val d = held.get(dir) - 1
        if (d == 0) { held.remove(dir); releaseFile(spark, dir) }
        else held.put(dir, d)
      }
    } finally l.unlock()
  }

  /** Re-create our lease file if an operation we ran WHILE HOLDING the
    * lease removed it as a side effect (IndexBuilder.build starts by
    * dropping the whole index directory — lock file included). No-op
    * unless this process holds `dir`. */
  private[index] def reassert(spark: SparkSession, dir: String): Unit =
    if (held.containsKey(dir)) {
      val p = new Path(lockPath(dir))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) { fs.mkdirs(p.getParent); tryCreate(fs, p); () }
    }

  /** Operator override: drop whatever lease is present. */
  def forceUnlock(spark: SparkSession, dir: String): Unit = {
    val p = new Path(lockPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    held.remove(dir)
  }

  private def acquireFile(spark: SparkSession, dir: String, staleMs: Long): Unit = {
    val p = new Path(lockPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent) // first build: index dir may not exist yet
    var attempts = 0
    while (!tryCreate(fs, p)) {
      attempts += 1
      // two racing stale-breakers: the rename loser re-reads a FRESH lease
      // and gives up below; cap defends against a pathological writer storm
      if (attempts > 3) throw new ConcurrentWriterException(
        s"could not acquire writer lease at $p after $attempts attempts")
      val info = readLease(fs, p)
      val stale = info match {
        case None => true // zero-byte or vanished: crash inside create
        case Some((uuid, lpid, at)) if uuid == ownerUuid =>
          true // our own residue (in-process bookkeeping lost it): reclaim
        case Some((_, lpid, at)) =>
          val h = ProcessHandle.of(lpid)
          val deadLocally = isLocalFs(fs) && (!h.isPresent || !h.get.isAlive)
          deadLocally || System.currentTimeMillis() - at > staleMs
      }
      if (!stale) throw new ConcurrentWriterException(
        s"index $dir is locked by writer ${info.get._1} (pid ${info.get._2}, " +
          s"acquired ${info.get._3}); concurrent writers would race the " +
          "staged-swap protocols — wait, or WriterLock.forceUnlock if the " +
          "holder is known dead")
      val broken = new Path(s"${lockPath(dir)}._broken.$ownerUuid")
      if (!fs.rename(p, broken)) {
        // lost the break race: loop once more against the winner's fresh lease
      } else fs.delete(broken, false)
    }
  }

  private def tryCreate(fs: FileSystem, p: Path): Boolean =
    try {
      val out = fs.create(p, /*overwrite=*/ false)
      try out.write(s"$ownerUuid $pid ${System.currentTimeMillis()}"
        .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def releaseFile(spark: SparkSession, dir: String): Unit = {
    val p = new Path(lockPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // only our own lease: a forceUnlock+takeover while we ran must not
    // clobber the new holder
    readLease(fs, p) match {
      case Some((uuid, _, _)) if uuid == ownerUuid => fs.delete(p, false)
      case _ => ()
    }
  }

  private def readLease(fs: FileSystem, p: Path): Option[(String, Long, Long)] =
    try {
      val in = fs.open(p)
      val txt =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      txt.trim.split("\\s+") match {
        case Array(u, pd, at) => Some((u, pd.toLong, at.toLong))
        case _ => None // partial write: treat as stale
      }
    } catch { case _: java.io.IOException => None }

  private def isLocalFs(fs: FileSystem): Boolean =
    fs.getScheme == "file"
}
