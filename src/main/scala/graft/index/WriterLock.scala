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
  /** Per-held-dir lease-renewal tasks (ADVICE r4: without renewal, any
    * mutation longer than `staleMs` on a non-local fs gets its LIVE lease
    * broken by a second writer — the exact race the lock exists to stop). */
  private val heartbeats =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ScheduledFuture[_]]()
  /** Per-dir monitor serializing a heartbeat tick's check-and-renew against
    * releaseFile's delete: cancel(false) does not wait for an in-flight
    * tick, so without this a tick that passed the held check just before
    * release could resurrect the lease AFTER the delete — an orphan lease
    * nobody renews that hard-fails other writers until staleMs. */
  private val hbMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def hbMonitor(dir: String): Object =
    hbMonitors.computeIfAbsent(dir, _ => new Object)
  private lazy val heartbeatPool = {
    val p = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "graft-writerlock-heartbeat"); t.setDaemon(true); t
    })
    p.setRemoveOnCancelPolicy(true)
    p
  }

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
        // a forceUnlock may have dropped the lease file while we ran; the
        // bookkeeping entry can then be absent — treat missing as depth 0
        // (nothing to release) instead of unboxing null (ADVICE r4)
        Option(held.get(dir)).map(_.intValue) match {
          case None | Some(0) => stopHeartbeat(dir)
          case Some(cur) =>
            val d = cur - 1
            if (d == 0) { held.remove(dir); releaseFile(spark, dir) }
            else held.put(dir, d)
        }
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

  /** Operator override: drop whatever lease FILE is present. Deliberately
    * does NOT touch the in-process hold bookkeeping (ADVICE r4): clearing
    * `held` while another thread of this process is inside withLock would
    * corrupt its reentrancy depth. If the holder is THIS live process, its
    * heartbeat simply restores the lease — forceUnlock is for leases whose
    * holder is known dead. */
  def forceUnlock(spark: SparkSession, dir: String): Unit = {
    val p = new Path(lockPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
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
      // try to break only the lease we judged stale (ADVICE r4): a holder's
      // heartbeat may have renewed it between our read and this rename —
      // re-read and compare; any change means the holder is alive, so loop
      // and re-evaluate the fresh lease instead of breaking it. NOTE: this
      // NARROWS the check-then-rename window, it does not close it — a
      // renewal landing between this re-read and the rename still loses its
      // lease (ADVICE r5); a true close needs compare-and-swap semantics
      // (e.g. a lease generation in the filename) the local FS lacks.
      if (readLease(fs, p) == info) {
        val broken = new Path(s"${lockPath(dir)}._broken.$ownerUuid")
        if (!fs.rename(p, broken)) {
          // lost the break race: loop once more against the winner's fresh lease
        } else fs.delete(broken, false)
      }
    }
    startHeartbeat(spark, dir, staleMs)
  }

  /** While a lease is held, refresh its `acquiredAtMillis` at `staleMs / 3`
    * cadence so a long mutation (large compaction/expunge) on a non-local
    * fs never crosses the staleness horizon while its holder is alive
    * (ADVICE r4). The renewal rewrites the lease only when it is still OURS
    * — a forceUnlock+takeover by another writer is never clobbered. */
  private def startHeartbeat(spark: SparkSession, dir: String, staleMs: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val period = math.max(1000L, staleMs / 3)
    val task: Runnable = () => try {
      // tick and releaseFile serialize on the per-dir monitor (see
      // hbMonitors); the held check must sit INSIDE it so a release that
      // already dropped the bookkeeping can never be followed by a renew
      hbMonitor(dir).synchronized {
        val p = new Path(lockPath(dir))
        val fs = p.getFileSystem(conf)
        readLease(fs, p) match {
          case Some((uuid, _, _)) if uuid != ownerUuid => () // taken over: stand down
          case _ => // ours, vanished (build dropped the dir) or residue: renew
            if (held.containsKey(dir)) {
              fs.mkdirs(p.getParent)
              val out = fs.create(p, /*overwrite=*/ true)
              try out.write(s"$ownerUuid $pid ${System.currentTimeMillis()}"
                .getBytes("UTF-8"))
              finally out.close()
            }
        }
      }
      // NonFatal, not just IOException: ANY exception escaping a
      // scheduleAtFixedRate task silently cancels all future executions —
      // a long mutation would then cross the staleness horizon unrenewed,
      // reintroducing the live-lease break this heartbeat exists to stop
    } catch { case scala.util.control.NonFatal(_) => () } // next tick retries
    val prev = heartbeats.put(dir,
      heartbeatPool.scheduleAtFixedRate(task, period, period,
        java.util.concurrent.TimeUnit.MILLISECONDS))
    if (prev != null) { prev.cancel(false); () }
  }

  private def stopHeartbeat(dir: String): Unit = {
    val f = heartbeats.remove(dir)
    if (f != null) { f.cancel(false); () }
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
    stopHeartbeat(dir) // no future ticks; an IN-FLIGHT one holds the monitor
    // the delete runs inside the same per-dir monitor as a tick's
    // check-and-renew: cancel(false) does not wait for a running tick, and
    // an unserialized tick could resurrect the lease after this delete
    // (held is already empty here — see withLock's finally ordering — so a
    // tick that enters the monitor after us skips the renew)
    hbMonitor(dir).synchronized {
      val p = new Path(lockPath(dir))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // only our own lease: a forceUnlock+takeover while we ran must not
      // clobber the new holder
      readLease(fs, p) match {
        case Some((uuid, _, _)) if uuid == ownerUuid => fs.delete(p, false); ()
        case _ => ()
      }
    }
  }

  private def readLease(fs: FileSystem, p: Path): Option[(String, Long, Long)] =
    try {
      val in = fs.open(p)
      val txt =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      txt.trim.split("\\s+") match {
        case Array(u, pd, at) =>
          // non-numeric fields = torn/foreign content: stale, like a
          // partial write (toLong throwing here would propagate out of the
          // heartbeat tick and silently cancel the renewal schedule)
          (pd.toLongOption, at.toLongOption) match {
            case (Some(pdL), Some(atL)) => Some((u, pdL, atL))
            case _ => None
          }
        case _ => None // partial write: treat as stale
      }
    } catch { case _: java.io.IOException => None }

  private def isLocalFs(fs: FileSystem): Boolean =
    fs.getScheme == "file"
}
