package graft

import graft.core.CorpusGen
import graft.index.{ConcurrentWriterException, Deletes, IndexBuilder, WriterLock}
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Single-writer lease (graft.index.WriterLock, ADVICE r3): every mutating
  * entry point holds `_writer_lock`; a second live writer is rejected, a
  * crashed writer's lease is broken by pid-liveness on local filesystems,
  * and the lease is reentrant so nested mutations (upsert -> resume ->
  * recover) share one hold. */
class WriterLockSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val params = IndexBuilder.Params(blockSize = 32, docGroupSize = 128L,
    fields = Seq("content"))

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lockP(dir: String) = new Path(WriterLock.lockPath(dir))

  private def writeForeignLease(dir: String, pid: Long,
      atMillis: Long = System.currentTimeMillis()): Unit = {
    val f = fs(dir)
    f.mkdirs(new Path(dir))
    val out = f.create(lockP(dir), true)
    try out.write(s"foreign-uuid $pid $atMillis".getBytes("UTF-8"))
    finally out.close()
  }

  private def deadPid: Long =
    (100000L to 110000L).find(p => !ProcessHandle.of(p).isPresent).get

  test("lease file exists exactly while held; reentrant holds share it") {
    val dir = "/tmp/graft-test/lock-basic"
    fs(dir).mkdirs(new Path(dir))
    fs(dir).delete(lockP(dir), false)
    WriterLock.withLock(spark, dir) {
      assert(fs(dir).exists(lockP(dir)), "lease file must exist while held")
      WriterLock.withLock(spark, dir) {
        assert(fs(dir).exists(lockP(dir)))
      }
      assert(fs(dir).exists(lockP(dir)),
        "inner release must not drop the outer hold")
    }
    assert(!fs(dir).exists(lockP(dir)), "lease must be released on exit")
  }

  test("build leaves no lease behind; a foreign LIVE lease rejects mutation " +
      "with ConcurrentWriterException and forceUnlock overrides") {
    val dir = "/tmp/graft-test/lock-live"
    IndexBuilder.deleteDir(spark, dir)
    val corpus = CorpusGen.generateDF(spark, 60L, seed = 31L, partitions = 2)
    IndexBuilder.build(spark, corpus, dir, params)
    assert(!fs(dir).exists(lockP(dir)), "build must release the lease")

    // pid 1 is alive in any environment we run in: the lease is honored
    writeForeignLease(dir, pid = 1L)
    val e = intercept[ConcurrentWriterException] {
      IndexBuilder.resume(spark, corpus, dir, params.copy(inputSnapshot = "s1"))
    }
    assert(e.getMessage.contains("foreign-uuid"))
    // deletes go through the same gate
    intercept[ConcurrentWriterException] {
      import spark.implicits._
      Deletes.deleteIds(spark, dir, Seq(1L).toDF("docId"))
    }
    WriterLock.forceUnlock(spark, dir)
    IndexBuilder.resume(spark, corpus, dir, params.copy(inputSnapshot = "s1"))
  }

  test("a crashed writer's lease (dead pid, local fs) is broken instantly; " +
      "zero-byte lease residue is broken too") {
    val dir = "/tmp/graft-test/lock-dead"
    IndexBuilder.deleteDir(spark, dir)
    val corpus = CorpusGen.generateDF(spark, 60L, seed = 32L, partitions = 2)
    IndexBuilder.build(spark, corpus, dir, params)

    writeForeignLease(dir, pid = deadPid)
    // acquisition succeeds by breaking the dead holder's lease
    IndexBuilder.resume(spark, corpus, dir, params.copy(inputSnapshot = "s1"))
    assert(!fs(dir).exists(lockP(dir)))

    // crash inside fs.create: the lease file exists but is empty
    val out = fs(dir).create(lockP(dir), true); out.close()
    IndexBuilder.resume(spark, corpus, dir, params.copy(inputSnapshot = "s2"))
    assert(!fs(dir).exists(lockP(dir)))
  }
}
