package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the driver contract: every gate query runs on sf0.001, every
  * query has an oracle, and the flagship entry returns rows. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has an oracleSql entry and runs") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without query: $stale")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, name)
      val emptyOk = Set[String]() // every query should produce rows at sf0.001
      assert(n > 0 || emptyOk(name), s"$name returned no rows")
      // lowercase snake_case column names (oracle parity requirement)
      df.columns.foreach(c => assert(c.matches("[a-z][a-z0-9_]*"), s"$name column $c"))
    }
  }
}
