package graft

import graft.core.Posting
import graft.functions.GraftFunctions
import graft.index.Codec
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("decode_postings native expression decodes Codec blocks inside SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val ps = Seq(Posting(5L, 2, 10, Array(1, 4)), Posting(9L, 1, 12, Array(0)))
    val bytes = Codec.encodeBlock(5L, ps)
    val rows = Seq((5L, bytes)).toDF("firstDocId", "bytes")
      .selectExpr("inline(decode_postings(firstDocId, bytes))")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getSeq[Int](3).toSeq))
      .toSeq
    assert(rows == Seq((5L, 2, 10, Seq(1, 4)), (9L, 1, 12, Seq(0))))
  }

  test("decode_postings rejects wrong input types at analysis time") {
    import spark.implicits._
    GraftFunctions.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .selectExpr("decode_postings(a, b)").collect()
    }
  }
}
