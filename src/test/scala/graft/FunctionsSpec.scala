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

  test("cosine_f32 native expression == HOF formulation, bitwise, incl. codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val rng = new scala.util.Random(7L)
    val rows = (0 until 200).map { i =>
      val d = 8 + rng.nextInt(56)
      (i.toLong, Seq.fill(d)(rng.nextFloat() * 2 - 1f),
        Seq.fill(d)(rng.nextFloat() * 2 - 1f))
    }.toDF("id", "a", "b")
    val native = rows
      .select(col("id"), graft.ops.Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = rows
      .select(col("id"), graft.ops.Similarity.cosineHof(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    native.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(hof(id)),
        s"cosine_f32 differs from HOF at id=$id: $v vs ${hof(id)}")
    }
    // SQL registration path + null input
    val viaSql = Seq((Seq(1.0f, 0.0f), Seq(0.6f, 0.8f)))
      .toDF("a", "b").selectExpr("cosine_f32(a, b)").collect()(0).getDouble(0)
    assert(math.abs(viaSql - 0.6) < 1e-6) // float32 literals aren't exact
    val nullIn = Seq((Seq(1.0f), null.asInstanceOf[Seq[Float]]))
      .toDF("a", "b").selectExpr("cosine_f32(a, b)").collect()(0)
    assert(nullIn.isNullAt(0))
    // type check fires at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b").selectExpr("cosine_f32(a, b)").collect()
    }
  }

  test("cosine_f32 on ragged (length-mismatched) vectors is null, like the HOF") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ragged = Seq((1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
    val nat = ragged.select(graft.ops.Similarity.cosine(col("a"), col("b"))).collect()(0)
    val hof = ragged.select(graft.ops.Similarity.cosineHof(col("a"), col("b"))).collect()(0)
    assert(hof.isNullAt(0), "HOF baseline contract changed: ragged no longer null")
    assert(nat.isNullAt(0), "native cosine_f32 must return null on ragged input")
    // and the interpreted (non-codegen) eval path agrees
    val expr = graft.functions.CosineF32(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))
    assert(expr.eval(null) == null)
    assert(expr.nullable)
  }
}
