package graft.functions

import graft.index.Codec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: decode a varint+delta posting block
  * (BinaryType payload + firstDocId base) into
  * array<struct<docId:bigint, tf:int, dl:int, positions:array<int>>>.
  *
  * This is the (b)-tier extension point from the build rules — a scalar
  * operation Spark's built-ins can't express (bespoke compression format),
  * implemented as an Expression rather than a Scala UDF so it composes with
  * explode/inline and stays inside the plan (CodegenFallback: the body is
  * a single tight JVM loop; splitting it into generated Java wins nothing).
  * Registered for SQL as `decode_postings(firstDocId, bytes)` via
  * [[GraftFunctions.register]] or the [[GraftExtensions]]
  * SparkSessionExtensions class (spark.sql.extensions=graft.functions.GraftExtensions).
  */
case class DecodePostings(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "decode_postings"

  override def dataType: DataType = DecodePostings.ResultType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"decode_postings expects (BIGINT, BINARY), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(first: Any, bytes: Any): Any = {
    val postings = Codec.decodeBlock(first.asInstanceOf[Long],
      bytes.asInstanceOf[Array[Byte]])
    new GenericArrayData(postings.map { p =>
      InternalRow(p.docId, p.tf, p.dl, new GenericArrayData(p.positions))
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodePostings =
    copy(left = newLeft, right = newRight)
}

object DecodePostings {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("dl", IntegerType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)
}

object GraftFunctions {
  /** Session-scoped registration: `decode_postings(firstDocId, bytes)` and
    * `cosine_f32(vecA, vecB)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_postings", exprs => DecodePostings(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f32", exprs => CosineF32(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_runs", exprs => TokenRuns(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_postings", exprs => TokenPostings(exprs(0)), "built-in")
  }
}

/** Extension-point registration:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("decode_postings"),
      new ExpressionInfo(classOf[DecodePostings].getName, "decode_postings"),
      (exprs: Seq[Expression]) => DecodePostings(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineF32].getName, "cosine_f32"),
      (exprs: Seq[Expression]) => CosineF32(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("token_runs"),
      new ExpressionInfo(classOf[TokenRuns].getName, "token_runs"),
      (exprs: Seq[Expression]) => TokenRuns(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("token_postings"),
      new ExpressionInfo(classOf[TokenPostings].getName, "token_postings"),
      (exprs: Seq[Expression]) => TokenPostings(exprs(0))))
  }
}
