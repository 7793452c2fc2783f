package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: one-pass cosine similarity of two
  * `array<float>` columns as a double — the hot scalar of every
  * embedding-similarity operator (brute kNN, LSH probes, near-dup pairs).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function
  * formulation, whose lambda evaluates interpreted per element; this is
  * (b)-tier per the build rules — a real `doGenCode` that emits one tight
  * Java loop, staying inside whole-stage codegen.
  *
  * EXACTNESS: accumulation is left-to-right per accumulator
  * (dot/normA/normB), each element widened to double first — bit-identical
  * to the three-aggregate HOF formulation AND to the DuckDB oracle's
  * `sum(x*y ORDER BY i)`, so the q30-q32 gate hashes are unchanged.
  * Unequal lengths return NULL, matching the HOF baseline (zip_with pads
  * the shorter array with null elements, which nulls the whole aggregate);
  * null ELEMENTS are not supported (embedding vectors are dense); null
  * INPUTS return null. */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "cosine_f32"

  override def dataType: DataType = DoubleType

  // Length-mismatched (non-null) inputs yield null, so the output is
  // nullable even over non-nullable children.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null // ragged input: match HOF contract
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getFloat(i).toDouble
      val y = ys.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}
