package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: pack a document's token array into
  * `array<struct<term:string, positions:array<int>>>` — one entry per
  * DISTINCT term with its ascending occurrence positions.
  *
  * This is the map side of the index build's only shuffle: exploding this
  * instead of `posexplode(tokens)` sends one row per (doc, term) with an
  * int-array payload rather than one row per token OCCURRENCE — ~avg-tf×
  * fewer, smaller-keyed rows through the exchange and the external sort,
  * the dominant build volume at 100 TB. A document lives in exactly one
  * input partition, so the packing is complete map-side by construction.
  *
  * Stays entirely in Tungsten types (UTF8String keys, ArrayData out): a
  * typed flatMap doing the same packing measured 2× SLOWER than the
  * posexplode baseline because every token decoded to java.lang.String on
  * the codegen'd map side; this expression keeps the scan zero-copy
  * (term values are slices of the input buffer, consumed by the enclosing
  * explode's projection before the next row). */
case class TokenPostings(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_postings"

  override def dataType: DataType = TokenPostings.ResultType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_postings expects ARRAY<STRING>, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenPostings.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenPostings.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenPostings =
    copy(child = newChild)
}

object TokenPostings {

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  private final class IntBuf {
    var a = new Array[Int](4)
    var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v
      n += 1
    }
    def toArrayData: GenericArrayData =
      new GenericArrayData(java.util.Arrays.copyOf(a, n))
  }

  /** One pass; first-occurrence entry order (the downstream sort orders by
    * term anyway, so entry order is not semantic). Called from generated
    * code per row. */
  def pack(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val map = new java.util.LinkedHashMap[UTF8String, IntBuf]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var buf = map.get(t)
      if (buf == null) { buf = new IntBuf; map.put(t, buf) }
      buf.add(i)
      i += 1
    }
    val out = new Array[Any](map.size)
    val it = map.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue.toArrayData)
      k += 1
    }
    new GenericArrayData(out)
  }
}
