package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: extract all maximal `[a-z0-9]+` runs of a
  * string as `array<string>` — the analyzer's tokenizer
  * (graft.core.Analyzer.tokensCol), which runs over EVERY byte of EVERY
  * document in the build's hottest pass (tokenize 100 TB of content).
  *
  * Replaces `regexp_extract_all(x, '[a-z0-9]+', 0)`: the regex engine
  * walks the string through java.util.regex with per-match region state;
  * this is one branchy byte scan over the UTF-8 payload with zero-copy
  * slice outputs (UTF8String.fromBytes shares the backing array). The
  * caller keeps lowercasing with Spark's own `lower()` (tokensCol =
  * token_runs(lower(c))), so case-folding semantics — including any
  * collation/locale subtleties — remain EXACTLY the built-in's.
  *
  * EXACTNESS vs the regex form on the same input: the pattern's alphabet
  * is pure ASCII, and in UTF-8 the bytes 0x30-0x39/0x61-0x7a never occur
  * inside a multi-byte sequence (continuation and lead bytes all have the
  * high bit set), so byte-level runs == character-level regex matches,
  * bitwise (FunctionsSpec differential: unicode edge cases + random fuzz).
  *
  * A real doGenCode: stays inside whole-stage codegen; the per-row call
  * dispatches into one JIT'd JVM loop (same shape as Spark's own
  * StaticInvoke-backed expressions). */
case class TokenRuns(child: Expression) extends UnaryExpression {

  override def prettyName: String = "token_runs"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_runs expects STRING, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenRuns.runs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenRuns.runs($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenRuns =
    copy(child = newChild)
}

object TokenRuns {

  /** One pass over the UTF-8 bytes; called from generated code per row. */
  def runs(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // count first: sized array, no buffer growth in the common path
    var count = 0
    var i = 0
    while (i < n) {
      if (isTok(bytes(i))) {
        count += 1
        i += 1
        while (i < n && isTok(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (isTok(bytes(i))) {
        val start = i
        i += 1
        while (i < n && isTok(bytes(i))) i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}
