package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expression: all `numHashes` MinHash signature minima of a token
  * array in ONE pass — md5 is computed once per token instead of once per
  * (token, hash) as in the `numHashes`-fold `transform(...)` column
  * formulation, an algorithmic K-fold cut of the dominant cost at
  * training-data-dedup scale.
  *
  * EXACTNESS: bit-identical to graft.ops.Hashing's column math (and the
  * DuckDB oracles): h = parse(first 15 hex chars of md5(token)) mod P,
  * uhash_i = ((31+2i)*h + 1013904223 + 97i) mod P, min per i.
  * CodegenFallback for the same reason as DecodePostings: the body is one
  * tight JVM loop around MessageDigest — generated Java wins nothing. */
case class MinhashF(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_f"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // An EMPTY (non-null) token array yields null (no signature is defined
  // over zero tokens), so the output is nullable even when the child is
  // not — without this override Catalyst could assume non-null output and
  // fold away IsNotNull guards above the expression.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_f expects ARRAY<STRING>, got ${t.simpleString}")
    }

  private val P = 2147483647L // graft.ops.Hashing.P (2^31 - 1)
  private val B = 1013904223L % P

  override def nullSafeEval(tokens: Any): Any = {
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < n) {
      val bytes = arr.getUTF8String(t).getBytes
      md.reset()
      val digest = md.digest(bytes)
      // first 15 hex chars = 60 bits: 7 full bytes + the high nibble of the 8th
      var h60 = 0L
      var i = 0
      while (i < 7) { h60 = (h60 << 8) | (digest(i) & 0xffL); i += 1 }
      h60 = (h60 << 4) | ((digest(7) & 0xf0L) >> 4)
      val hp = h60 % P // h60 >= 0 (60 bits), plain mod == pmod
      var k = 0
      while (k < numHashes) {
        val cand = ((31L + 2L * k) * hp + B + 97L * k) % P
        if (cand < mins(k)) mins(k) = cand
        k += 1
      }
      t += 1
    }
    if (n == 0) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashF =
    copy(child = newChild)
}
