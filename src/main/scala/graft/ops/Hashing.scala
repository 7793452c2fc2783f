package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing used by dedup / fingerprint operators.
  *
  * All hashes are built from md5 hex prefixes + exact integer modular
  * arithmetic so the SAME values are computable in ANSI SQL (the DuckDB
  * correctness oracle) — engine-specific hash functions (xxhash64, DuckDB
  * hash()) would not cross-check.
  */
object Hashing {
  /** Large prime modulus; all products stay within Long. */
  val P: Long = 2147483647L // 2^31 - 1

  /** 60-bit integer from the first 15 hex chars of md5 (fits in a Long). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** h60 reduced mod P — the base hash for minhash/fingerprints. */
  def hp(c: Column): Column = pmod(h60(c), lit(P))

  /** Universal-hash family member i: (a_i * h + b_i) mod P.
    * a_i,b_i < 2^20 so a_i * h < 2^51 — no overflow. */
  def uhash(h: Column, i: Int): Column = {
    val a = 31L + 2L * i
    val b = 1013904223L % P
    pmod(lit(a) * h + lit(b) + lit(i.toLong * 97L), lit(P))
  }

  /** Bit j (0-based) of the 60-bit hash as ±1. */
  def bitSign(h60v: Column, j: Int): Column =
    when(shiftright(h60v, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
}
