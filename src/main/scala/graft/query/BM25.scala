package graft.query

/** BM25 math shared by the distributed engine, the WAND upper bounds, and
  * the single-threaded test oracle.
  *
  * Documented reference formula (ai_search/docs/PROJECT_FLOW.md:198-212):
  *   idf   = ln((N - df + 0.5) / (df + 0.5))
  *   score = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  * with k1 = 1.2, b = 0.75 pinned by BASELINE.json (the reference's v4
  * delegates to Lucene defaults; the legacy config used k1=1.5).
  *
  * `luceneIdf` toggles the Lucene variant ln(1 + (N-df+0.5)/(df+0.5))
  * (always positive); default is the documented formula, which can go
  * negative for df > N/2 — WAND handles that via min/max tfNorm bounds.
  *
  * All paths MUST sum term contributions in ascending term order so that
  * distributed, oracle, and SQL (`sum(x ORDER BY term)`) results are
  * bit-identical.
  */
object BM25 {
  val K1 = 1.2
  val B = 0.75

  final case class Params(
      k1: Double = K1,
      b: Double = B,
      luceneIdf: Boolean = false)

  def idf(n: Long, df: Long, p: Params = Params()): Double = {
    val ratio = (n - df + 0.5) / (df + 0.5)
    if (p.luceneIdf) math.log(1.0 + ratio) else math.log(ratio)
  }

  /** tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) */
  def tfNorm(tf: Int, dl: Int, avgdl: Double, p: Params = Params()): Double =
    tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))

  def contribution(tf: Int, dl: Int, avgdl: Double, n: Long, df: Long,
      p: Params = Params()): Double =
    idf(n, df, p) * tfNorm(tf, dl, avgdl, p)

  /** WAND upper bound of one term's contribution over a block: since idf may
    * be negative (documented formula), the max contribution is
    * idf * maxTfNorm when idf >= 0 else idf * minTfNorm. */
  def blockUpperBound(idfV: Double, maxTfNorm: Double, minTfNorm: Double): Double =
    if (idfV >= 0) idfV * maxTfNorm else idfV * minTfNorm
}
