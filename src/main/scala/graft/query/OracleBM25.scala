package graft.query

import graft.core.Analyzer

/** Single-threaded, in-memory reference implementation of the engine
  * semantics (SURVEY §5b): the documented BM25 over the same canonical
  * analyzer, identical float-op order, identical candidate selection,
  * composite sort, and diversity pass. The distributed engine must be
  * rank- AND score-identical to this oracle on the reference query set —
  * the primary correctness gate of the rank-identity north rule.
  *
  * Formula per ai_search/docs/PROJECT_FLOW.md:198-212 with
  * BASELINE-pinned k1=1.2, b=0.75.
  */
object OracleBM25 {

  case class OracleDoc(docId: Long, repo: String, path: String,
      fields: Map[String, String], qualityScore: Double, repoScore: Double)

  case class Hit(rank: Int, docId: Long, score: Double, repo: String)

  class Index(docs: Seq[OracleDoc], fieldNames: Seq[String]) {
    val tokens: Map[Long, Map[String, Array[String]]] =
      docs.map(d => d.docId ->
        fieldNames.map(f => f -> Analyzer.tokenize(d.fields.getOrElse(f, ""))).toMap).toMap
    val byId: Map[Long, OracleDoc] = docs.map(d => d.docId -> d).toMap
    val n: Map[String, Long] = fieldNames.map(f => f -> docs.size.toLong).toMap
    val dl: Map[(String, Long), Int] =
      (for (d <- docs; f <- fieldNames) yield (f, d.docId) -> tokens(d.docId)(f).length).toMap
    val avgdl: Map[String, Double] = fieldNames.map { f =>
      f -> docs.map(d => dl((f, d.docId)).toDouble).sum / docs.size
    }.toMap
    val df: Map[(String, String), Long] = {
      val m = scala.collection.mutable.Map[(String, String), Long]()
      for (d <- docs; f <- fieldNames; t <- tokens(d.docId)(f).distinct)
        m((f, t)) = m.getOrElse((f, t), 0L) + 1
      m.toMap
    }
    def tf(f: String, t: String, docId: Long): Int =
      tokens(docId)(f).count(_ == t)
    def positions(f: String, t: String, docId: Long): Array[Int] =
      tokens(docId)(f).zipWithIndex.collect { case (tok, i) if tok == t => i }
  }

  /** Mirrors QueryEngine.search step-for-step. */
  def search(index: Index, docs: Seq[OracleDoc], query: String,
      opts: QueryEngine.SearchOpts): Seq[Hit] = {
    val p = opts.bm25
    val terms = Analyzer.distinctQueryTerms(query).sorted
    if (terms.isEmpty) return Seq.empty
    val fieldBoosts = opts.fields

    val weights: Map[(String, String), Double] = (for {
      (f, boost) <- fieldBoosts
      t <- terms
      d <- index.df.get((f, t))
    } yield (f, t) -> boost * BM25.idf(index.n(f), d, p)).toMap
    if (weights.isEmpty) return Seq.empty

    val pTerms = if (opts.phraseBoost > 0) Analyzer.queryTerms(query) else Array.empty[String]
    val phraseOn = pTerms.length >= 2 &&
      pTerms.forall(t => index.df.contains((opts.phraseField, t)))
    val phraseIdf = if (phraseOn)
      pTerms.map(t => BM25.idf(index.n(opts.phraseField),
        index.df((opts.phraseField, t)), p)).min
    else 0.0

    // candidate scores, ascending (field, term) summation order
    val scores = scala.collection.mutable.Map[Long, Double]()
    for (d <- docs) {
      var s = 0.0
      var any = false
      for (((f, t), w) <- weights.toSeq.sortBy(_._1)) {
        val tfv = index.tf(f, t, d.docId)
        if (tfv > 0) {
          any = true
          s += w * BM25.tfNorm(tfv, index.dl((f, d.docId)), index.avgdl(f), p)
        }
      }
      if (any && phraseOn) {
        val byTerm = pTerms.map(t => t -> index.positions(opts.phraseField, t, d.docId))
          .filter(_._2.nonEmpty).toMap
        if (pTerms.forall(byTerm.contains)) {
          val occ = QueryEngine.countPhrase(pTerms, byTerm)
          if (occ > 0) {
            val dl = index.dl((opts.phraseField, d.docId))
            val avgdl = index.avgdl(opts.phraseField)
            s += opts.phraseBoost * phraseIdf *
              (occ * (p.k1 + 1.0) / (occ + p.k1 * (1.0 - p.b + p.b * dl / avgdl)))
          }
        }
      }
      if (any) scores(d.docId) = s
    }

    // top-m by (score desc, docId asc)
    val m = opts.k * opts.overfetch
    val top = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(m)

    // composite sort
    val composite = top.map { case (id, s) => (index.byId(id), s) }
      .sortBy { case (d, s) => (-s, -d.qualityScore, -d.repoScore, d.docId) }

    val page =
      if (!opts.diversity) composite.take(opts.k)
      else {
        val cap = math.max(1, opts.k / 3)
        val counts = scala.collection.mutable.Map[String, Int]()
        val pass0 = scala.collection.mutable.ArrayBuffer[(OracleDoc, Double)]()
        val pass1 = scala.collection.mutable.ArrayBuffer[(OracleDoc, Double)]()
        composite.foreach { case (d, s) =>
          val c = counts.getOrElse(d.repo, 0)
          if (c < cap) { counts(d.repo) = c + 1; pass0 += ((d, s)) }
          else pass1 += ((d, s))
        }
        (pass0 ++ pass1).take(opts.k)
      }
    page.zipWithIndex.map { case ((d, s), i) => Hit(i + 1, d.docId, s, d.repo) }.toSeq
  }
}
