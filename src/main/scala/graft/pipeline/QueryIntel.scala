package graft.pipeline

/** Deterministic query-intelligence operators (SURVEY §2.9): the reference's
  * "AI" runner is a set of static-table heuristics over the query string
  * (ai_search/ai_runner/services/query_intelligence.py) — pure driver-side
  * functions here, no network hop. */
object QueryIntel {

  /** X1 query expansion (query_intelligence.py:21-45,96-171): static synonym
    * tables; enhanced query = orig OR ("s1" OR "s2" OR "s3"). */
  val Synonyms: Map[String, Seq[String]] = Map(
    "python" -> Seq("python3", "py", "cpython"),
    "javascript" -> Seq("js", "ecmascript", "node"),
    "ml" -> Seq("machine learning", "modeling"),
    "database" -> Seq("db", "sql", "rdbms"),
    "tutorial" -> Seq("guide", "howto", "walkthrough"),
    "optimization" -> Seq("performance", "tuning", "speedup"))

  def expansions(query: String): Seq[String] =
    graft.core.Analyzer.queryTerms(query).toSeq
      .flatMap(t => Synonyms.getOrElse(t, Seq.empty)).distinct.take(3)

  def enhancedQuery(query: String): String = {
    val ex = expansions(query)
    if (ex.isEmpty) query
    else s"$query OR (${ex.map(e => "\"" + e + "\"").mkString(" OR ")})"
  }

  /** X2 intent classification (query_intelligence.py:48-94,173-241): regex
    * pattern counts per intent; max wins; confidence = min(score/3, 1). */
  val IntentPatterns: Map[String, Seq[String]] = Map(
    "learning" -> Seq("\\bhow to\\b", "\\btutorial\\b", "\\blearn\\b", "\\bguide\\b",
      "\\bbasics\\b", "\\bintroduction\\b"),
    "troubleshooting" -> Seq("\\berror\\b", "\\bfix\\b", "\\bnot working\\b",
      "\\bdebug\\b", "\\bissue\\b"),
    "comparison" -> Seq("\\bvs\\b", "\\bversus\\b", "\\bdifference\\b",
      "\\bcompare\\b", "\\bbetter\\b"),
    "reference" -> Seq("\\bapi\\b", "\\bdocumentation\\b", "\\bsyntax\\b",
      "\\breference\\b", "\\bspec\\b"))

  case class Intent(intent: String, confidence: Double)

  def classifyIntent(query: String): Intent = {
    val q = query.toLowerCase(java.util.Locale.ROOT)
    val scores = IntentPatterns.map { case (intent, pats) =>
      intent -> pats.count(p => p.r.findFirstIn(q).isDefined)
    }
    val (best, score) = scores.toSeq.sortBy { case (i, s) => (-s, i) }.head
    if (score == 0) Intent("informational", 0.3)
    else Intent(best, math.min(score / 3.0, 1.0))
  }

  /** X3 entity extraction (query_intelligence.py:243-351): substring tables
    * + quoted phrases + ALL-CAPS acronyms. */
  val Technologies: Seq[String] = Seq("python", "javascript", "java", "react",
    "spark", "scala", "rust", "sql", "docker", "kubernetes", "tensorflow")
  val Levels: Seq[String] = Seq("beginner", "intermediate", "advanced", "expert")

  case class Entities(technologies: Seq[String], levels: Seq[String],
      quoted: Seq[String], acronyms: Seq[String])

  def extractEntities(query: String): Entities = {
    val q = query.toLowerCase(java.util.Locale.ROOT)
    Entities(
      Technologies.filter(t => s"\\b$t\\b".r.findFirstIn(q).isDefined),
      Levels.filter(q.contains),
      "\"([^\"]+)\"".r.findAllMatchIn(query).map(_.group(1)).toSeq,
      "\\b[A-Z]{2,6}\\b".r.findAllIn(query).toSeq.distinct)
  }

  /** X4 spelling corrections (query_intelligence.py:397-422). */
  val Corrections: Map[String, String] = Map(
    "pyton" -> "python", "pythn" -> "python", "javascrpt" -> "javascript",
    "javscript" -> "javascript", "tutorail" -> "tutorial",
    "tutoral" -> "tutorial", "machien" -> "machine", "learnig" -> "learning",
    "databse" -> "database", "optimzation" -> "optimization")

  def correct(query: String): String =
    query.split("\\s+").map(w =>
      Corrections.getOrElse(w.toLowerCase(java.util.Locale.ROOT), w)).mkString(" ")

  /** X6 rerank (content_analysis.py:208-309,705-711): combined =
    * 0.4*quality + 0.5*relevance + 0.1*positionBias; relevance = fraction of
    * query terms contained in the text. Optional — default off for rank
    * parity with R8 (SURVEY §7.5). */
  def rerank[T](hits: Seq[T], query: String, quality: T => Double,
      text: T => String): Seq[T] = {
    val terms = graft.core.Analyzer.queryTerms(query).toSeq.distinct
    hits.zipWithIndex.map { case (h, i) =>
      val t = text(h).toLowerCase(java.util.Locale.ROOT)
      val rel = if (terms.isEmpty) 0.0
        else terms.count(t.contains).toDouble / terms.size
      val combined = 0.4 * quality(h) + 0.5 * rel + 0.1 * (1.0 - 0.1 * i)
      (h, combined, i)
    }.sortBy { case (_, c, i) => (-c, i) }.map(_._1)
  }

  /** X7 template summary (ai_service.py:317-366): deterministic string. */
  def templateSummary(query: String, total: Long, topDomains: Seq[(String, Long)],
      topTitle: Option[String], maxWords: Int = 40): String = {
    val doms = topDomains.take(3).map(_._1).mkString(", ")
    val base = s"Found $total results for '$query'." +
      (if (doms.nonEmpty) s" Top sources: $doms." else "") +
      topTitle.map(t => s" Most relevant: $t.").getOrElse("")
    val words = base.split("\\s+")
    if (words.length <= maxWords) base else words.take(maxWords).mkString(" ") + "..."
  }
}
