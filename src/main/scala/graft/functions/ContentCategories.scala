package graft.functions

import graft.pipeline.Porter2
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** T17 content categorization with full reference parity
  * (metadata_extractor.rs:464-574 get_content_categories): tokenize
  * `\b\w+\b` lowercased, drop the 25 stopwords, Porter2-stem, build the set
  * of stemmed unigrams + adjacent-pair bigrams (a pair is emitted only when
  * BOTH tokens are non-stop; a skipped stopword does NOT bridge), score
  * each of the TEN categories by how many of its keyword strings appear in
  * that set (keywords are matched literally — the reference does not stem
  * them), keep scores > 0, sort descending with the declaration order as
  * the stable tiebreak, take 3.
  *
  * A native expression (CodegenFallback — the body is a JVM loop around the
  * stemmer; generated Java would win nothing) because the adjacency +
  * stemming fold has no faithful column formulation. */
case class ContentCategories(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "content_categories"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"content_categories expects STRING, got ${t.simpleString}")
    }

  override def nullSafeEval(text: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    val m = ContentCategories.TokenRe.matcher(s)
    val tokens = scala.collection.mutable.ArrayBuffer[String]()
    while (m.find()) tokens += m.group().toLowerCase(java.util.Locale.ROOT)

    val stop = ContentCategories.StopWords
    val ngrams = scala.collection.mutable.HashSet[String]()
    var i = 0
    val stemmed = tokens.map(t => if (stop.contains(t)) null else Porter2.stem(t))
    while (i < tokens.length) {
      val st = stemmed(i)
      if (st != null) {
        ngrams += st
        if (i + 1 < tokens.length && stemmed(i + 1) != null)
          ngrams += (st + " " + stemmed(i + 1))
      }
      i += 1
    }

    val scored = ContentCategories.Categories.zipWithIndex
      .map { case ((cat, kws), idx) => (cat, kws.count(ngrams.contains), idx) }
      .filter(_._2 > 0)
      .sortBy { case (_, score, idx) => (-score, idx) } // stable: decl order ties
      .take(3)
    new GenericArrayData(scored.map(c => UTF8String.fromString(c._1)))
  }

  override protected def withNewChildInternal(newChild: Expression): ContentCategories =
    copy(child = newChild)
}

object ContentCategories {

  // UNICODE_CHARACTER_CLASS: the reference's rust \b\w+\b is Unicode-aware
  // (rust regex default); Java's bare \w is ASCII-only and would split
  // accented words into fragments, diverging token sets on non-English text
  private[functions] val TokenRe = java.util.regex.Pattern.compile("\\w+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** metadata_extractor.rs:472-475. */
  val StopWords: Set[String] = Set(
    "the", "and", "a", "an", "of", "to", "in", "for", "on", "with", "is",
    "it", "that", "this", "at", "by", "from", "as", "are", "be", "or",
    "was", "were", "has", "had", "have")

  /** The reference's ten category keyword lists, in declaration order
    * (metadata_extractor.rs:500-549). Keywords are matched literally
    * against STEMMED ngrams — reference behavior, kept faithfully (e.g.
    * "stocks" can never match because every occurrence stems to "stock"). */
  val Categories: Seq[(String, Seq[String])] = Seq(
    "news" -> Seq("news", "breaking", "update", "report", "headline",
      "journal", "media", "press", "announcement", "current", "daily news",
      "broadcast", "bulletin", "article", "coverage"),
    "sports" -> Seq("football", "soccer", "basketball", "tennis", "cricket",
      "match", "tournament", "goal", "score", "league", "athlete",
      "olympics", "championship", "competition", "playoff", "coach", "team",
      "game", "sportsmanship", "player"),
    "finance" -> Seq("stocks", "market", "investment", "finance", "economy",
      "bitcoin", "trading", "crypto", "banking", "fund", "portfolio",
      "mutual fund", "currency", "inflation", "deficit", "revenue",
      "capital", "dividend", "savings", "insurance"),
    "health" -> Seq("health", "medicine", "wellness", "fitness", "disease",
      "nutrition", "exercise", "mental health", "medical", "therapy",
      "diet", "treatment", "hospital", "doctor", "clinic", "vaccine",
      "infection", "immune", "prevention", "rehabilitation"),
    "entertainment" -> Seq("movie", "film", "tv", "music", "celebrity",
      "show", "concert", "series", "album", "entertainment", "theater",
      "drama", "comedy", "festival", "artist", "actor", "actress",
      "performance", "pop culture"),
    "science" -> Seq("research", "experiment", "physics", "chemistry",
      "biology", "scientist", "study", "discovery", "laboratory",
      "experiment", "theory", "analysis", "observation", "scientific",
      "innovation", "space", "astronomy", "genetics", "geology", "climate"),
    "travel" -> Seq("travel", "tourism", "destination", "flight", "hotel",
      "journey", "adventure", "trip", "vacation", "holiday", "explore",
      "sightseeing", "cruise", "itinerary", "backpacking", "resort",
      "beach", "mountain", "culture", "transportation"),
    "food" -> Seq("food", "cuisine", "recipe", "dish", "restaurant", "meal",
      "dining", "chef", "ingredient", "gourmet", "taste", "baking",
      "cooking", "snack", "drink", "beverage", "dessert", "nutrition",
      "vegan", "organic"),
    "fashion" -> Seq("fashion", "style", "clothing", "apparel", "designer",
      "trend", "runway", "collection", "brand", "outfit", "accessory",
      "model", "vogue", "couture", "textile", "footwear", "jewelry",
      "cosmetics", "hairstyle", "makeup"),
    "education" -> Seq("education", "learning", "school", "college",
      "university", "course", "student", "teacher", "lecture",
      "curriculum", "study", "training", "knowledge", "academy",
      "classroom", "exam", "scholarship", "tutorial", "online course",
      "degree"))
}
