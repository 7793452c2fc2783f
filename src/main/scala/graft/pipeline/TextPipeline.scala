package graft.pipeline

import graft.core.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-pipeline parity operators (SURVEY §2.2/§2.3): the reference's
  * Rust/Python text-processing stages re-expressed as Catalyst column
  * expressions (codegen'd; UDF-free wherever the semantics allow).
  * Citations are file:line into /root/reference/.
  */
object TextPipeline {

  // -------------------------------------------------------------- cleaning

  /** T1 clean_text (rust_core_processor/src/cleaner.rs:61-94): strip noise
    * words, URLs, emails, HTML entities, unicode escapes; collapse repeated
    * sentence punctuation and whitespace. Pure regexp_replace chain. */
  def cleanText(c: Column): Column = {
    val noUrls = regexp_replace(c, "https?://\\S+|www\\.\\S+", " ")
    val noMail = regexp_replace(noUrls, "\\S+@\\S+\\.\\S+", " ")
    val noEnt = regexp_replace(noMail, "&[a-zA-Z#0-9]+;", " ")
    val noEsc = regexp_replace(noEnt, "\\\\u[0-9a-fA-F]{4}", " ")
    val noVte = regexp_replace(noEsc, "\\b(vte|edit|citation needed)\\b", " ")
    val dots = regexp_replace(noVte, "[.!?]{3,}", "...")
    trim(regexp_replace(dots, "\\s+", " "))
  }

  /** T2 clean_description (cleaner.rs:97-124): clean + truncate <=300 chars
    * at the last sentence end, else last space, with ellipsis. */
  def cleanDescription(c: Column): Column = {
    val cleaned = cleanText(c)
    val cut = substring(cleaned, 1, 300)
    val lastDot = instrLast(cut, ".")
    when(length(cleaned) <= 300, cleaned)
      .otherwise(
        when(lastDot > 50, concat(substring(cut, 1, 300).substr(lit(1), lastDot), lit("..")))
          .otherwise(concat(
            cut.substr(lit(1), greatest(instrLast(cut, " ") - 1, lit(1))),
            lit("..."))))
  }

  /** Position of the last occurrence of `needle` in `haystack` (1-based, 0
    * if absent) — length-based arithmetic, no UDF. */
  def instrLast(haystack: Column, needle: String): Column = {
    val parts = split(haystack, java.util.regex.Pattern.quote(needle), -1)
    when(size(parts) <= 1, lit(0))
      .otherwise(length(haystack) -
        length(element_at(parts, -1)) - needle.length + 1)
  }

  /** T3 normalize_date (cleaner.rs:344-450): try a cascade of formats, emit
    * UTC `yyyy-MM-dd'T'HH:mm:ss'Z'` or NULL (unparseable dates DROPPED).
    * RFC-2822 ("Tue, 15 Aug 2026 10:00:00 +0000" / "... GMT") is the
    * reference's second arm; Spark 3+ patterns reject day-of-week PARSING,
    * so the weekday prefix is stripped with a regex and the remainder
    * parsed with offset/zone-name patterns — same accepted inputs. */
  def normalizeDate(c: Column): Column = {
    val isoArms = Seq("yyyy-MM-dd'T'HH:mm:ssXXX", "yyyy-MM-dd'T'HH:mm:ss'Z'",
      "yyyy-MM-dd HH:mm:ss")
    val rfc = regexp_replace(c, "^[A-Za-z]{3},\\s*", "")
    val rfcArms = Seq("d MMM yyyy HH:mm:ss Z", "d MMM yyyy HH:mm:ss zzz")
      .map(f => try_to_timestamp(rfc, lit(f)))
    val tailArms = Seq(
      "yyyy/MM/dd HH:mm:ss", "MM/dd/yyyy hh:mm a", "yyyy-MM-dd",
      "yyyy/MM/dd", "MM/dd/yyyy", "dd MMM yyyy", "MMMM d, yyyy")
    val ts = coalesce(
      isoArms.map(f => try_to_timestamp(c, lit(f))) ++ rfcArms ++
        tailArms.map(f => try_to_timestamp(c, lit(f))): _*)
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
  }

  /** JVM twin of [[normalizeDate]] (same arms, same output) for use inside
    * tree-walking code where a Column can't reach (T4). Kept in lockstep by
    * a PipelineSpec differential over shared fixtures. */
  def normalizeDateStr(s0: String): Option[String] = {
    import java.time._
    import java.time.format.DateTimeFormatter
    import scala.util.Try
    if (s0 == null) return None
    val s = s0.trim
    if (s.isEmpty) return None
    val loc = java.util.Locale.US
    def fmt(p: String) = DateTimeFormatter.ofPattern(p, loc)
    val rfc = s.replaceFirst("^[A-Za-z]{3},\\s*", "")
    val arms: Seq[() => Option[Instant]] = Seq(
      () => Try(OffsetDateTime.parse(s, fmt("yyyy-MM-dd'T'HH:mm:ssXXX")).toInstant).toOption,
      () => Try(LocalDateTime.parse(s, fmt("yyyy-MM-dd'T'HH:mm:ss'Z'")).toInstant(ZoneOffset.UTC)).toOption,
      () => Try(LocalDateTime.parse(s, fmt("yyyy-MM-dd HH:mm:ss")).toInstant(ZoneOffset.UTC)).toOption,
      () => Try(OffsetDateTime.parse(rfc, fmt("d MMM yyyy HH:mm:ss Z")).toInstant).toOption,
      () => Try(ZonedDateTime.parse(rfc, fmt("d MMM yyyy HH:mm:ss zzz")).toInstant).toOption,
      () => Try(LocalDateTime.parse(s, fmt("yyyy/MM/dd HH:mm:ss")).toInstant(ZoneOffset.UTC)).toOption,
      () => Try(LocalDateTime.parse(s, fmt("MM/dd/yyyy hh:mm a")).toInstant(ZoneOffset.UTC)).toOption,
      () => Try(LocalDate.parse(s, fmt("yyyy-MM-dd")).atStartOfDay(ZoneOffset.UTC).toInstant).toOption,
      () => Try(LocalDate.parse(s, fmt("yyyy/MM/dd")).atStartOfDay(ZoneOffset.UTC).toInstant).toOption,
      () => Try(LocalDate.parse(s, fmt("MM/dd/yyyy")).atStartOfDay(ZoneOffset.UTC).toInstant).toOption,
      () => Try(LocalDate.parse(s, fmt("dd MMM yyyy")).atStartOfDay(ZoneOffset.UTC).toInstant).toOption,
      () => Try(LocalDate.parse(s, fmt("MMMM d, yyyy")).atStartOfDay(ZoneOffset.UTC).toInstant).toOption)
    arms.view.flatMap(_()).headOption.map(i =>
      DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
        .withZone(ZoneOffset.UTC).format(i))
  }

  /** T4 recursive JSON date cleaning (cleaner.rs:453-520): walk a JSON
    * tree; string values under date-suggesting keys (contains date/time/
    * published/modified/created/updated/buildtime) are normalized via the
    * T3 cascade, unparseable ones are REMOVED; objects/arrays are walked
    * recursively. Invalid JSON -> None (as the reference's clean_json_dates
    * returns None). */
  def cleanJsonDates(json: String): Option[String] = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import scala.jdk.CollectionConverters._
    val dateHints = Seq("date", "time", "published", "modified", "created",
      "updated", "buildtime")
    def isDateKey(k: String): Boolean = {
      val l = k.toLowerCase(java.util.Locale.ROOT)
      dateHints.exists(l.contains)
    }
    def walk(node: JsonNode): Unit = node match {
      case obj: ObjectNode =>
        obj.fieldNames().asScala.toList.foreach { k =>
          val v = obj.get(k)
          if (isDateKey(k) && v != null && v.isTextual) {
            normalizeDateStr(v.asText()) match {
              case Some(n) => obj.put(k, n); ()
              case None => obj.remove(k); ()
            }
          } else if (v != null) walk(v)
        }
      case arr: ArrayNode => arr.asScala.foreach(walk)
      case _ => ()
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    scala.util.Try(mapper.readTree(json)).toOption
      .filter(n => n != null && (n.isObject || n.isArray))
      .map { root => walk(root); mapper.writeValueAsString(root) }
  }

  /** Column form of T4 for a structured_data JSON column. */
  def cleanJsonDatesCol: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => cleanJsonDates(s))

  /** T20 URL resolution (optimized.rs:371-386, reference-exact semantics):
    * http... -> as-is; //h/p -> https: prefix; /p -> base scheme://host + p
    * (host WITHOUT port, matching url::Url::host_str; unparseable base ->
    * href unchanged); else base minus trailing slashes + "/" + href. */
  def resolveUrl(href: Column, base: Column): Column = {
    val parsedOk = base.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+")
    val scheme = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    val host = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    when(href.startsWith("http"), href)
      .when(href.startsWith("//"), concat(lit("https:"), href))
      .when(href.startsWith("/"),
        when(parsedOk, concat(scheme, lit("://"), host, href)).otherwise(href))
      .otherwise(concat(regexp_replace(base, "/+$", ""), lit("/"), href))
  }

  // -------------------------------------------------------------- filters

  /** S4 row validation gate (data_pipeline/file_reader.py:134-180): valid
    * http(s) url longer than 10 chars and non-empty content. */
  def validRow(url: Column, content: Column): Column =
    url.isNotNull && url.rlike("^https?://") && length(url) > 10 &&
      content.isNotNull && length(content) > 0

  /** F5 chunk min-length filter (lib.rs:162-164). */
  def chunkLongEnough(c: Column): Column = length(trim(c)) >= 25

  /** F6 chunk meaningfulness (optimized.rs:303-337): >=20 chars, >=3 words,
    * alpha chars >= len/5, json-ish chars <= len/3, >=1 common word. */
  def chunkMeaningful(c: Column): Column = {
    val len = length(c)
    val words = size(split(trim(c), "\\s+"))
    val alpha = length(regexp_replace(c, "[^a-zA-Z]", ""))
    val jsonish = length(regexp_replace(c, "[^{}\\[\\]:,\"]", ""))
    val common = c.rlike("(?i)\\b(the|and|for|are|with|this|that|from|have|was|you)\\b")
    len >= 20 && words >= 3 && alpha >= len / 5 && jsonish <= len / 3 && common
  }

  /** F9 query validation (backend/utils/helpers.py:117-132): non-empty,
    * <=500 chars, >=1 alphanumeric; strip disallowed characters. Driver-side
    * (scala) — queries are scalars, not columns. */
  def validateQuery(q: String): Option[String] = {
    if (q == null) return None
    val cleaned = q.replaceAll("[^\\w\\s\\-.?!]", "").trim
    if (cleaned.isEmpty || cleaned.length > 500 || !cleaned.exists(_.isLetterOrDigit)) None
    else Some(cleaned)
  }

  // -------------------------------------------------------------- chunking

  /** T12 sentence chunker (cleaner.rs:127-200): split on sentence ends,
    * accumulate up to maxChars per chunk, emit chunks w/ index via
    * posexplode; word-count fallback for unpunctuated text. Returns
    * (id, chunk_index, text_chunk, word_count) — the DocumentChunk shape
    * (hybrid_processor.py:70-83). */
  def sentenceChunks(df: DataFrame, id: String, text: String,
      maxChars: Int = 2500, minChars: Int = 50): DataFrame = {
    val chunkArr = udf { (s: String) =>
      if (s == null) Array.empty[String]
      else {
        val sentences = s.split("(?<=[.!?])\\s+").filter(_.nonEmpty)
        val out = scala.collection.mutable.ArrayBuffer[String]()
        val cur = new StringBuilder
        def flush(): Unit = {
          if (cur.length >= minChars) out += cur.toString.trim
          cur.clear()
        }
        val parts =
          if (sentences.length <= 1 && s.length > maxChars)
            s.split("\\s+").grouped(400).map(_.mkString(" ")).toArray
          else sentences
        parts.foreach { sent =>
          if (cur.length + sent.length + 1 > maxChars) flush()
          if (cur.nonEmpty) cur.append(' ')
          cur.append(sent)
        }
        flush()
        if (out.isEmpty && s.trim.length >= minChars) Array(s.trim) else out.toArray
      }
    }
    df.select(col(id), posexplode(chunkArr(col(text))).as(Seq("chunk_index", "text_chunk")))
      .withColumn("word_count", size(split(col("text_chunk"), "\\s+")))
      .withColumn("chunk_id", concat(col(id), lit("_chunk_"), col("chunk_index")))
  }

  /** T12b word-window chunker — the DECLARATIVE form of the reference
    * chunker's unpunctuated arm (cleaner.rs:127-200 falls back to grouping
    * whitespace words when no sentence boundary exists; sentenceChunks
    * reproduces that via `grouped(400)` inside its UDF). This variant is the
    * scale path: pure column expressions (split / sequence / transform /
    * slice / array_join), fully codegen'd, no per-row lambda — the chunker
    * you run over 100 TB of unpunctuated/code text. Same output contract as
    * [[sentenceChunks]]: (id, chunk_index, text_chunk, word_count,
    * chunk_id), chunks shorter than minChars dropped, chunk_index re-packed
    * over the KEPT chunks (posexplode after the filter, as the UDF's
    * accumulate-then-emit does). */
  def wordWindowChunks(df: DataFrame, id: String, text: String,
      wordsPerChunk: Int = 400, minChars: Int = 50): DataFrame = {
    val toks = split(trim(col(text)), "\\s+")
    val nWin = greatest(
      ceil(size(toks) / lit(wordsPerChunk.toDouble)).cast("int") - 1, lit(0))
    val windows = transform(sequence(lit(0), nWin),
      i => array_join(slice(toks, i * wordsPerChunk + 1, lit(wordsPerChunk)), " "))
    val kept = filter(coalesce(windows, array().cast("array<string>")),
      c => length(c) >= minChars)
    df.select(col(id), posexplode(kept).as(Seq("chunk_index", "text_chunk")))
      .withColumn("word_count", size(split(col("text_chunk"), "\\s+")))
      .withColumn("chunk_id", concat(col(id), lit("_chunk_"), col("chunk_index")))
  }

  /** T13 chunk<->heading relevance (optimized.rs:339-368): a heading is
    * relevant if its words intersect the chunk's first-20 long words; <=3. */
  def relevantHeadings(chunk: Column, headings: Column): Column = {
    val first20 = slice(filter(Analyzer.tokensCol(chunk), t => length(t) > 3), 1, 20)
    slice(filter(headings, h =>
      size(array_intersect(Analyzer.tokensCol(h), first20)) > 0), 1, 3)
  }

  // ---------------------------------------------------------- metadata-ish

  /** T16 content-type classifier (metadata_extractor.rs:216-273): keyword
    * rules -> faq/product/video/recipe/review/blog/article. */
  def contentType(title: Column, text: Column): Column = {
    val t = lower(concat_ws(" ", title, substring(text, 1, 500)))
    when(t.rlike("\\bfaq|frequently asked"), "faq")
      .when(t.rlike("\\bbuy|price|add to cart|product"), "product")
      .when(t.rlike("\\bwatch|video|episode"), "video")
      .when(t.rlike("\\brecipe|ingredients"), "recipe")
      .when(t.rlike("\\breview|rating|stars"), "review")
      .when(t.rlike("\\bblog|posted by|comments"), "blog")
      .otherwise("article")
  }

  /** T17 content categories — full reference parity
    * (metadata_extractor.rs:464-574): Porter2-stemmed unigram+bigram set
    * scored against the ten reference keyword lists, top-3 by hits with
    * declaration-order tiebreak. Runs as a native expression
    * (graft.functions.ContentCategories) — the stem+adjacency fold has no
    * faithful column formulation. */
  def categories(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.ContentCategories(
      ColumnBridge.expression(text)))
  }

  /** T19 domain extraction (common/domain_ranker.py:123-139): host of the
    * url, lowercased, www-stripped. */
  def domainOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^https?://([^/:?#]+)", 1)), "^www\\.", "")

  /** T18 sha256 document id (hybrid_processor.py:171-172) — deterministic
    * variant (no wallclock): doc_ + sha256[:12] + _ + dl. */
  def documentId(content: Column, dl: Column): Column =
    concat(lit("doc_"), substring(sha2(content, 256), 1, 12), lit("_"), dl)

  /** T21 highlight/preview window (helpers.py:141-163): excerpt around the
    * first query-term hit, [-100, +300] with ellipses. */
  def highlight(text: Column, term: Column): Column = {
    val pos = instr(lower(text), lower(term))
    val start = greatest(pos - 100, lit(1))
    when(pos === 0, substring(text, 1, 300))
      .otherwise(concat(
        when(start > 1, lit("...")).otherwise(lit("")),
        substring(text, start.cast("int"), lit(400)),
        lit("...")))
  }

  /** T22 smart truncation (enhanced_search_service.py:52-56): word-agnostic
    * hard cut at maxLen-3 + ellipsis. */
  def truncateSmartly(text: Column, maxLen: Int = 300): Column =
    when(length(text) <= maxLen, text)
      .otherwise(concat(substring(text, 1, maxLen - 3), lit("...")))

  /** T22 sentence-boundary truncation (enhanced_search_service.py:33-46):
    * accumulate '.'-sentences while the preview stays under maxLen-10,
    * STOPPING at the first miss (the reference breaks out of its loop, so a
    * later short sentence can never sneak past a long one). */
  def truncateAtSentence(text: Column, maxLen: Int = 300): Column = {
    val z = struct(lit("").as("p"), lit(false).as("stop"))
    val preview = aggregate(split(text, "\\."), z,
      (a, s) => when(!a("stop") && (length(a("p")) + length(s) < maxLen - 10),
        struct(concat(a("p"), s, lit(".")).as("p"), lit(false).as("stop")))
        .otherwise(struct(a("p").as("p"), lit(true).as("stop"))),
      a => a("p"))
    when(length(text) <= maxLen, text)
      .otherwise(concat(preview,
        when(length(text) > length(preview), lit("...")).otherwise(lit(""))))
  }

  /** T22 query-relevant arm (enhanced_search_service.py:58-83): pick the
    * EARLIEST '.'-sentence with the strictly-highest query-term hit count —
    * substring containment of each (possibly repeated) whitespace-split
    * query term against the stripped, lowercased sentence; sentences under
    * 20 chars are skipped — then smart-truncate it; no scoring sentence (or
    * no query terms) falls back to smart truncation of the whole content. */
  def queryRelevantPreview(content: Column, query: Column,
      maxLen: Int = 300): Column = {
    val qterms = filter(split(lower(coalesce(query, lit(""))), "\\s+"),
      t => length(t) > 0)
    val z = struct(lit(0).as("score"), lit("").as("sent"))
    val best = aggregate(split(content, "\\."), z,
      (a, s0) => {
        val s = trim(s0)
        val sc = when(length(s) < 20, lit(0))
          .otherwise(size(filter(qterms, t => contains(lower(s), t))))
        when(sc > a("score"), struct(sc.as("score"), s.as("sent")))
          .otherwise(struct(a("score").as("score"), a("sent").as("sent")))
      },
      a => a("sent"))
    when(content.isNull || length(content) === 0, lit(""))
      .when(size(qterms) === 0, truncateSmartly(content, maxLen))
      .when(length(best) > 0, truncateSmartly(concat(best, lit(".")), maxLen))
      .otherwise(truncateSmartly(content, maxLen))
  }

  /** T22 preview cascade (enhanced_search_service.py:13-31): description
    * (stripped len > 30) truncated at sentence boundary, else structured
    * description (stripped len > 50) truncated smartly, else the
    * query-relevant best-scoring-sentence arm over the text chunk. */
  def createPreview(description: Column, structDesc: Column, textChunk: Column,
      query: Column, maxLen: Int = 300): Column = {
    val d = trim(description)
    val sd = trim(structDesc)
    when(d.isNotNull && length(d) > 30, truncateAtSentence(d, maxLen))
      .when(sd.isNotNull && length(sd) > 50, truncateSmartly(sd, maxLen))
      .otherwise(queryRelevantPreview(textChunk, query, maxLen))
  }

  /** T23 semantic metrics (optimized.rs:460-488): word/sentence/paragraph
    * counts, reading time, avg sentence length, content density. */
  def semanticMetrics(df: DataFrame, id: String, text: String): DataFrame = {
    val words = size(filter(split(col(text), "\\s+"), w => length(w) > 2))
    val sentences = greatest(size(split(col(text), "\\.")) - 1, lit(0))
    val paragraphs = greatest(size(split(col(text), "\n")), lit(1))
    df.select(col(id),
      words.cast("long").as("word_count"),
      sentences.cast("long").as("sentence_count"),
      paragraphs.cast("long").as("paragraph_count"),
      round(words.cast("double") / 200.0, 6).as("reading_time_min"),
      round(words.cast("double") / greatest(sentences, lit(1)), 6).as("avg_sentence_len"),
      round(length(regexp_replace(col(text), "\\s", "")).cast("double") /
        greatest(length(col(text)), lit(1)), 6).as("content_density"))
  }

  /** T9/T10 keyword extraction (freq variant, cleaner.rs:309-341): words
    * len>3 alphabetic non-stop, count >= 2, top-k by (count desc, word asc). */
  val StopWords: Seq[String] = Seq("the", "and", "for", "are", "with", "this",
    "that", "from", "have", "was", "you", "not", "but", "all", "can", "her",
    "his", "one", "our", "out", "day", "get", "has", "him", "how", "man",
    "new", "now", "old", "see", "two", "way", "who")

  /** T9 RAKE keyword extraction (hybrid_processor.py:252-283): split the
    * token stream into candidate phrases at stopwords, score each word
    * w as degree(w)/freq(w) + 1 (= (degree+freq)/freq), phrase score =
    * sum of its words' scores, keep phrases of words len>2, top-n by
    * (score desc, phrase asc). Pure JVM helper + a DataFrame wrapper. */
  def rakeKeywords(text: String, topN: Int = 10,
      stop: Set[String] = StopWords.toSet): Seq[(String, Double)] = {
    val tokens = graft.core.Analyzer.tokenize(if (text == null) "" else text)
    // candidate phrases: maximal stopword-free runs of words len>2
    val phrases = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val cur = scala.collection.mutable.ArrayBuffer[String]()
    tokens.foreach { t =>
      if (stop.contains(t) || t.length <= 2) {
        if (cur.nonEmpty) { phrases += cur.toSeq; cur.clear() }
      } else cur += t
    }
    if (cur.nonEmpty) phrases += cur.toSeq
    if (phrases.isEmpty) return Seq.empty
    val freq = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val degree = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    phrases.foreach { p =>
      p.foreach { w => freq(w) += 1; degree(w) += p.length - 1 }
    }
    def wordScore(w: String): Double = (degree(w) + freq(w)).toDouble / freq(w)
    phrases.map(p => p.mkString(" ") -> p.map(wordScore).sum)
      .groupBy(_._1).view.mapValues(_.head._2).toSeq
      .sortBy { case (p, s) => (-s, p) }
      .take(topN)
  }

  /** DataFrame form of T9: (id, keyword, score, rnk). */
  def rakeKeywordsDF(df: DataFrame, id: String, text: String,
      topN: Int = 10): DataFrame = {
    val rake = udf { (s: String) =>
      rakeKeywords(s, topN).map { case (p, sc) =>
        (p, BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    df.select(col(id), posexplode(rake(col(text))).as(Seq("i", "kw")))
      .select(col(id), col("kw._1").as("keyword"), col("kw._2").as("score"),
        (col("i") + 1).cast("long").as("rnk"))
  }

  def topKeywords(df: DataFrame, id: String, text: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(id), explode(Analyzer.tokensCol(col(text))).as("w"))
      .filter(length(col("w")) > 3 && col("w").rlike("^[a-z]+$") &&
        !col("w").isin(StopWords: _*))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
    val win = Window.partitionBy(col(id)).orderBy(col("cnt").desc, col("w").asc)
    toks.withColumn("rnk", row_number().over(win)).filter(col("rnk") <= k)
      .select(col(id), col("w").as("keyword"), col("cnt"), col("rnk"))
  }
}
