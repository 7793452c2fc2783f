package graft

import graft.io.CrawlSource
import graft.pipeline.{Insights, QueryIntel, Scoring, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clean_text strips urls/emails/entities and collapses whitespace (T1)") {
    val df = Seq("See https://ex.org/a and mail a@b.com &amp; \\u00e9  now!!!!")
      .toDF("t").select(TextPipeline.cleanText($"t").as("c"))
    assert(df.collect()(0).getString(0) == "See and mail now...")
  }

  test("clean_description truncates at sentence boundary <=300 (T2)") {
    val long = ("A sentence here. " * 30).trim
    val r = Seq(long).toDF("t")
      .select(TextPipeline.cleanDescription($"t").as("d")).collect()(0).getString(0)
    assert(r.length <= 302 && r.endsWith(".."))
    val short = "Short text."
    assert(Seq(short).toDF("t").select(TextPipeline.cleanDescription($"t"))
      .collect()(0).getString(0) == short)
  }

  test("normalize_date cascade emits UTC Z format or null (T3)") {
    val r = Seq("2025-08-01T12:30:00Z", "08/15/2025", "March 5, 2024", "garbage",
        "Tue, 15 Jul 2025 10:30:00 +0200", "Mon, 4 Aug 2025 08:00:00 GMT")
      .toDF("d").select(TextPipeline.normalizeDate($"d").as("n"))
      .collect().map(x => Option(x.getString(0)))
    assert(r(0).contains("2025-08-01T12:30:00Z"))
    assert(r(1).contains("2025-08-15T00:00:00Z"))
    assert(r(2).contains("2024-03-05T00:00:00Z"))
    assert(r(3).isEmpty) // unparseable dates are dropped (cleaner.rs:448)
    // RFC-2822 arm (cleaner.rs:344-450 tries it second)
    assert(r(4).contains("2025-07-15T08:30:00Z")) // +0200 -> UTC
    assert(r(5).contains("2025-08-04T08:00:00Z"))
  }

  test("normalizeDateStr (JVM) == normalizeDate (Column) on shared fixtures") {
    val fixtures = Seq("2025-08-01T12:30:00Z", "2025-08-01T12:30:00+02:00",
      "2025-08-01 06:15:00", "Tue, 15 Jul 2025 10:30:00 +0200",
      "Mon, 4 Aug 2025 08:00:00 GMT", "2024/03/05", "08/15/2025",
      "15 Aug 2025", "March 5, 2024", "03/05/2024 07:30 PM", "garbage", "")
    val viaColumn = fixtures.toDF("d")
      .select(TextPipeline.normalizeDate($"d").as("n"))
      .collect().map(r => Option(r.getString(0)))
    val viaJvm = fixtures.map(TextPipeline.normalizeDateStr)
    fixtures.lazyZip(viaColumn).lazyZip(viaJvm).foreach { (f, c, j) =>
      assert(c == j, s"column/JVM date normalizer diverge on '$f': $c vs $j")
    }
  }

  test("recursive JSON date cleaning normalizes hits, drops misses (T4)") {
    val json = """{"datePublished":"March 5, 2024","author":{"name":"x","created":"bad-date"},
      |"items":[{"dateModified":"2025-08-01T12:30:00+02:00"},{"note":"keep"}],
      |"buildTime":"08/15/2025","plain":"not touched"}""".stripMargin.replace("\n", "")
    val out = TextPipeline.cleanJsonDates(json).get
    assert(out.contains(""""datePublished":"2024-03-05T00:00:00Z""""))
    assert(out.contains(""""dateModified":"2025-08-01T10:30:00Z"""")) // +02:00 -> UTC
    assert(out.contains(""""buildTime":"2025-08-15T00:00:00Z""""))
    assert(!out.contains("created")) // unparseable date key removed
    assert(out.contains(""""plain":"not touched"""") && out.contains(""""note":"keep""""))
    assert(TextPipeline.cleanJsonDates("not json {{{").isEmpty)
    // column form over a DataFrame
    val viaCol = Seq(json).toDF("j")
      .select(TextPipeline.cleanJsonDatesCol($"j").as("c")).collect()(0).getString(0)
    assert(viaCol == out)
  }

  test("URL resolution mirrors the reference's resolve_url arms (T20)") {
    val cases = Seq(
      ("http://x.org/abs", "https://base.org/dir/page", "http://x.org/abs"),
      ("//cdn.x.org/a.js", "https://base.org/dir/page", "https://cdn.x.org/a.js"),
      ("/root.css", "https://base.org:8080/dir/page", "https://base.org/root.css"),
      ("/root.css", "notaurl", "/root.css"),
      ("rel/img.png", "https://base.org/dir/", "https://base.org/dir/rel/img.png"))
    val got = cases.map { case (h, b, _) => (h, b) }.toDF("h", "b")
      .select(TextPipeline.resolveUrl($"h", $"b").as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._3), s"got $got")
  }

  test("HTML extraction cascades: title/desc/author/date/canonical/keywords (T15/T11)") {
    import graft.pipeline.HtmlExtract
    val html = """<!DOCTYPE html><html><head>
      |<title>Fallback Title | Site</title>
      |<meta property="og:title" content="OG Title Wins">
      |<meta content="desc from meta" name="description">
      |<meta name="author" content="Ada Lovelace">
      |<meta property="article:published_time" content="2025-06-01T09:00:00Z">
      |<link rel="canonical" href="https://ex.org/canon">
      |<meta name="keywords" content="Spark, search engine , spark,">
      |</head><body><p>First para.</p></body></html>""".stripMargin
    val df = Seq(html).toDF("h").select(
      HtmlExtract.title($"h").as("t"), HtmlExtract.description($"h").as("d"),
      HtmlExtract.author($"h").as("a"), HtmlExtract.publishedDate($"h").as("p"),
      HtmlExtract.canonicalUrl($"h").as("c"), HtmlExtract.metaKeywords($"h").as("k"))
    val r = df.collect()(0)
    assert(r.getString(0) == "OG Title Wins")
    assert(r.getString(1) == "desc from meta") // reversed attr order handled
    assert(r.getString(2) == "Ada Lovelace")
    assert(r.getString(3) == "2025-06-01T09:00:00Z")
    assert(r.getString(4) == "https://ex.org/canon")
    assert(r.getSeq[String](5) == Seq("spark", "search engine"))

    // cascade fallbacks: no meta -> <title>; no title -> first h1
    val minimal = "<html><head><title> Just A Title </title></head><body><h1>H</h1></body></html>"
    assert(Seq(minimal).toDF("h").select(HtmlExtract.title($"h"))
      .collect()(0).getString(0) == "Just A Title")
    val h1only = "<html><body><h1>Only <b>Heading</b></h1><p>x</p></body></html>"
    assert(Seq(h1only).toDF("h").select(HtmlExtract.title($"h"))
      .collect()(0).getString(0) == "Only Heading")
  }

  test("JSON-LD arms: @type-first content type, author/date fallbacks, image + favicon (T15/T16)") {
    import graft.pipeline.HtmlExtract
    // a modern article: metadata lives in the JSON-LD block, not meta tags
    val html = """<!DOCTYPE html><html><head>
      |<title>Plain Title</title>
      |<script type="application/ld+json">
      |{"@context":"https://schema.org","@type":"NewsArticle",
      | "datePublished":"2025-03-04T10:00:00Z","dateModified":"2025-03-05T11:00:00Z",
      | "author":{"@type":"Person","name":"Grace Hopper"},
      | "image":{"@type":"ImageObject","url":"/img/lead.jpg"}}
      |</script>
      |<link rel="shortcut icon" href="/favicon.ico">
      |</head><body><img src="/logo.png"><img src="/img/body.jpg" alt="Body">
      |<p>Buy this product now at a great price.</p></body></html>""".stripMargin
    val r = Seq(html).toDF("h").select(
      HtmlExtract.jsonLdType($"h").as("ty"),
      HtmlExtract.author($"h").as("a"),
      HtmlExtract.publishedDate($"h").as("p"),
      HtmlExtract.modifiedDate($"h").as("m"),
      HtmlExtract.primaryImage($"h").as("img"),
      HtmlExtract.favicon($"h").as("fav")).collect()(0)
    assert(r.getString(0) == "newsarticle")
    assert(r.getString(1) == "Grace Hopper")
    assert(r.getString(2) == "2025-03-04T10:00:00Z")
    assert(r.getString(3) == "2025-03-05T11:00:00Z")
    val img = r.getStruct(4)
    assert(img.getAs[String]("src") == "/img/lead.jpg" &&
      img.getAs[String]("alt") == "Featured image")
    assert(r.getString(5) == "/favicon.ico")

    // @type wins over keyword rules in the pipeline's content_type; the
    // image/favicon srcs resolve against the page url
    val crawl = Seq(("https://www.ex.example.org/news/a1", html)).toDF("url", "content")
      .withColumn("domain", lit(null: String)).withColumn("timestamp", lit(null: String))
    val doc = CrawlSource.toDocuments(crawl).collect()(0)
    assert(doc.getAs[String]("content_type") == "newsarticle",
      "JSON-LD @type must beat the keyword rules ('product' text is present)")
    assert(doc.getAs[org.apache.spark.sql.Row]("primary_image")
      .getAs[String]("src") == "https://www.ex.example.org/img/lead.jpg")
    assert(doc.getAs[String]("favicon") == "https://www.ex.example.org/favicon.ico")
    assert(doc.getAs[String]("modified_date") == "2025-03-05T11:00:00Z")

    // no JSON-LD: og:image arm, then first non-logo <img>; string-valued
    // JSON-LD author; article:tag keywords beat legacy keywords
    val html2 = """<html><head>
      |<script type="application/ld+json">{"author":"Alan Turing","image":"https://cdn.ex.org/x.png"}</script>
      |<meta property="article:tag" content="Machine Learning">
      |<meta property="article:tag" content="AI">
      |<meta name="keywords" content="legacy, keywords">
      |</head><body><p>text</p></body></html>""".stripMargin
    val r2 = Seq(html2).toDF("h").select(
      HtmlExtract.author($"h").as("a"),
      HtmlExtract.primaryImage($"h").getField("src").as("src"),
      HtmlExtract.metaKeywords($"h").as("k")).collect()(0)
    assert(r2.getString(0) == "Alan Turing")
    assert(r2.getString(1) == "https://cdn.ex.org/x.png")
    // "ai" (2 chars) dropped by the >=3 rule; article:tag beats legacy
    assert(r2.getSeq[String](2) == Seq("machine learning"))

    val noJson = "<html><body><img src=\"/icons/x.png\"><img src=\"/pic/one.jpg\" alt=\"One\"></body></html>"
    val r3 = Seq(noJson).toDF("h")
      .select(HtmlExtract.primaryImage($"h").as("img")).collect()(0).getStruct(0)
    assert(r3.getAs[String]("src") == "/pic/one.jpg" && r3.getAs[String]("alt") == "One",
      "icon-path image must be skipped for the first meaningful image")
  }

  test("plain text quoting a tag fragment does NOT trip the HTML cascade") {
    import graft.pipeline.HtmlExtract
    // a text doc that QUOTES markup: the content-div arm must not collapse
    // the document to the quoted element's inner text
    val quoted = """This plain article discusses markup. For example,
      |<div class="post-content">example</div> renders a box. The full body
      |text must stay indexed, every sentence of it.""".stripMargin
    val r = Seq(quoted).toDF("h")
      .select(HtmlExtract.looksLikeHtml($"h").as("is"))
      .collect()(0).getBoolean(0)
    assert(!r, "tag fragment misclassified as an HTML document")
    val crawl = Seq(("https://www.t.example.org/a", quoted))
      .toDF("url", "content")
      .withColumn("domain", lit(null: String)).withColumn("timestamp", lit(null: String))
    val text = CrawlSource.toDocuments(crawl).collect()(0).getAs[String]("text")
    assert(text.contains("full body") && text.contains("discusses markup"),
      s"plain-text body collapsed: '$text'")
  }

  test("HTML headings + main-content cascade strip noise nodes (T14/F3/F4)") {
    import graft.pipeline.HtmlExtract
    val html = """<html><body>
      |<nav>Home About Contact</nav>
      |<header>Big Banner</header>
      |<h1>Main Title</h1><h2>Sub <em>Topic</em></h2><h4>not captured</h4>
      |<main><p>The real content paragraph lives here.</p>
      |<script>var x = "noise";</script></main>
      |<aside>sidebar junk</aside>
      |<footer>copyright</footer>
      |</body></html>""".stripMargin
    val r = Seq(html).toDF("h").select(
      HtmlExtract.headings($"h").as("hs"), HtmlExtract.mainText($"h").as("m"))
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("Main Title", "Sub Topic"))
    val main = r.getString(1)
    assert(main.contains("real content paragraph"))
    assert(!main.contains("noise") && !main.contains("sidebar") &&
      !main.contains("Banner") && !main.contains("copyright"))
    // selector cascade: no <main>/<article> -> content div -> body
    val divHtml = """<html><body><nav>menu</nav>
      |<div class="main-content">Div content text</div></body></html>""".stripMargin
    assert(Seq(divHtml).toDF("h").select(HtmlExtract.mainText($"h"))
      .collect()(0).getString(0) == "Div content text")
    val bodyOnly = "<html><body><p>Body fallback text</p></body></html>"
    assert(Seq(bodyOnly).toDF("h").select(HtmlExtract.mainText($"h"))
      .collect()(0).getString(0) == "Body fallback text")
  }

  test("F4 full 16-selector parity: append-all across selectors, >50 gate, class-token match") {
    import graft.pipeline.HtmlExtract
    val pad = "x " * 30 // pushes arm text past the reference's 50-char gate
    // the reference APPENDS every qualifying selector's first match
    // (main_content_extractor.rs:18-28) — <main> AND <article> AND
    // .post-content all contribute, in selector-priority order
    val html = s"""<html><body>
      |<main>Main arm content $pad</main>
      |<article>Article arm content $pad</article>
      |<div class="wrap post-content extra">Post arm content $pad</div>
      |<div class="tiny post-body">short</div>
      |</body></html>""".stripMargin
    val m = Seq(html).toDF("h").select(HtmlExtract.mainText($"h"))
      .collect()(0).getString(0)
    val iMain = m.indexOf("Main arm content")
    val iArt = m.indexOf("Article arm content")
    val iPost = m.indexOf("Post arm content")
    assert(iMain >= 0 && iArt >= 0 && iPost >= 0,
      s"all qualifying selector arms must be appended, got: $m")
    assert(iMain < iArt && iArt < iPost, "selector priority order lost")
    assert(!m.contains("short"), "sub-50-char arm must not contribute")

    // .class is a TOKEN match ('content' must not match class='content-x'),
    // #content is exact, [role='main'] works on any tag
    val tokenHtml = s"""<html><body>
      |<div class="content-x">Wrong token $pad</div>
      |<div id="content">Id arm content $pad</div>
      |<section role="main">Role arm content $pad</section>
      |</body></html>""".stripMargin
    val m2 = Seq(tokenHtml).toDF("h").select(HtmlExtract.mainText($"h"))
      .collect()(0).getString(0)
    assert(m2.contains("Id arm content") && m2.contains("Role arm content"))
    assert(!m2.startsWith("Wrong token"),
      "class token match must not treat 'content-x' as .content")

    // class/id CONTAINS-based noise removal (reference's substring check):
    // class="top-header-wrap" is dropped even though the tag is a div
    val noiseHtml = s"""<html><body>
      |<div class="top-header-wrap">chrome junk</div>
      |<main>Real body content $pad</main>
      |</body></html>""".stripMargin
    val m3 = Seq(noiseHtml).toDF("h").select(HtmlExtract.mainText($"h"))
      .collect()(0).getString(0)
    assert(m3.contains("Real body content") && !m3.contains("chrome junk"))
  }

  test("F1 reference ladder: URL arms, lang= attribute, confidence-thresholded content") {
    import graft.ops.TextAnalysis._
    def det(text: String, url: String): Option[String] =
      Option(Seq((text, url)).toDF("t", "u")
        .select(detectLanguage($"t", $"u")).collect()(0).getString(0))
    val prose = "the cat and the dog is of note that it runs with the wind " * 3
    // URL arm: only an "en" verdict short-circuits …
    assert(det(prose, "https://en.example.xyz/page") == Some("en"))
    assert(det("der die und ist das nicht ein mit " * 4,
      "https://de.example.xyz/") == Some("de"),
      "a non-en URL verdict must fall through to content detection")
    assert(det(prose, "https://news.github.io/x") == Some("en"),   // contains github
      "ENGLISH_DOMAIN_NAMES containment arm")
    assert(det(prose, "https://example.xyz/en/docs") == Some("en"), "path arm")
    assert(det(prose, "https://example.com/") == Some("en"), "TLD arm")
    // … lang= attribute beats content …
    assert(det("<html lang=\"fr-FR\"><body>the the the</body></html>",
      "https://example.xyz/") == Some("fr"))
    assert(det("<p lang=pt>x</p> irrelevant", "https://example.xyz/") == Some("pt"),
      "bare (unquoted) lang attribute arm")
    // … content arm with the 0.7 confidence threshold …
    assert(det("el que los las una por como pero " * 4,
      "https://example.xyz/") == Some("es"))
    assert(det("le les est dans pour qui pas vous " * 4,
      "https://example.xyz/") == Some("fr"))
    assert(det("the and is el que los der und " * 4,
      "https://example.xyz/") == None,
      "mixed markers below 0.7 confidence must yield null like whatlang's reject")
    // … script-ratio arms and the empty-text arm
    assert(det("привет это русский текст для проверки",
      "https://example.xyz/") == Some("ru"))
    assert(det("   ", "https://en.example.xyz/") == None,
      "empty text is None regardless of URL (detect_language:35-37)")
    // is_english: empty text falls back to the URL arm alone
    val eng = Seq(("", "https://en.example.xyz/"), ("", "https://example.xyz/"))
      .toDF("t", "u").select(isEnglish($"t", $"u")).collect().map(_.getBoolean(0))
    assert(eng.toSeq == Seq(true, false))
  }

  test("sentence chunker respects max size + emits indexed chunks (T12)") {
    val text = (1 to 100).map(i => s"Sentence number $i is right here.").mkString(" ")
    val chunks = TextPipeline.sentenceChunks(
      Seq(("d1", text)).toDF("id", "text"), "id", "text", maxChars = 300)
      .collect()
    assert(chunks.length > 5)
    assert(chunks.forall(_.getAs[String]("text_chunk").length <= 300))
    assert(chunks.map(_.getAs[Int]("chunk_index")).toSeq == chunks.indices.toSeq)
    assert(chunks.head.getAs[String]("chunk_id") == "d1_chunk_0")
    // lossless-ish: all sentences present across chunks
    val joined = chunks.map(_.getAs[String]("text_chunk")).mkString(" ")
    assert((1 to 100).forall(i => joined.contains(s"number $i ") || joined.contains(s"number $i is")))
  }

  test("word-window chunker: declarative windows, minChars drop re-packs indexes (T12b)") {
    // 34 four-char words -> windows of 16/16/2; the 2-word tail (9 chars)
    // falls below minChars and is dropped
    val t1 = (1 to 34).map(i => f"w$i%03d").mkString(" ")
    val c1 = TextPipeline.wordWindowChunks(
      Seq(("d1", t1)).toDF("id", "text"), "id", "text",
      wordsPerChunk = 16, minChars = 50).collect()
    assert(c1.length == 2)
    assert(c1.map(_.getAs[Int]("chunk_index")).toSeq == Seq(0, 1))
    assert(c1.forall(_.getAs[Int]("word_count") == 16))
    assert(c1(0).getAs[String]("text_chunk").startsWith("w001") &&
      c1(1).getAs[String]("text_chunk").startsWith("w017"))
    assert(c1(0).getAs[String]("chunk_id") == "d1_chunk_0")

    // a short MIDDLE window (16 one-char words = 31 chars) is dropped and
    // the following window re-packs to chunk_index 1
    val t2 = ((1 to 16).map(i => f"w$i%03d") ++ Seq.fill(16)("a") ++
      (1 to 16).map(i => f"v$i%03d")).mkString(" ")
    val c2 = TextPipeline.wordWindowChunks(
      Seq(("d2", t2)).toDF("id", "text"), "id", "text",
      wordsPerChunk = 16, minChars = 50).collect()
    assert(c2.length == 2)
    assert(c2.map(_.getAs[Int]("chunk_index")).toSeq == Seq(0, 1))
    assert(c2(1).getAs[String]("text_chunk").startsWith("v001"),
      "dropped middle window must re-pack the next chunk's index")

    // whole-text-below-minChars and null text produce no chunks
    val c3 = TextPipeline.wordWindowChunks(
      Seq(("d3", "too short"), ("d4", null)).toDF("id", "text"), "id", "text",
      wordsPerChunk = 16, minChars = 50).collect()
    assert(c3.isEmpty)
  }

  test("chunk filters: min length (F5) + meaningfulness (F6)") {
    val rows = Seq("tiny", "x" * 30,
      "the data pipeline processes this batch with care and attention",
      "{\"k\":1,\"v\":2,\"w\":[1,2,3],\"z\":{\"a\":4}}").toDF("c")
    val kept = rows.filter(TextPipeline.chunkLongEnough($"c") &&
      TextPipeline.chunkMeaningful($"c")).collect().map(_.getString(0))
    assert(kept.length == 1 && kept(0).startsWith("the data pipeline"))
  }

  test("Porter2 stemmer: published-algorithm vectors incl. exceptions (T17)") {
    import graft.pipeline.Porter2.stem
    val vectors = Seq(
      "running" -> "run", "hopping" -> "hop", "hoping" -> "hope",
      "flies" -> "fli", "ties" -> "tie", "cries" -> "cri",
      "matches" -> "match", "investments" -> "invest",
      "conditional" -> "condit", "rational" -> "ration",
      "generously" -> "generous", "nationalization" -> "nation",
      "caresses" -> "caress", "sensational" -> "sensat",
      // exceptional forms + invariants
      "dying" -> "die", "lying" -> "lie", "skies" -> "sky", "news" -> "news",
      "early" -> "earli", "proceed" -> "proceed", "inning" -> "inning",
      // consonant-y handling
      "enjoyment" -> "enjoy", "crying" -> "cri",
      // short words untouched
      "be" -> "be", "ox" -> "ox")
    vectors.foreach { case (in, want) =>
      assert(stem(in) == want, s"stem($in) = ${stem(in)}, want $want")
    }
  }

  test("content categories: stemmed ngram matching over the 10 reference lists (T17)") {
    def cats(text: String): Seq[String] =
      Seq(text).toDF("t").select(TextPipeline.categories($"t"))
        .collect()(0).getSeq[String](0)
    // stemming is REQUIRED for these hits: matches->match, tournaments->
    // tournament, teams->team
    assert(cats("The football matches and tournaments brought both teams together") ==
      Seq("sports"))
    // bigram keyword: adjacent non-stop pair "mental health"
    val health = cats("Improve mental health with wellness fitness and a balanced diet")
    assert(health.head == "health")
    // tie between news (news, report) and sports (football, game) resolves
    // in declaration order: news first
    assert(cats("news report of the football game") == Seq("news", "sports"))
    // at most 3 categories, hits-descending (travel 3 > health 2 = fashion 2;
    // fitness/wellness stem to fit/well and so never match their keywords —
    // faithful reference quirk: keyword strings are not stemmed)
    val many = cats("health fitness wellness doctor | travel hotel flight | " +
      "food recipe | fashion style | school")
    assert(many == Seq("travel", "health", "fashion"), s"got $many")
    // no hits -> empty
    assert(cats("lorem ipsum dolor sit amet").isEmpty)
  }

  test("query validation (F9)") {
    assert(TextPipeline.validateQuery("  python <script> tutorial! ")
      .contains("python script tutorial!"))
    assert(TextPipeline.validateQuery("").isEmpty)
    assert(TextPipeline.validateQuery("@#$%").isEmpty)
    assert(TextPipeline.validateQuery("x" * 600).isEmpty)
  }

  test("domain extraction + domain score + boost (T19/Q1/Q11)") {
    val df = Seq("https://www.Wikipedia.org/wiki/Spark", "https://foo.edu/x",
      "http://shop.biz/y").toDF("url")
      .select(TextPipeline.domainOf($"url").as("d"))
      .withColumn("score", Scoring.domainScore($"d"))
      .withColumn("boost", Scoring.domainBoost($"d", lit("tutorial")))
    val r = df.collect().map(x => (x.getString(0), x.getDouble(1), x.getDouble(2)))
    assert(r(0) == ("wikipedia.org", 0.9, 2.0 * 1.4))
    assert(r(1)._2 == 0.8 && r(1)._3 == 1.6 * 1.4)
    assert(r(2)._2 == 0.35)
  }

  test("content quality composite is in a sane band and monotone-ish (Q2)") {
    val good = ("This tutorial explains the api. " * 50) + "```code``` def f(): return 1"
    val bad = "click here buy now"
    val df = Seq(good, bad).toDF("t")
      .withColumn("wc", size(split($"t", "\\s+")))
      .select(Scoring.contentQualityScore($"t", lit("A Practical Guide to Spark"),
        lit("a description that is long enough to earn the bonus points here"),
        $"wc", lit(3), lit(true), lit(true)).as("q"))
    val Array(g, b) = df.collect().map(_.getDouble(0))
    assert(g > b, s"good=$g bad=$b")
    assert(g > 0.3 && g < 2.0)
  }

  test("insights aggregations (A1-A9 shapes)") {
    val results = Seq(
      ("a.org", 0.9, "article", "great spark data tutorial from 2024", "2024-01-05"),
      ("a.org", 0.6, "blog", "older spark data notes from 2015", "2015-03-01"),
      ("b.com", 0.4, "article", "spark data again 2025 fresh", "2025-06-01")
    ).toDF("domain", "quality", "content_type", "text", "dt")
      .withColumn("dt", to_date($"dt"))
    val ins = Insights.searchInsights(results, "domain", "quality", "content_type")
      .collect()(0)
    assert(ins.getAs[Long]("total_results") == 3)
    assert(ins.getAs[Long]("unique_domains") == 2)
    assert(ins.getAs[Double]("avg_quality") == 0.63)
    val qd = Insights.qualityDistribution(results, "quality").collect()(0)
    assert((qd.getLong(0), qd.getLong(1), qd.getLong(2)) == ((1L, 1L, 1L)))
    val dr = Insights.dateRange(results, "dt").collect()(0)
    assert(dr.getString(0) == "2015-03-01" && dr.getString(1) == "2025-06-01")
    val fresh = Insights.freshness(results, "domain", "text").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(fresh("b.com") == "very_recent")
    val tc = Insights.topicClusters(results, "text").collect().map(_.getString(0))
    assert(tc.contains("spark") && tc.contains("data"))
  }

  test("query intelligence (X1-X7)") {
    assert(QueryIntel.expansions("python tutorial") ==
      Seq("python3", "py", "cpython"))
    assert(QueryIntel.enhancedQuery("python").contains("OR"))
    assert(QueryIntel.classifyIntent("how to learn spark basics").intent == "learning")
    assert(QueryIntel.classifyIntent("spark vs flink difference").intent == "comparison")
    assert(QueryIntel.classifyIntent("weather").intent == "informational")
    val e = QueryIntel.extractEntities("advanced PYTHON \"exact phrase\" SQL api")
    assert(e.technologies.contains("python") && e.technologies.contains("sql"))
    assert(e.levels == Seq("advanced"))
    assert(e.quoted == Seq("exact phrase"))
    assert(e.acronyms.contains("PYTHON") && e.acronyms.contains("SQL"))
    assert(QueryIntel.correct("pyton tutorail") == "python tutorial")
    val summary = QueryIntel.templateSummary("spark", 42L,
      Seq("a.org" -> 5L, "b.com" -> 3L), Some("Spark Guide"))
    assert(summary.contains("42") && summary.contains("a.org"))
    // X6 rerank: relevance pulls matching hit up
    val hits = Seq(("low quality but exact spark match", 0.1),
      ("high quality unrelated", 0.9))
    val reranked = QueryIntel.rerank[(String, Double)](hits, "spark match",
      _._2, _._1)
    assert(reranked.head._1.contains("spark"))
  }

  test("RAKE keywords: multi-word phrases outscore single frequent words (T9)") {
    val text = "machine learning pipeline for the data and machine learning " +
      "pipeline was the data but small"
    val kws = TextPipeline.rakeKeywords(text, 5)
    assert(kws.head._1 == "machine learning pipeline", s"got $kws")
    assert(kws.head._2 > kws.find(_._1 == "data").map(_._2).getOrElse(0.0))
    // degree/freq math: each of machine/learning/pipeline has freq 2,
    // degree 4 -> word score 3.0 -> phrase score 9.0
    assert(kws.head._2 == 9.0)
    val df = TextPipeline.rakeKeywordsDF(
      Seq((1L, text)).toDF("id", "text"), "id", "text", 3).collect()
    assert(df.head.getAs[String]("keyword") == "machine learning pipeline")
    assert(df.head.getAs[Long]("rnk") == 1L)
  }

  test("chunk<->heading relevance picks intersecting headings, <=3 (T13)") {
    val r = Seq(("spark merge join strategies for large tables explained here",
        Seq("Merge Join Basics", "Unrelated Heading", "Spark Internals",
          "Join Performance", "Another Spark Topic")))
      .toDF("chunk", "headings")
      .select(TextPipeline.relevantHeadings($"chunk", $"headings").as("rel"))
      .collect()(0).getSeq[String](0)
    assert(r.contains("Merge Join Basics") && !r.contains("Unrelated Heading"))
    assert(r.length <= 3)
  }

  test("highlight excerpts around the first term hit with ellipses (T21)") {
    val long = ("x " * 200) + "the needle term appears here " + ("y " * 200)
    val h = Seq(long).toDF("t")
      .select(TextPipeline.highlight($"t", lit("needle")).as("h"))
      .collect()(0).getString(0)
    assert(h.contains("needle") && h.startsWith("...") && h.endsWith("..."))
    assert(h.length < 420)
    // no hit -> leading excerpt
    val miss = Seq("short text without the word").toDF("t")
      .select(TextPipeline.highlight($"t", lit("zzz")).as("h"))
      .collect()(0).getString(0)
    assert(miss.startsWith("short text"))
  }

  test("HTML docs -> extracted title/headings fields -> boosted multi-field search") {
    import graft.index.IndexBuilder
    import graft.query.{QueryEngine, SearchIndex}
    import graft.query.QueryEngine.SearchOpts
    // the reference's primary shape (opensearch_service.py:198-227):
    // text_chunk^1.5, headings^3.0, title^2.5 — a doc whose HEADINGS match
    // must outrank docs with the same term only in body text
    def page(title: String, heading: String, body: String) =
      s"""<html><head><title>$title</title></head><body>
         |<h1>$heading</h1><main><p>$body</p></main></body></html>""".stripMargin
    val crawl = Seq(
      (0L, "https://a.example.org/x", page("Plain doc", "General notes",
        "serialization appears here in the body text with other words serialization")),
      (1L, "https://b.example.org/y", page("Another doc", "Serialization Guide",
        "body paragraph about something else entirely with enough words")),
      (2L, "https://c.example.org/z", page("Third doc", "Unrelated heading",
        "more body content without the key term at all in this one"))
    ).toDF("id", "url", "content")
      .withColumn("domain", lit(null: String)).withColumn("timestamp", lit(null: String))
    val docs = CrawlSource.toDocuments(crawl.drop("id"))
      .withColumn("docId",
        when(col("url").contains("//a."), 0L)
          .when(col("url").contains("//b."), 1L).otherwise(2L))
      .withColumn("repo", TextPipeline.domainOf(col("url")))
      .withColumn("path", col("url")).withColumn("lang", lit("en"))
      .withColumn("content", col("text"))
      .withColumn("headings_text", concat_ws(" . ", col("headings")))
    val dir = "/tmp/graft-test/html-mf-index"
    IndexBuilder.build(spark, docs.select("docId", "repo", "path", "lang",
        "content", "title", "headings_text"), dir,
      IndexBuilder.Params(blockSize = 32, docGroupSize = 128L,
        fields = Seq("content", "title", "headings_text")))
    val idx = new SearchIndex(spark, dir)
    val hits = QueryEngine.search(idx, "serialization",
      SearchOpts(k = 3, diversity = false,
        fields = Seq("content" -> 1.5, "headings_text" -> 3.0, "title" -> 2.5)))
      .collect().map(_.getAs[Long]("docId")).toSeq
    assert(hits.head == 1L,
      s"headings^3.0 match must outrank body-only matches, got $hits")
    assert(hits.contains(0L)) // body match still recalled
  }

  test("upsert promote crash window: recovery restores the set-aside table") {
    val dir = "/tmp/graft-test/upsert-crash"
    graft.index.IndexBuilder.deleteDir(spark, dir)
    val t1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    CrawlSource.upsertById(spark, s"$dir/t", t1, "id")
    // simulate a crash between rename(table -> table-old) and
    // rename(tmp -> table): live path gone, data only in -old
    val fs = new org.apache.hadoop.fs.Path(s"$dir/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/t"),
      new org.apache.hadoop.fs.Path(s"$dir/t-old"))
    // next upsert must RECOVER the old table before merging, not treat the
    // table as empty (which would then delete the sole surviving copy)
    CrawlSource.upsertById(spark, s"$dir/t",
      Seq((2L, "B2"), (3L, "c")).toDF("id", "v"), "id")
    val out = spark.read.parquet(s"$dir/t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B2", 3L -> "c"), s"got $out")
  }

  test("crawl JSONL -> documents + chunks -> tagged shards -> upsert (S1-S6, §3.2)") {
    val dir = "/tmp/graft-test/crawl"
    graft.index.IndexBuilder.deleteDir(spark, dir)
    val lines = Seq(
      """{"url":"https://www.example.org/a","content":"<html><style>x{}</style><body><p>Spark tutorial. This guide explains the data api. It has many sentences. Enough content to chunk and score properly here.</p></body></html>","domain":null,"timestamp":"2025-08-01T00:00:00Z","http_status_code":200}""",
      """{"url":"https://docs.foo.edu/b","content":"<body>Machine learning basics. A long document about data. More text to pass minimum thresholds for chunks.</body>","timestamp":"bad-date"}""",
      """{"url":"ftp://bad.scheme/x","content":"ignored"}""",
      """{"url":"https://ok.com/empty","content":""}""",
      """not even json {{{""")
    val inPath = s"$dir/in.jsonl"
    val fs = new java.io.PrintWriter(new java.io.File({
      new java.io.File(dir).mkdirs(); inPath }))
    lines.foreach(fs.println); fs.close()

    val crawl = CrawlSource.readCrawl(spark, inPath)
    assert(crawl.count() == 2) // corrupt + invalid rows gated out (S4)

    val docs = CrawlSource.toDocuments(crawl)
    val d = docs.collect()
    assert(d.length == 2)
    val first = docs.filter($"domain" === "example.org").collect()(0)
    assert(first.getAs[String]("document_id").startsWith("doc_"))
    assert(first.getAs[String]("published_date") == "2025-08-01T00:00:00Z")
    val si = first.getAs[org.apache.spark.sql.Row]("semantic_info")
    assert(si.getAs[Double]("domain_score") == 0.6) // .org tld
    assert(!first.getAs[String]("text").contains("<"))

    val chunks = CrawlSource.toChunks(docs)
    assert(chunks.count() >= 2)
    assert(chunks.columns.toSeq == Seq("chunk_id", "document_id", "text_chunk",
      "chunk_index", "word_count"))

    CrawlSource.writeTaggedJsonl(docs, chunks, s"$dir/out")
    val back = spark.read.json(s"$dir/out/documents")
    assert(back.count() == 2 &&
      back.select("type").distinct().collect()(0).getString(0) == "document")

    // S6 upsert: second write with one changed row is idempotent by id
    CrawlSource.upsertById(spark, s"$dir/docs_table", docs.drop("text"), "document_id")
    CrawlSource.upsertById(spark, s"$dir/docs_table",
      docs.drop("text").withColumn("title", lit("UPDATED")), "document_id")
    val tbl = spark.read.parquet(s"$dir/docs_table")
    assert(tbl.count() == 2)
    assert(tbl.filter($"title" === "UPDATED").count() == 2)
  }

  test("F7 web-noise rejection: every arm fires and clean prose passes") {
    import graft.pipeline.NoiseFilters
    def noise(s: String): Boolean =
      Seq(s).toDF("t").select(NoiseFilters.webNoise($"t")).collect()(0).getBoolean(0)
    assert(!noise("plain readable prose about spark joins and sorted merges"))
    assert(noise("page body &nbsp; leaked entity"))                 // entities
    assert(noise(".mw-parser-output .hlist dd{display:inline}"))    // CSS
    assert(noise("Retrieved from wiki page history"))               // MediaWiki
    assert(noise("""{"type":"link","href":"/x"} remnant"""))        // JSON
    assert(noise("diffhist talk contribs diffhist rollback"))       // density > 20%
    assert(noise("w " * 300 + ":;" * 15))                           // CSS char density
    assert(noise("refs [1] [2] [3] [4] [5] [6] end"))               // bracket spam
    assert(noise("some words " + "X" * 30))                         // uppercase windows
    assert(noise("click here read more click here read more now"))  // nav density
  }

  test("toChunks drops web-noise chunks (optimized.rs:182 admission)") {
    val docs = Seq(
      ("clean", "A clean first sentence about spark merges that is long " +
        "enough to keep and index without any interface residue at all."),
      ("noisy", ".mw-parser-output .hlist dd{display:inline} navbox " +
        "padding:0 stylesheet leak that should never reach the index."))
      .toDF("document_id", "text")
    val chunks = CrawlSource.toChunks(docs).collect()
    assert(chunks.exists(_.getAs[String]("document_id") == "clean"))
    assert(!chunks.exists(_.getAs[String]("document_id") == "noisy"),
      "CSS noise chunk survived the admission filter")
  }

  test("F8 line predicates: nav/quality arms + the lowercase-haystack quirk") {
    import graft.pipeline.NoiseFilters
    def nav(s: String): Boolean =
      Seq(s).toDF("t").select(NoiseFilters.isNavigationLine($"t")).collect()(0).getBoolean(0)
    def lowq(s: String): Boolean =
      Seq(s).toDF("t").select(NoiseFilters.isLowQualityLine($"t")).collect()(0).getBoolean(0)
    assert(nav("Main Menu"))
    assert(nav("skip to content"))
    assert(!nav("ordinary sentence about sorted runs"))
    assert(lowq("margin:0 auto; padding:0"))                // CSS
    assert(lowq("[1.0](2.1)[3]...5"))                       // id-char majority
    assert(lowq("ABCDEFGHIJK is an acronym"))               // >8 uppercase, short
    assert(lowq("please wait loading..."))                  // quality issues
    assert(lowq("!!!???!!!***###"))                         // punct ratio > 0.6
    assert(lowq("loooooooooooooong run"))                   // >10 repeat chars
    assert(!lowq("a normal content sentence with words"))
    // reference quirk kept literally: mixed-case interface entries are
    // checked against the LOWERCASED line, so they can never fire
    assert(!lowq("vtePart of a navigation footer"))
    // ...but F7 checks the RAW text, where the same marker does fire
    def noise(s: String): Boolean =
      Seq(s).toDF("t").select(NoiseFilters.webNoise($"t")).collect()(0).getBoolean(0)
    assert(noise("vtePart of a navigation footer"))
  }
}
