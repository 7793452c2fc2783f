package graft.pipeline

/** Porter2 (Snowball "english") stemmer — a from-scratch JVM implementation
  * of the published algorithm (snowballstem.org/algorithms/english/stemmer
  * .html), matching the stemmer the reference's categorizer uses
  * (rust_stemmers Algorithm::English,
  * data_pipeline/rust_core_processor/src/extractor/metadata_extractor
  * .rs:477,486). No dependencies; pure string steps.
  *
  * Conventions: input is lowercased first; consonant-y is marked as 'Y'
  * during processing ('y' counts as a vowel, 'Y' does not) and restored at
  * the end. R1/R2 are computed once on the marked word — suffix removal
  * only shrinks the right end, so the region START indexes stay valid.
  */
object Porter2 {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private def isV(w: String, i: Int): Boolean = isVowel(w.charAt(i))

  private val Exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val Exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val Doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val LiEnding = "cdeghkmnrt".toSet

  /** Region start: after the first non-vowel following a vowel, scanning
    * from `from`; word length if no such position. */
  private def regionStart(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isV(w, i)) i += 1
    while (i < w.length && isV(w, i)) i += 1
    if (i >= w.length) w.length else i + 1
  }

  private def r1Start(w: String): Int = {
    Seq("gener", "commun", "arsen").find(w.startsWith) match {
      case Some(p) => p.length
      case None => regionStart(w, 0)
    }
  }

  /** Short syllable at the word end: non-vowel, vowel, non-vowel(not w/x/Y)
    * — or a 2-letter word vowel+non-vowel. */
  private def endsInShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isV(w, 0) && !isV(w, 1)
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      !isV(w, n - 3) && isV(w, n - 2) && !isV(w, n - 1) &&
        c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  def stem(input: String): String = {
    var w = input.toLowerCase(java.util.Locale.ROOT)
    if (w.startsWith("'")) w = w.substring(1)
    Exceptions1.get(w) match {
      case Some(s) => return s
      case None => ()
    }
    if (w.length <= 2) return w

    // mark consonant y (initial y, or y after a vowel)
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    val r1 = r1Start(w)
    val r2 = regionStart(w, r1)
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2

    // ---- step 0: ', 's, 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) { /* nothing */ }
    else if (w.endsWith("s")) {
      // delete if a vowel exists that is not immediately before the s
      var hasV = false
      var j = 0
      while (!hasV && j < w.length - 2) { if (isV(w, j)) hasV = true; j += 1 }
      if (hasV) w = w.dropRight(1)
    }

    if (Exceptions2.contains(w)) return w.replace('Y', 'y')

    // ---- step 1b (longest of eedly/ingly/edly/eed/ing/ed)
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
      .find(w.endsWith)
    s1b match {
      case Some(sfx) if sfx == "eed" || sfx == "eedly" =>
        if (inR1(sfx.length)) w = w.dropRight(sfx.length) + "ee"
      case Some(sfx) =>
        val stemPart = w.dropRight(sfx.length)
        if (stemPart.exists(isVowel)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && Doubles.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (r1 >= w.length && endsInShortSyllable(w)) w += "e"
        }
      case None => ()
    }

    // ---- step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (w.length > 2) {
      val c = w.charAt(w.length - 1)
      if ((c == 'y' || c == 'Y') && !isV(w, w.length - 2))
        w = w.dropRight(1) + "i"
    }

    // ---- step 2 (longest match; then the R1 test — no shorter retry)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive",
      "tional" -> "tion", "biliti" -> "ble", "lessli" -> "less",
      "entli" -> "ent", "ation" -> "ate", "alism" -> "al",
      "aliti" -> "al", "ousli" -> "ous", "iviti" -> "ive",
      "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate",
      "alli" -> "al", "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l')
            w = w.dropRight(3) + rep
        } else if (sfx == "li") {
          if (w.length > 2 && LiEnding.contains(w.charAt(w.length - 3)))
            w = w.dropRight(2)
        } else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }

    // ---- step 3 (R1; ative additionally needs R2)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) } match {
      case Some((sfx, rep)) if inR1(sfx.length) =>
        if (sfx == "ative") {
          if (inR2(sfx.length)) w = w.dropRight(sfx.length)
        } else w = w.dropRight(sfx.length) + rep
      case _ => ()
    }

    // ---- step 4 (R2); ion only after s/t
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some(sfx) if inR2(sfx.length) =>
        if (sfx == "ion") {
          if (w.length > 3) {
            val p = w.charAt(w.length - 4)
            if (p == 's' || p == 't') w = w.dropRight(3)
          }
        } else w = w.dropRight(sfx.length)
      case _ => ()
    }

    // ---- step 5
    if (w.endsWith("e")) {
      if (inR2(1)) w = w.dropRight(1)
      else if (inR1(1) && !endsInShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length >= 2 && w.charAt(w.length - 2) == 'l')
        w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
