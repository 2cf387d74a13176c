package graft.chess

/** Static ECO-range opening catalog (reference: /root/reference/lib/chess/openings.ml).
  *
  * 14 ECO ranges with canonical names, slugs, and lowercase synonyms; powers
  * (a) ECO -> opening name/slug projection at ingest and (b) NL query text ->
  * opening/eco_range filters. All string handling is ASCII-byte oriented to
  * match the reference (non-ASCII bytes are treated as non-alphanumeric).
  */
object Openings {

  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  @inline private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Lowercase, drop apostrophes, collapse non-alnum runs to single '_'. */
  def slugify(name: String): String = {
    val sb = new StringBuilder(name.length)
    var pendingSep = false
    name.foreach { raw =>
      val c = asciiLower(raw)
      if (isAsciiAlnum(c)) {
        if (pendingSep && sb.nonEmpty) sb.append('_')
        sb.append(c)
        pendingSep = false
      } else if (c != '\'') pendingSep = true
    }
    sb.toString
  }

  /** Lowercase, keep alnum, whitespace -> ' ', drop everything else, trim. */
  def sanitizePhrase(phrase: String): String = {
    val sb = new StringBuilder(phrase.length)
    phrase.foreach { raw =>
      val c = asciiLower(raw)
      if (isAsciiAlnum(c)) sb.append(c)
      else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') sb.append(' ')
    }
    sb.toString.trim
  }

  final case class Entry(ecoStart: String, ecoEnd: String, canonical: String,
      slug: String, synonyms: List[String])

  private def entry(start: String, end: String, canonical: String,
      synonyms: List[String]): Entry =
    Entry(start.trim.toUpperCase, end.trim.toUpperCase, canonical,
      slugify(canonical),
      synonyms.map(sanitizePhrase).filter(_.nonEmpty))

  val all: List[Entry] = List(
    entry("A00", "A39", "White first moves other than 1.e4, 1.d4",
      List("White first moves other than 1.e4, 1.d4")),
    entry("A40", "A44",
      "1.d4 without 1...d5, 1...Nf6 or 1...f5: Atypical replies to 1.d4",
      List("1.d4 without 1...d5, 1...Nf6 or 1...f5: Atypical replies to 1.d4")),
    entry("A45", "A49", "1.d4 Nf6 without 2.c4: Atypical replies to 1...Nf6",
      List("1.d4 Nf6 without 2.c4: Atypical replies to 1...Nf6")),
    entry("A50", "A79",
      "1.d4 Nf6 2.c4 without 2...e6 or 2...g6: Atypical Indian systems",
      List("1.d4 Nf6 2.c4 without 2...e6 or 2...g6: Atypical Indian systems")),
    entry("A80", "A99", "Dutch Defense",
      List("dutch defense", "dutch defence", "dutch")),
    entry("B00", "B09", "1.e4 without 1...c6, 1...c5, 1...e6, 1...e5",
      List("1.e4 without 1...c6, 1...c5, 1...e6, 1...e5")),
    entry("B10", "B19", "Caro-Kann Defense",
      List("caro kann", "caro-kann", "carokann")),
    entry("B20", "B99", "Sicilian Defense",
      List("sicilian", "sicilian defence", "sicilian defense",
        "sicilian najdorf", "najdorf")),
    entry("C00", "C19", "French Defense",
      List("french defense", "french defence", "french")),
    entry("C20", "C99", "1.e4 e5: Double King Pawn games",
      List("1.e4 e5: Double King Pawn games")),
    entry("D00", "D69", "1.d4 d5: Double Queen Pawn games",
      List("1.d4 d5: Double Queen Pawn games")),
    entry("D70", "D99", "Grunfeld Defense",
      List("grunfeld", "gruenfeld defense", "grunfeld defence")),
    entry("E00", "E59", "1.d4 Nf6 2.c4 e6: Indian systems with ...e6",
      List("1.d4 Nf6 2.c4 e6: Indian systems with ...e6")),
    entry("E60", "E99", "King's Indian Defense",
      List("king's indian", "kings indian", "kings indian defense",
        "kings indian defence")),
  )

  private def normalizeEco(eco: String): String = eco.trim.toUpperCase

  private def inRange(eco: String, e: Entry): Boolean =
    eco.compareTo(e.ecoStart) >= 0 && eco.compareTo(e.ecoEnd) <= 0

  def canonicalNameOfEco(eco: String): Option[String] = {
    val n = normalizeEco(eco)
    all.collectFirst { case e if inRange(n, e) => e.canonical }
  }

  def slugOfEco(eco: String): Option[String] = {
    val n = normalizeEco(eco)
    all.collectFirst { case e if inRange(n, e) => e.slug }
  }

  def ecoRangeString(e: Entry): String =
    if (e.ecoStart == e.ecoEnd) e.ecoStart else s"${e.ecoStart}-${e.ecoEnd}"

  /** NL text -> (field, value) filters: opening slug + eco_range per synonym
    * substring match, dedup-sorted by (field, value).
    */
  def filtersForText(text: String): List[(String, String)] = {
    val normalized = sanitizePhrase(text)
    all.filter(e => e.synonyms.exists(normalized.contains))
      .flatMap(e => List(("opening", e.slug), ("eco_range", ecoRangeString(e))))
      .distinct
      .sorted
  }
}
