package graft.query

import graft.chess.Openings

/** Deterministic NL question -> filter/keyword/limit plan
  * (reference: /root/reference/lib/query/query_intent.ml). Driver-side, pure.
  */
object QueryIntent {

  final case class RatingFilter(whiteMin: Option[Int], blackMin: Option[Int],
      maxRatingDelta: Option[Int])
  object RatingFilter { val empty: RatingFilter = RatingFilter(None, None, None) }

  final case class MetadataFilter(field: String, value: String)
  final case class Request(text: String, limit: Option[Int] = None,
      offset: Option[Int] = None)
  final case class Plan(original: Request, cleanedText: String,
      keywords: List[String], filters: List[MetadataFilter],
      rating: RatingFilter, limit: Int, offset: Int)

  val defaultLimit = 50
  val maxLimit = 500
  val defaultOffset = 0
  /** Driver-safety bound for the executor's exact-total fast path, NOT a
    * clamp on the plan: the reference (query_intent.ml) only enforces
    * offset >= 0, so analyse preserves any requested offset. Plans whose
    * offset+limit exceed maxOffset+maxLimit (~5.5k small rows, the most
    * the fast path may collect to the driver) take HybridExecutor's lazy
    * two-action page instead of being silently truncated to page 5000.
    */
  val maxOffset = 5000

  private val stopwords: Set[String] = Set(
    "a", "an", "and", "any", "attack", "at", "be", "between", "by", "can",
    "find", "for", "games", "game", "give", "how", "i", "in", "is", "list",
    "me", "more", "of", "on", "over", "please", "points", "return", "show",
    "than", "that", "the", "those", "to", "with", "would", "where", "which",
    "about", "looking", "need", "who", "wins", "win", "players", "player",
    "rated", "rating", "elo", "lower", "higher", "least", "most", "top",
    "best", "favourite", "favorite")

  @inline private def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
  @inline private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Lowercase; apostrophes dropped; all other non-alnum -> ' '; trimmed. */
  def normalize(text: String): String = {
    val sb = new StringBuilder(text.length)
    text.foreach { raw =>
      val c = asciiLower(raw)
      if (isAsciiAlnum(c)) sb.append(c)
      else if (c != '\'') sb.append(' ')
    }
    sb.toString.trim
  }

  def tokenize(text: String): List[String] =
    text.split(" ").filter(_.nonEmpty).toList

  private val numberWords: Map[String, Int] = Map(
    "one" -> 1, "two" -> 2, "three" -> 3, "four" -> 4, "five" -> 5,
    "six" -> 6, "seven" -> 7, "eight" -> 8, "nine" -> 9, "ten" -> 10,
    "eleven" -> 11, "twelve" -> 12, "thirteen" -> 13, "fourteen" -> 14,
    "fifteen" -> 15, "sixteen" -> 16, "seventeen" -> 17, "eighteen" -> 18,
    "nineteen" -> 19, "twenty" -> 20, "thirty" -> 30, "forty" -> 40,
    "fifty" -> 50, "hundred" -> 100)

  def intOfToken(token: String): Option[Int] =
    if (token.isEmpty) None
    else if (token.forall(_.isDigit))
      scala.util.Try(token.toInt).toOption
    else numberWords.get(token)

  private val limitQualifiers =
    Set("top", "first", "show", "list", "give", "find", "return")

  /** A number 1..50 is a limit when preceded by a qualifier word or followed
    * by game(s).
    */
  def limitFromTokens(tokens: List[String]): Option[Int] = {
    @annotation.tailrec
    def loop(ts: List[String], prev: Option[String]): Option[Int] = ts match {
      case Nil => None
      case token :: rest =>
        val next = rest.headOption
        intOfToken(token) match {
          case Some(v) if v > 0 && v <= 50 =>
            val qualifies = prev.exists(limitQualifiers.contains) ||
              next.exists(n => n == "games" || n == "game")
            if (qualifies) Some(v) else loop(rest, Some(token))
          case _ => loop(rest, Some(token))
        }
    }
    loop(tokens, None)
  }

  def dedupFilters(filters: List[MetadataFilter]): List[MetadataFilter] =
    filters.sortBy(f => (f.field, f.value)).distinct

  private val phraseFilters: List[(List[String], MetadataFilter)] = List(
    (List("endgame", "end game"), MetadataFilter("phase", "endgame")),
    (List("middle game", "middlegame"), MetadataFilter("phase", "middlegame")),
    (List("queenside majority", "queenside pawn majority"),
      MetadataFilter("theme", "queenside_majority")),
    (List("sacrifice", "sacrifices"), MetadataFilter("theme", "sacrifice")),
    (List("tactical", "tactics"), MetadataFilter("theme", "tactics")),
    (List("attacking the king", "king attack"),
      MetadataFilter("theme", "king_attack")))

  def metadataFromPhrases(cleaned: String): List[MetadataFilter] = {
    val manual = phraseFilters.collect {
      case (variants, f) if variants.exists(cleaned.contains) => f
    }
    val openings = Openings.filtersForText(cleaned)
      .map { case (field, value) => MetadataFilter(field, value) }
    dedupFilters(manual ++ openings)
  }

  def resultFilters(cleaned: String): List[MetadataFilter] = {
    val out = List.newBuilder[MetadataFilter]
    if (cleaned.contains("white win") || cleaned.contains("white victory"))
      out += MetadataFilter("result", "1-0")
    if (cleaned.contains("black win") || cleaned.contains("black victory"))
      out += MetadataFilter("result", "0-1")
    if (cleaned.contains("draw") || cleaned.contains("drawn"))
      out += MetadataFilter("result", "1/2-1/2")
    dedupFilters(out.result())
  }

  def extractKeywords(tokens: List[String]): List[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    tokens.foreach { t =>
      if (!stopwords.contains(t) && t.length > 2) seen += t
    }
    seen.toList
  }

  private val differenceWords =
    Set("lower", "less", "higher", "greater", "more", "fewer")
  private val minContextWords =
    Set("least", "minimum", "min", "over", "above", "atleast", "at_least", ">=")
  private val relevantContext =
    Set("points", "elo", "rating", "ratings", "rated")

  /** Stateful token scan for white/black rating minimums and max delta
    * (query_intent.ml:240-354).
    */
  def parseRating(tokens: List[String]): RatingFilter = {
    var rating = RatingFilter.empty
    var currentColor: Option[Boolean] = None // Some(true)=white
    var pendingNumber: Option[Int] = None
    var previousTokens: List[String] = Nil
    var rest = tokens
    while (rest.nonEmpty) {
      val token = rest.head
      rest = rest.tail
      val color =
        if (token == "white") Some(true)
        else if (token == "black") Some(false)
        else currentColor
      intOfToken(token) match {
        case Some(value) =>
          val diffContext = rest.take(3).exists(differenceWords.contains)
          val minContext = previousTokens.exists(minContextWords.contains)
          if (!diffContext && minContext) {
            color match {
              case Some(true) =>
                rating = rating.copy(whiteMin =
                  Some(rating.whiteMin.fold(value)(math.max(_, value))))
              case Some(false) =>
                rating = rating.copy(blackMin =
                  Some(rating.blackMin.fold(value)(math.max(_, value))))
              case None => ()
            }
          }
          pendingNumber = Some(value)
        case None =>
          if ((token == "lower" || token == "less") && pendingNumber.isDefined)
            rating = rating.copy(maxRatingDelta = pendingNumber)
          if (!relevantContext.contains(token)) pendingNumber = None
      }
      currentColor = color
      previousTokens = token :: previousTokens.take(4)
    }
    rating
  }

  def analyse(request: Request): Plan = {
    val cleaned = normalize(request.text)
    val tokens = tokenize(cleaned)
    val naturalLimit = limitFromTokens(tokens)
    def clamp(v: Int): Int = math.max(1, math.min(maxLimit, v))
    val limit = request.limit.map(clamp)
      .orElse(naturalLimit.map(clamp))
      .getOrElse(defaultLimit)
    val offset = math.max(0, request.offset.getOrElse(defaultOffset))
    val filters = dedupFilters(metadataFromPhrases(cleaned) ++ resultFilters(cleaned))
    val keywords = extractKeywords(tokens)
    val rating = parseRating(tokens)
    Plan(request, cleaned, keywords, filters, rating, limit, offset)
  }
}
