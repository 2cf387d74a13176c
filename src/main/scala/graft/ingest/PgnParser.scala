package graft.ingest

/** PGN text -> structured games (reference: /root/reference/lib/chess/pgn_parser.ml).
  *
  * Pure Scala, no Spark deps: designed to run inside a flatMap over whole
  * PGN dumps so a 100 TB corpus splits into games in parallel. Malformed
  * games are reported as Left values, never thrown — error-channel parity
  * with the reference's `fold_games ~on_error` (pgn_parser.ml:204-260).
  */
object PgnParser {

  final case class Move(san: String, turn: Int, ply: Int)
  final case class ParsedGame(headers: List[(String, String)], moves: List[Move]) {
    def header(key: String): Option[String] =
      headers.collectFirst { case (k, v) if k == key => v }
    def plyCount: Int = moves.length
  }

  /** A game's slot in a multi-game dump: 1-based index, raw text, parse result. */
  final case class GameSlot(index: Int, raw: String, parsed: Either[String, ParsedGame])

  private val resultTokens = Set("1-0", "0-1", "1/2-1/2", "*")

  /** Remove {...} and (...) blocks, ';' line comments, and '%' escape lines
    * (the '%' form only at line start). Single-level state machine — matches
    * the reference exactly (no nesting of parens).
    */
  def stripComments(text: String): String = {
    val sb = new StringBuilder(text.length)
    var state = 0 // 0 normal, 1 brace, 2 paren, 3 line comment, 4 percent line
    var i = 0
    while (i < text.length) {
      val c = text(i)
      state match {
        case 0 =>
          if (c == '{') state = 1
          else if (c == '(') state = 2
          else if (c == ';') state = 3
          else if (c == '%' && (i == 0 || text(i - 1) == '\n')) state = 4
          else sb.append(c)
        case 1 => if (c == '}') state = 0
        case 2 => if (c == ')') state = 0
        case 3 => if (c == '\n') { sb.append(c); state = 0 }
        case 4 => if (c == '\n') { sb.append(c); state = 0 }
      }
      i += 1
    }
    sb.toString
  }

  def parseHeaderLine(line: String): Either[String, (String, String)] =
    if (!line.startsWith("[")) Left(s"Invalid PGN header line: $line")
    else {
      val rest = line.substring(1)
      if (!rest.endsWith("]")) Left(s"Invalid PGN header line: $line")
      else {
        val inner = rest.substring(0, rest.length - 1).trim
        val sp = inner.indexOf(' ')
        val (key, valueRaw) =
          if (sp < 0) (inner, "") else (inner.substring(0, sp), inner.substring(sp + 1).trim)
        if (key.isEmpty) Left(s"Invalid PGN header line: $line")
        else {
          val value =
            if (valueRaw.length >= 2 && valueRaw.head == '"' && valueRaw.last == '"')
              valueRaw.substring(1, valueRaw.length - 1)
            else valueRaw
          Right((key, value))
        }
      }
    }

  /** Tokenize move text into SAN moves with turn/ply numbering. Drops NAGs
    * (`$n`), move numbers, dots, and stops at the first result token.
    * SAN suffixes (`!!`, `+`) are preserved here (stripped by the replay
    * engine) — parity with pgn_parser.ml:122-187.
    */
  def parseMoves(moveLines: List[String]): Either[String, List[Move]] = {
    val rawText = moveLines.map(_.trim).filter(_.nonEmpty).mkString(" ")
    if (rawText.isEmpty) return Left("No moves found in PGN body")
    val tokens = rawText.split("[ \t\r\n]+").filter(_.trim.nonEmpty)
    val acc = List.newBuilder[Move]
    var currentTurn = 0
    var ply = 0
    var i = 0
    while (i < tokens.length) {
      val token = tokens(i).trim
      i += 1
      if (token.nonEmpty && !token.startsWith("$")) {
        if (resultTokens.contains(token)) return Right(acc.result())
        var digitCount = 0
        while (digitCount < token.length && token(digitCount).isDigit) digitCount += 1
        var newTurn = currentTurn
        var body = token
        if (digitCount > 0) {
          try {
            newTurn = token.substring(0, digitCount).toInt
            body = token.substring(digitCount).dropWhile(_ == '.').trim
          } catch { case _: NumberFormatException => () }
        }
        body = body.dropWhile(_ == '.').trim
        if (body.isEmpty) {
          if (newTurn > 0) currentTurn = newTurn
        } else {
          ply += 1
          val effectiveTurn = if (newTurn > 0) newTurn else (ply + 1) / 2
          acc += Move(body, effectiveTurn, ply)
          currentTurn = if (ply % 2 == 0) effectiveTurn + 1 else effectiveTurn
        }
      }
    }
    Right(acc.result())
  }

  /** Parse one game's PGN text. */
  def parse(rawPgn: String): Either[String, ParsedGame] = {
    val sanitized = stripComments(rawPgn)
    val lines = sanitized.split("\n", -1).toList
    // headers: leading '['-prefixed lines (blank lines skipped); first other
    // non-empty line starts the move text.
    var headers = List.newBuilder[(String, String)]
    var remaining = lines
    var moveLines: List[String] = Nil
    var done = false
    while (!done) remaining match {
      case Nil => done = true
      case line :: rest =>
        val trimmed = line.trim
        if (trimmed.isEmpty) remaining = rest
        else if (trimmed.startsWith("[")) {
          parseHeaderLine(trimmed) match {
            case Left(err) => return Left(err)
            case Right(h) => headers += h; remaining = rest
          }
        } else { moveLines = trimmed :: rest; done = true }
    }
    parseMoves(moveLines).flatMap { moves =>
      if (moves.isEmpty) Left("PGN contained no moves")
      else Right(ParsedGame(headers.result(), moves))
    }
  }

  /** True when any line is move text under [[splitGames]]' rule: nonempty
    * after trim and not a header ('['), escape ('%'), or comment (';')
    * line. The splittable reader uses this to replicate the haveMoves
    * merge rule across coarse record boundaries.
    */
  def hasMoveText(raw: String): Boolean =
    raw.linesIterator.exists { line =>
      val t = line.trim
      t.nonEmpty && !t.startsWith("[") && !t.startsWith("%") &&
        !t.startsWith(";")
    }

  /** Split a multi-game dump on `[Event` headers that follow a move section,
    * parsing each game independently. Never throws: each slot carries its
    * own parse result, so bad games become data-quality rows downstream.
    */
  def splitGames(raw: String): Vector[GameSlot] =
    splitRaws(raw).zipWithIndex.map { case (g, i) =>
      GameSlot(i + 1, g, parse(g))
    }

  /** The split state machine alone — raw per-game strings in order,
    * NO parsing. The splittable reader's two passes use this (each game
    * would otherwise be header/move-parsed three times: once per pass's
    * split and once in processGame).
    */
  def splitRaws(raw: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var collected = List.empty[String] // reversed lines of current game
    var haveMoves = false
    def finalize(): Unit = {
      if (collected.nonEmpty) {
        val rawGame = collected.reverse.mkString("\n").trim
        if (rawGame.nonEmpty) out += rawGame
      }
    }
    raw.split("\n", -1).foreach { line =>
      val trimmed = line.trim
      val isHeader = trimmed.startsWith("[")
      val isEvent = trimmed.startsWith("[Event")
      // '%' escape lines and ';' comment lines are not move text (PGN
      // import format) -- without this a leading '%' banner would split
      // into a phantom moveless game.
      val hasMoveToken = !isHeader && trimmed.nonEmpty &&
        !trimmed.startsWith("%") && !trimmed.startsWith(";")
      if (isEvent && haveMoves && collected.nonEmpty) {
        finalize()
        collected = List(line)
        haveMoves = false
      } else {
        collected = line :: collected
        haveMoves = haveMoves || hasMoveToken
      }
    }
    finalize()
    out.result()
  }

  /** [[splitRaws]] variant for the splittable reader: runs the same state
    * machine but does NOT finalize a trailing moveless block — it is
    * returned as the second element, UNTRIMMED (byte-exact suffix of the
    * input), so the caller can carry it into the next chunk/split. Every
    * slot in the first element is guaranteed to contain move text (the
    * machine only closes a block on an `[Event` line seen after moves).
    *
    * Relationship (property-tested): `splitRaws(raw)` equals
    * `closed :+ tail.trim` when the trimmed tail is nonempty, else
    * `closed`.
    *
    * Why this exists: a line like `[EventDate "…"]` AFTER move text
    * starts a new (moveless) block here — the wholetext splitter merges
    * it FORWARD into the next game — but the Hadoop delimiter
    * `"\n[Event "` (with the space) does not break on it, so the
    * splittable reader sees it inside a movesful chunk. Flushing it as
    * its own closed slot would shift every later game_index and break
    * the byte-identical game_id contract.
    */
  def splitRawsWithTail(raw: String): (Vector[String], String) = {
    val out = Vector.newBuilder[String]
    var collected = List.empty[String]
    var haveMoves = false
    def finalizeSlot(): Unit = {
      if (collected.nonEmpty) {
        val rawGame = collected.reverse.mkString("\n").trim
        if (rawGame.nonEmpty) out += rawGame
      }
    }
    raw.split("\n", -1).foreach { line =>
      val trimmed = line.trim
      val isHeader = trimmed.startsWith("[")
      val isEvent = trimmed.startsWith("[Event")
      val hasMoveToken = !isHeader && trimmed.nonEmpty &&
        !trimmed.startsWith("%") && !trimmed.startsWith(";")
      if (isEvent && haveMoves && collected.nonEmpty) {
        finalizeSlot()
        collected = List(line)
        haveMoves = false
      } else {
        collected = line :: collected
        haveMoves = haveMoves || hasMoveToken
      }
    }
    if (haveMoves) { finalizeSlot(); (out.result(), "") }
    else (out.result(), collected.reverse.mkString("\n"))
  }

  def parseGames(raw: String): Either[String, List[ParsedGame]] = {
    val slots = splitGames(raw)
    val out = List.newBuilder[ParsedGame]
    slots.foreach { slot =>
      slot.parsed match {
        case Left(err) => return Left(s"PGN game #${slot.index}: $err")
        case Right(g) => out += g
      }
    }
    Right(out.result())
  }
}
