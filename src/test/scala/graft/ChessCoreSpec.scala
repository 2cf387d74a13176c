package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.chess.{Chess, Fen, Openings}
import graft.ingest.{GameMetadata, PgnParser}
import graft.query.QueryIntent

/** Golden tests ported from the reference suite
  * (/root/reference/test/test_chess_parsing.ml, test_fen.ml, test_query.ml).
  */
class ChessCoreSpec extends AnyFunSuite {

  def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  def fensOfString(pgn: String): Either[String, Vector[String]] =
    PgnParser.parse(pgn).flatMap(g => Chess.fensOfMoves(g.moves.map(_.san)))

  test("parse sample game") {
    val parsed = PgnParser.parse(fixture("sample_game.pgn")).toOption.get
    assert(parsed.headers.length == 6)
    assert(parsed.plyCount == 6)
    assert(parsed.header("White").contains("Sample White"))
    assert(parsed.header("Black").contains("Sample Black"))
    assert(parsed.header("Result").contains("1-0"))
    assert(parsed.moves.head.san == "e4")
    assert(parsed.moves.head.turn == 1)
    assert(parsed.moves.last.san == "a6")
    assert(parsed.moves.last.ply == 6)
    val whiteMove3 = parsed.moves.find(m => m.turn == 3 && m.ply % 2 == 1)
    assert(whiteMove3.map(_.san).contains("Bb5"))
    val blackMove3 = parsed.moves.find(m => m.turn == 3 && m.ply % 2 == 0)
    assert(blackMove3.map(_.san).contains("a6"))
  }

  test("parse invalid (headers + * only)") {
    assert(PgnParser.parse("[Event \"Test\"]\n\n*").isLeft)
  }

  test("illegal castle rejected") {
    val pgn = "[Event \"Illegal castle\"]\n[Result \"*\"]\n\n1. O-O *"
    val r = fensOfString(pgn)
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("cannot castle"))
  }

  test("illegal capture rejected") {
    val pgn = "[Event \"Illegal capture\"]\n[Result \"*\"]\n\n1. exd5 *"
    val r = fensOfString(pgn)
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("expected capture on d5"))
  }

  test("parse extended sample game") {
    val parsed = PgnParser.parse(fixture("extended_sample_game.pgn")).toOption.get
    assert(parsed.header("Event").contains("Interpolis International Tournament"))
    assert(parsed.header("Site").contains("Tilburg NED"))
    assert(parsed.header("Round").contains("1.1"))
    assert(parsed.header("White").contains("Seirawan, Y"))
    assert(parsed.header("Black").contains("Smyslov, V"))
    assert(parsed.header("WhiteElo").contains("2568"))
    assert(parsed.header("BlackElo").contains("2690"))
    assert(parsed.header("Result").contains("0-1"))
    assert(parsed.header("EventDate").contains("1994.09.10"))
    assert(parsed.moves.length == 77)
    assert(parsed.moves.last.san == "Ke2")
    assert(parsed.moves.last.ply == 77)
    assert(!parsed.moves.exists(_.san == "Kd6"), "variation move must be stripped")
    assert(parsed.header("TEST_TAG_1").contains("VALUE_TEST_TAG_1"))
  }

  test("annotated game: comments/NAGs/variations stripped, suffixes kept") {
    val parsed = PgnParser.parse(fixture("annotated_game.pgn")).toOption.get
    assert(parsed.moves.length == 16)
    assert(parsed.moves.head.san == "e4!!")
    val fens = fensOfString(fixture("annotated_game.pgn")).toOption.get
    assert(fens.length == 16)
    assert(fens.head == "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq e3 0 1")
  }

  test("extended game golden FEN prefix") {
    val fens = fensOfString(fixture("extended_sample_game.pgn")).toOption.get
    assert(fens.length == 77)
    assert(fens.take(3) == Vector(
      "rnbqkbnr/pppppppp/8/8/3P4/8/PPP1PPPP/RNBQKBNR b KQkq d3 0 1",
      "rnbqkb1r/pppppppp/5n2/8/3P4/8/PPP1PPPP/RNBQKBNR w KQkq - 1 2",
      "rnbqkb1r/pppppppp/5n2/8/2PP4/8/PP2PPPP/RNBQKBNR b KQkq c3 0 2"))
    // FEN after White's move 39 (ply index (39-1)*2)
    assert(fens((39 - 1) * 2) == "8/p1kb1R2/1p3p2/2p5/2P1P1p1/PP2Pr2/4K3/8 b - - 2 39")
  }

  test("metadata extraction") {
    val meta = GameMetadata.ofHeaders(List(
      "Event" -> "Championship", "Site" -> "Paris", "Date" -> "2024.??.12",
      "Round" -> "3", "White" -> "Carlsen", "Black" -> "Nepomniachtchi",
      "WhiteElo" -> "2855", "Result" -> "1-0", "ECO" -> "B33"))
    assert(meta.event.contains("Championship"))
    assert(meta.site.contains("Paris"))
    assert(meta.date.contains("2024-01-12"))
    assert(meta.ecoCode.contains("B33"))
    assert(meta.openingName.contains("Sicilian Defense"))
    assert(meta.openingSlug.contains("sicilian_defense"))
    assert(meta.white.name == "Carlsen")
    assert(meta.white.rating.contains(2855))
    assert(meta.black.name == "Nepomniachtchi")
  }

  test("multi-game split preserves order and raw text") {
    val multi =
      """[Event "Game One"]
        |[Result "1-0"]
        |
        |1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6 5. O-O Be7 1-0
        |
        |[Event "Game Two"]
        |[Result "0-1"]
        |
        |1. d4 d5 2. c4 e6 3. Nc3 Nf6 4. Bg5 Be7 0-1
        |""".stripMargin
    val slots = PgnParser.splitGames(multi)
    assert(slots.length == 2)
    assert(slots(0).index == 1 && slots(1).index == 2)
    assert(slots(0).raw.contains("[Event \"Game One\"]"))
    assert(slots(1).raw.contains("[Event \"Game Two\"]"))
    assert(slots(0).parsed.toOption.get.header("Result").contains("1-0"))
    assert(slots(1).parsed.toOption.get.header("Result").contains("0-1"))
  }

  test("malformed TWIC excerpt reported per game, not thrown") {
    val malformed =
      """[Event "Valid"]
        |[Result "1-0"]
        |
        |1. e4 e5 2. Nf3 Nc6 3. Bb5 a6 4. Ba4 Nf6 5. O-O Be7 1-0
        |
        |[Event "Broken
        |This is editorial commentary without proper PGN formatting.
        |""".stripMargin
    val slots = PgnParser.splitGames(malformed)
    assert(slots.length == 2)
    assert(slots(0).parsed.isRight)
    assert(slots(1).parsed.isLeft)
    assert(slots(1).index == 2)
    assert(slots(1).raw.contains("editorial commentary"))
  }

  test("FEN normalize/validate") {
    val start = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
    assert(Fen.normalize(start) == Right(start))
    assert(Fen.normalize("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w qkQK - 0 1")
      .contains(start))
    assert(Fen.normalize("bad fen").isLeft)
    assert(Fen.normalize("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkqK - 0 1").isLeft)
    assert(Fen.normalize("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq e6 0 1")
      .contains("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq e6 0 1"))
    assert(Fen.normalize("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq e3 0 1").isLeft)
    assert(Fen.normalize("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR b KQkq e3 0 1").isRight)
    // md5 content hash
    assert(Fen.hash("abc") == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("openings catalog lookups") {
    assert(Openings.canonicalNameOfEco("B33").contains("Sicilian Defense"))
    assert(Openings.slugOfEco("E94").contains("kings_indian_defense"))
    assert(Openings.canonicalNameOfEco("Z99").isEmpty)
    assert(Openings.slugify("King's Indian Defense") == "kings_indian_defense")
    assert(Openings.filtersForText("find kings indian games") ==
      List(("eco_range", "E60-E99"), ("opening", "kings_indian_defense")))
  }

  test("planner golden: kings indian rating query") {
    val plan = QueryIntent.analyse(QueryIntent.Request(
      "Find top 3 King's Indian games where white is rated at least 2500 and black is 100 points lower"))
    assert(plan.limit == 3)
    assert(plan.rating.whiteMin.contains(2500))
    assert(plan.rating.blackMin.isEmpty)
    assert(plan.rating.maxRatingDelta.contains(100))
    assert(plan.filters.contains(QueryIntent.MetadataFilter("opening", "kings_indian_defense")))
    assert(plan.filters.contains(QueryIntent.MetadataFilter("eco_range", "E60-E99")))
    assert(plan.keywords.contains("indian"))
  }

  test("planner golden: french defense draw endgame") {
    val plan = QueryIntent.analyse(QueryIntent.Request(
      "Show me five games that end in a draw in the French Defense endgame"))
    assert(plan.limit == 5)
    assert(plan.filters.contains(QueryIntent.MetadataFilter("opening", "french_defense")))
    assert(plan.filters.contains(QueryIntent.MetadataFilter("eco_range", "C00-C19")))
    assert(plan.filters.contains(QueryIntent.MetadataFilter("phase", "endgame")))
    assert(plan.filters.contains(QueryIntent.MetadataFilter("result", "1/2-1/2")))
  }

  test("planner defaults and clamping") {
    // "5" is preceded by "me" (not a qualifier) and followed by "random"
    // (not "games") so no natural limit is inferred — reference semantics.
    val p1 = QueryIntent.analyse(QueryIntent.Request("Show me 5 random games"))
    assert(p1.limit == 50)
    assert(p1.filters.isEmpty)
    val p1b = QueryIntent.analyse(QueryIntent.Request("show 5 games in the french"))
    assert(p1b.limit == 5)
    val p2 = QueryIntent.analyse(QueryIntent.Request("anything at all"))
    assert(p2.limit == 50 && p2.offset == 0)
    val p3 = QueryIntent.analyse(QueryIntent.Request("x", limit = Some(9999), offset = Some(-5)))
    assert(p3.limit == 500 && p3.offset == 0)
  }

  test("en passant capture and promotion") {
    // e4/a6/e5/d5 then exd6 e.p.; FEN sets ep target after every double push
    val fens = Chess.fensOfMoves(Seq("e4", "a6", "e5", "d5", "exd6")).toOption.get
    assert(fens(3).endsWith("b KQkq d6 0 3") || fens(3).contains(" d6 "))
    assert(fens(4).startsWith("rnbqkbnr/1pp1pppp/p2P4/8/8/8/PPPP1PPP/RNBQKBNR"))
    val promo = Chess.fensOfMoves(Seq(
      "h4", "g5", "hxg5", "h6", "gxh6", "a6", "h7", "a5", "hxg8=Q")).toOption.get
    assert(promo.last.startsWith("rnbqkbQr/"))
    // promotion without '=' piece must fail
    assert(Chess.fensOfMoves(Seq(
      "h4", "g5", "hxg5", "h6", "gxh6", "a6", "h7", "a5", "hxg8")).isLeft)
  }

  test("castling rights update on rook moves and captures") {
    val fens = Chess.fensOfMoves(Seq("a4", "h5", "Ra3", "Rh6")).toOption.get
    assert(fens(2).contains(" Kkq "))
    assert(fens(3).contains(" Kq "))
  }
}
