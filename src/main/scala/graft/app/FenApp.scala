package graft.app

import graft.ingest.PgnParser
import graft.chess.Chess

/** CLI: print one FEN per half-move of a PGN file -- parity with
  * `chessmate fen <pgn>` (reference bin/main.ml:143-153,
  * lib/cli/pgn_to_fen_command.ml).
  *
  *   runMain graft.app.FenApp <pgnFile>
  */
object FenApp {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: FenApp <pgnFile>")
    val text = scala.io.Source.fromFile(args(0), "UTF-8").mkString
    PgnParser.parse(text) match {
      case Left(err) =>
        System.err.println(s"error: $err"); sys.exit(1)
      case Right(game) =>
        Chess.fensOfMoves(game.moves.map(_.san)) match {
          case Left(err) =>
            System.err.println(s"error: $err"); sys.exit(1)
          case Right(fens) =>
            game.moves.zip(fens).foreach { case (m, fen) =>
              println(f"${m.ply}%3d ${m.san}%-8s $fen")
            }
        }
    }
  }
}
