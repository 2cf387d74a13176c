package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.chess.{Chess, Fen}
import graft.ingest.PgnParser

/** Property tests for the chess core (SURVEY §5 test plan item 4 -- an
  * improvement the reference lacks). Native ScalaCheck Properties (runs
  * under sbt's ScalaCheck framework).
  */
object ChessPropertySpec extends Properties("chess-core") {

  // A pool of known-legal opening lines to build random replay prefixes.
  private val lines: Seq[Vector[String]] = Seq(
    Vector("e4", "e5", "Nf3", "Nc6", "Bb5", "a6", "Ba4", "Nf6", "O-O",
      "Be7", "Re1", "b5", "Bb3", "d6", "c3", "O-O", "h3", "Na5"),
    Vector("d4", "Nf6", "c4", "e6", "Nf3", "d5", "Nc3", "Be7", "Bg5",
      "h6", "Bh4", "O-O", "e3", "b6", "Be2", "Bb7", "Bxf6", "Bxf6"),
    Vector("e4", "c5", "Nf3", "d6", "d4", "cxd4", "Nxd4", "Nf6", "Nc3",
      "a6", "Be2", "e5", "Nb3", "Be7", "O-O", "O-O", "Be3", "Be6"),
    Vector("c4", "e5", "Nc3", "Nf6", "Nf3", "Nc6", "g3", "d5", "cxd5",
      "Nxd5", "Bg2", "Nb6", "O-O", "Be7", "d3", "O-O", "a3", "Be6"))

  private val genPrefix: Gen[Vector[String]] = for {
    line <- Gen.oneOf(lines)
    n <- Gen.choose(1, line.length)
  } yield line.take(n)

  property("legal-line prefixes replay to valid, normalized FENs") =
    Prop.forAll(genPrefix) { moves =>
      Chess.fensOfMoves(moves) match {
        case Left(_) => false
        case Right(fens) =>
          fens.length == moves.length &&
            fens.forall(f => Fen.isValid(f) && Fen.normalize(f) == Right(f)) &&
            fens.zipWithIndex.forall { case (f, i) =>
              f.split(" ")(1) == (if (i % 2 == 0) "b" else "w")
            }
      }
    }

  property("md5 content addresses are distinct per distinct FEN") = {
    val all = lines.flatMap(l => Chess.fensOfMoves(l).toOption.get)
    Prop(all.map(Fen.hash).distinct.length == all.distinct.length)
  }

  private val genComment: Gen[(String, String)] = for {
    pre <- Gen.alphaNumStr
    comment <- Gen.alphaNumStr
    post <- Gen.alphaNumStr
    style <- Gen.oneOf(0, 1, 2)
  } yield style match {
    case 0 => (s"$pre{$comment}$post", pre + post)
    case 1 => (s"$pre($comment)$post", pre + post)
    case _ => (s"$pre;$comment\n$post", pre + "\n" + post)
  }

  property("stripComments removes brace/paren/semicolon regions") =
    Prop.forAll(genComment) { case (in, expected) =>
      PgnParser.stripComments(in) == expected
    }

  private val genKV: Gen[(String, String)] = for {
    key <- Gen.identifier.suchThat(_.nonEmpty)
    value <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', '.', ',', '-'))).map(_.mkString.trim)
  } yield (key, value)

  property("header line round-trips printable values") =
    Prop.forAll(genKV) { case (k, v) =>
      PgnParser.parseHeaderLine(s"""[$k "$v"]""") == Right((k, v))
    }
}
