package graft.chess

/** SAN -> FEN replay engine (pure Scala, no Spark deps).
  *
  * Semantics mirror the reference engine (/root/reference/lib/chess/pgn_to_fen.ml):
  * move resolution is *geometric* — path-clear sliding, no check/pin legality —
  * and errors (illegal castle, capture of empty square, ambiguous move) are
  * reported as Left values so malformed games become data-quality rows rather
  * than task failures. En-passant targets are emitted on every double pawn
  * push (pgn_to_fen.ml:645-649); halfmove clock resets on pawn moves and
  * captures only.
  */
object Chess {

  // Piece kinds. Board cells: 0 = empty, +kind = white, -kind = black.
  final val Pawn = 1
  final val Knight = 2
  final val Bishop = 3
  final val Rook = 4
  final val Queen = 5
  final val King = 6

  @inline def sq(file: Int, rank: Int): Int = rank * 8 + file
  @inline def fileOf(s: Int): Int = s % 8
  @inline def rankOf(s: Int): Int = s / 8
  @inline def onBoard(file: Int, rank: Int): Boolean =
    file >= 0 && file < 8 && rank >= 0 && rank < 8

  def squareName(s: Int): String =
    "" + ('a' + fileOf(s)).toChar + ('1' + rankOf(s)).toChar

  def kindName(kind: Int): String = kind match {
    case Pawn => "pawn"; case Knight => "knight"; case Bishop => "bishop"
    case Rook => "rook"; case Queen => "queen"; case King => "king"
    case _ => "piece"
  }

  /** Parsed SAN token (reference grammar, pgn_to_fen.ml:176-277). */
  sealed trait San
  case object CastleKingside extends San
  case object CastleQueenside extends San
  final case class PieceMove(kind: Int, disFile: Int, disRank: Int,
      capture: Boolean, dest: Int, promotion: Int) extends San // -1 = absent
  final case class PawnMove(fromFile: Int, capture: Boolean, dest: Int,
      promotion: Int) extends San

  private def isFileChar(c: Char) = c >= 'a' && c <= 'h'
  private def isRankChar(c: Char) = c >= '1' && c <= '8'

  private def promotionKind(c: Char): Int = c match {
    case 'N' => Knight; case 'B' => Bishop; case 'R' => Rook; case 'Q' => Queen
    case _ => -1
  }

  private def pieceKindOf(c: Char): Int = c match {
    case 'N' => Knight; case 'B' => Bishop; case 'R' => Rook
    case 'Q' => Queen; case 'K' => King
    case _ => 0
  }

  def stripSuffixes(token: String): String = {
    var end = token.length
    while (end > 0 && (token(end - 1) == '+' || token(end - 1) == '#' ||
      token(end - 1) == '!' || token(end - 1) == '?')) end -= 1
    token.substring(0, end)
  }

  def parseSan(token: String): Either[String, San] = {
    val tok = stripSuffixes(token)
    if (tok == "O-O" || tok == "0-0") Right(CastleKingside)
    else if (tok == "O-O-O" || tok == "0-0-0") Right(CastleQueenside)
    else {
      val eq = tok.indexOf('=')
      val (promotion, body) =
        if (eq >= 0) {
          if (eq + 1 >= tok.length) return Left(s"SAN $token: missing promotion piece")
          (promotionKind(tok(eq + 1)), tok.substring(0, eq))
        } else (-1, tok)
      if (body.length < 2) return Left(s"SAN $token: too short")
      val destStr = body.substring(body.length - 2)
      if (!isFileChar(destStr(0)) || !isRankChar(destStr(1)))
        return Left(s"SAN $token: invalid square $destStr")
      val dest = sq(destStr(0) - 'a', destStr(1) - '1')
      val first = body(0)
      if (first.toUpper == first && !isFileChar(first)) {
        val kind = pieceKindOf(first)
        if (kind == 0) return Left(s"SAN $token: invalid piece designator")
        val core = body.substring(1, body.length - 2)
        var disFile = -1; var disRank = -1
        core.foreach { c =>
          if (isFileChar(c)) disFile = c - 'a'
          else if (isRankChar(c)) disRank = c - '1'
        }
        val capture = tok.indexOf('x') >= 0
        Right(PieceMove(kind, disFile, disRank, capture, dest, promotion))
      } else {
        val capture = body.indexOf('x') >= 0
        val fromFile = if (capture) body(0) - 'a' else -1
        if (capture && !isFileChar(body(0)))
          return Left(s"SAN $token: invalid capture file")
        Right(PawnMove(fromFile, capture, dest, promotion))
      }
    }
  }

  /** Mutable board state; one instance per game replay. */
  final class State {
    val board = new Array[Int](64)
    var whiteToMove = true
    var castleWK = true; var castleWQ = true
    var castleBK = true; var castleBQ = true
    var epSquare = -1
    var halfmove = 0
    var fullmove = 1

    { // standard initial position
      val back = Array(Rook, Knight, Bishop, Queen, King, Bishop, Knight, Rook)
      var f = 0
      while (f < 8) {
        board(sq(f, 0)) = back(f); board(sq(f, 7)) = -back(f)
        board(sq(f, 1)) = Pawn; board(sq(f, 6)) = -Pawn
        f += 1
      }
    }

    @inline def whiteSign: Int = if (whiteToMove) 1 else -1

    def toFen: String = {
      val sb = new StringBuilder(64)
      var rank = 7
      while (rank >= 0) {
        var empty = 0
        var file = 0
        while (file < 8) {
          val p = board(sq(file, rank))
          if (p == 0) empty += 1
          else {
            if (empty > 0) { sb.append(empty); empty = 0 }
            val c = math.abs(p) match {
              case Pawn => 'p'; case Knight => 'n'; case Bishop => 'b'
              case Rook => 'r'; case Queen => 'q'; case King => 'k'
            }
            sb.append(if (p > 0) c.toUpper else c)
          }
          file += 1
        }
        if (empty > 0) sb.append(empty)
        if (rank > 0) sb.append('/')
        rank -= 1
      }
      sb.append(' ').append(if (whiteToMove) 'w' else 'b').append(' ')
      val castles = new StringBuilder(4)
      if (castleWK) castles.append('K')
      if (castleWQ) castles.append('Q')
      if (castleBK) castles.append('k')
      if (castleBQ) castles.append('q')
      sb.append(if (castles.isEmpty) "-" else castles.toString).append(' ')
      sb.append(if (epSquare < 0) "-" else squareName(epSquare)).append(' ')
      sb.append(halfmove).append(' ').append(fullmove)
      sb.toString
    }

    private def pathClear(src: Int, dst: Int): Boolean = {
      val sf = fileOf(src); val sr = rankOf(src)
      val df = fileOf(dst); val dr = rankOf(dst)
      val fs = Integer.signum(df - sf); val rs = Integer.signum(dr - sr)
      var f = sf + fs; var r = sr + rs
      while (f != df || r != dr) {
        if (!onBoard(f, r) || board(sq(f, r)) != 0) return false
        f += fs; r += rs
      }
      true
    }

    /** Geometric reachability only — mirrors Engine.piece_can_move. */
    private def pieceCanMove(kind: Int, src: Int, dst: Int): Boolean = {
      val df = math.abs(fileOf(dst) - fileOf(src))
      val dr = math.abs(rankOf(dst) - rankOf(src))
      kind match {
        case Knight => (df == 1 && dr == 2) || (df == 2 && dr == 1)
        case Bishop => df == dr && pathClear(src, dst)
        case Rook => (df == 0 || dr == 0) && pathClear(src, dst)
        case Queen => (df == 0 || dr == 0 || df == dr) && pathClear(src, dst)
        case King => df <= 1 && dr <= 1
        case _ => false
      }
    }

    private def clearCastleOnMoveFrom(square: Int): Unit = {
      if (whiteToMove) {
        if (square == sq(0, 0)) castleWQ = false
        else if (square == sq(7, 0)) castleWK = false
      } else {
        if (square == sq(0, 7)) castleBQ = false
        else if (square == sq(7, 7)) castleBK = false
      }
    }

    private def clearCastleOnKingMove(): Unit =
      if (whiteToMove) { castleWK = false; castleWQ = false }
      else { castleBK = false; castleBQ = false }

    private def clearCastleOnRookCapture(square: Int): Unit = square match {
      case 0 => castleWQ = false
      case 7 => castleWK = false
      case 56 => castleBQ = false
      case 63 => castleBK = false
      case _ => ()
    }

    private def advanceTurn(): Unit = {
      if (!whiteToMove) fullmove += 1
      whiteToMove = !whiteToMove
    }

    private def applyCastle(kingside: Boolean): Either[String, Unit] = {
      val rank = if (whiteToMove) 0 else 7
      val label = if (kingside) "kingside" else "queenside"
      val kingSrc = sq(4, rank)
      val (kingDst, rookSrc, rookDst, path) =
        if (kingside) (sq(6, rank), sq(7, rank), sq(5, rank), Array(sq(5, rank), sq(6, rank)))
        else (sq(2, rank), sq(0, rank), sq(3, rank), Array(sq(1, rank), sq(2, rank), sq(3, rank)))
      val hasRight =
        if (whiteToMove) { if (kingside) castleWK else castleWQ }
        else { if (kingside) castleBK else castleBQ }
      if (!hasRight) return Left(s"cannot castle $label: rights unavailable")
      if (board(kingSrc) != whiteSign * King)
        return Left(s"king not on starting square ${squareName(kingSrc)}")
      val occupied = path.filter(board(_) != 0)
      if (occupied.nonEmpty)
        return Left(s"cannot castle $label: squares ${occupied.map(squareName).mkString(", ")} occupied")
      if (board(rookSrc) != whiteSign * Rook)
        return Left(s"cannot castle $label: rook missing on ${squareName(rookSrc)}")
      board(kingDst) = board(kingSrc); board(kingSrc) = 0
      board(rookDst) = board(rookSrc); board(rookSrc) = 0
      clearCastleOnKingMove()
      epSquare = -1
      halfmove += 1
      advanceTurn()
      Right(())
    }

    private def applyPieceMove(m: PieceMove): Either[String, Unit] = {
      if (m.promotion >= 0) return Left("unexpected promotion on piece move")
      val sign = whiteSign
      val destLabel = squareName(m.dest)
      val destPiece = board(m.dest)
      if (m.capture) {
        if (destPiece == 0) return Left(s"expected capture on $destLabel but square empty")
        if (destPiece * sign > 0) return Left(s"capture would take own piece on $destLabel")
      } else {
        if (destPiece * sign > 0) return Left(s"destination $destLabel occupied by friendly piece")
        if (destPiece != 0) return Left(s"destination $destLabel unexpectedly occupied")
      }
      var src = -1; var count = 0
      var s = 0
      while (s < 64) {
        if (board(s) == sign * m.kind &&
          (m.disFile < 0 || fileOf(s) == m.disFile) &&
          (m.disRank < 0 || rankOf(s) == m.disRank) &&
          pieceCanMove(m.kind, s, m.dest)) { src = s; count += 1 }
        s += 1
      }
      if (count == 0) return Left(s"no ${kindName(m.kind)} can reach $destLabel")
      if (count > 1) return Left(s"ambiguous ${kindName(m.kind)} move to $destLabel")
      clearCastleOnMoveFrom(src)
      if (m.kind == King) clearCastleOnKingMove()
      val captured = board(m.dest)
      board(m.dest) = board(src); board(src) = 0
      if (captured != 0 && math.abs(captured) == Rook && captured * sign < 0)
        clearCastleOnRookCapture(m.dest)
      epSquare = -1
      halfmove = if (captured != 0) 0 else halfmove + 1
      advanceTurn()
      Right(())
    }

    private def applyPawnMove(m: PawnMove): Either[String, Unit] = {
      val sign = whiteSign
      val dir = if (whiteToMove) 1 else -1
      val destLabel = squareName(m.dest)
      val destPiece = board(m.dest)
      val destRank = rankOf(m.dest); val destFile = fileOf(m.dest)
      val promotionRank = if (whiteToMove) 7 else 0
      val promote: Int =
        if (m.promotion >= 0) {
          if (destRank != promotionRank)
            return Left(s"promotion to ${kindName(m.promotion)} invalid on rank ${destRank + 1}")
          m.promotion
        } else if (destRank == promotionRank)
          return Left(s"promotion required when pawn reaches $destLabel")
        else -1
      val epCapture = m.capture && destPiece == 0 && epSquare == m.dest
      if (m.capture) {
        if (!epCapture) {
          if (destPiece == 0) return Left(s"expected capture on $destLabel but square empty")
          if (destPiece * sign > 0) return Left(s"capture would take own piece on $destLabel")
        }
      } else if (destPiece != 0)
        return Left(s"pawn move destination $destLabel occupied")

      // Source resolution, mirroring find_pawn_sources (pgn_to_fen.ml:447-509).
      val homeRank = if (whiteToMove) 1 else 6
      val candidateFiles: Array[Int] =
        if (m.fromFile >= 0) Array(m.fromFile)
        else if (m.capture) Array(destFile - 1, destFile + 1)
        else Array(destFile)
      var src = -1; var count = 0
      candidateFiles.foreach { f =>
        if (f >= 0 && f < 8) {
          val one = sq(f, destRank - dir)
          val oneOk = rankOf2Valid(destRank - dir) && board(one) == sign * Pawn
          if (m.capture) {
            val captureValid =
              if (destPiece != 0 && destPiece * sign < 0) true
              else if (epCapture) {
                val capturedSq = sq(destFile, destRank - dir)
                rankOf2Valid(destRank - dir) && board(capturedSq) == -sign * Pawn
              } else false
            if (captureValid && oneOk) { src = one; count += 1 }
          } else {
            if (destPiece == 0) {
              if (oneOk) { src = one; count += 1 }
              else if (destRank == homeRank + 2 * dir && rankOf2Valid(destRank - dir) &&
                board(one) == 0 && rankOf2Valid(destRank - 2 * dir) &&
                board(sq(f, destRank - 2 * dir)) == sign * Pawn) {
                src = sq(f, destRank - 2 * dir); count += 1
              }
            }
          }
        }
      }
      if (count == 0) return Left(s"no pawn can reach $destLabel")
      if (count > 1) return Left(s"ambiguous pawn move to $destLabel")

      if (epCapture) {
        val capturedSq = sq(destFile, destRank - dir)
        if (board(capturedSq) != -sign * Pawn)
          return Left(s"invalid en passant capture on $destLabel")
        board(capturedSq) = 0
      }
      board(m.dest) = board(src); board(src) = 0
      if (promote >= 0) board(m.dest) = sign * promote
      if (destPiece != 0 && math.abs(destPiece) == Rook && destPiece * sign < 0)
        clearCastleOnRookCapture(m.dest)
      epSquare =
        if (!m.capture && math.abs(destRank - rankOf(src)) == 2) sq(destFile, rankOf(src) + dir)
        else -1
      halfmove = 0
      advanceTurn()
      Right(())
    }

    @inline private def rankOf2Valid(rank: Int): Boolean = rank >= 0 && rank < 8

    def applySan(san: San): Either[String, Unit] = san match {
      case CastleKingside => applyCastle(kingside = true)
      case CastleQueenside => applyCastle(kingside = false)
      case m: PieceMove => applyPieceMove(m)
      case m: PawnMove => applyPawnMove(m)
    }
  }

  /** Replay a SAN move list from the initial position; one FEN per ply. */
  def fensOfMoves(sans: Seq[String]): Either[String, Vector[String]] = {
    val state = new State
    val out = Vector.newBuilder[String]
    sans.foreach { sanStr =>
      parseSan(sanStr) match {
        case Left(err) => return Left(err)
        case Right(san) =>
          state.applySan(san) match {
            case Left(err) => return Left(s"apply SAN $sanStr: $err")
            case Right(()) => out += state.toFen
          }
      }
    }
    Right(out.result())
  }
}
