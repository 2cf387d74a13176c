package graft.chess

/** FEN validation / normalization (reference: /root/reference/lib/chess/fen.ml).
  *
  * `normalize` validates the six FEN fields (8 ranks summing to 8 squares,
  * exactly one king per side, <=8 pawns per side, no pawns on ranks 1/8,
  * canonical KQkq castling order without duplicates, en-passant square
  * consistent with the active color) and returns the canonical string.
  * Used as a data-quality filter during ingestion.
  */
object Fen {

  private val pieceChars = "prnbqkPRNBQK".toSet

  def normalize(fen: String): Either[String, String] = {
    val trimmed = fen.trim
    if (trimmed.isEmpty) return Left("FEN must be non-empty")
    val parts = trimmed.split(" ").filter(_.nonEmpty)
    if (parts.length != 6)
      return Left("FEN must consist of exactly six space-separated fields")
    val Array(placement, active, castling, enPassant, halfmove, fullmove) = parts
    for {
      _ <- validatePlacement(placement)
      activeN <- active match {
        case "w" | "b" => Right(active)
        case other => Left(s"invalid active color '$other'")
      }
      castlingN <- normalizeCastling(castling)
      epN <- validateEnPassant(activeN, enPassant)
      _ <- parseIntField(halfmove, "halfmove clock", min = 0)
      _ <- parseIntField(fullmove, "fullmove number", min = 1)
    } yield s"$placement $activeN $castlingN $epN $halfmove $fullmove"
  }

  def isValid(fen: String): Boolean = normalize(fen).isRight

  private def validatePlacement(placement: String): Either[String, Unit] = {
    val ranks = placement.split("/", -1)
    if (ranks.length != 8) return Left("piece placement must have 8 ranks")
    var wk = 0; var bk = 0; var wp = 0; var bp = 0
    var idx = 0
    while (idx < 8) {
      val rank = ranks(idx)
      var total = 0
      var i = 0
      while (i < rank.length) {
        val ch = rank(i)
        if (ch.isDigit) {
          val v = ch - '0'
          if (v <= 0 || v > 8)
            return Left(s"rank ${idx + 1} contains invalid digit '$ch'")
          total += v
        } else if (pieceChars.contains(ch)) {
          ch match {
            case 'K' => wk += 1
            case 'k' => bk += 1
            case 'P' =>
              if (idx == 0 || idx == 7)
                return Left(s"rank ${idx + 1} contains a white pawn on an invalid rank")
              wp += 1
            case 'p' =>
              if (idx == 0 || idx == 7)
                return Left(s"rank ${idx + 1} contains a black pawn on an invalid rank")
              bp += 1
            case _ => ()
          }
          total += 1
        } else return Left(s"rank ${idx + 1} contains invalid character '$ch'")
        i += 1
      }
      if (total != 8)
        return Left(s"rank ${idx + 1} describes $total squares (expected 8)")
      idx += 1
    }
    if (wk != 1 || bk != 1)
      Left("FEN must contain exactly one white king and one black king")
    else if (wp > 8 || bp > 8)
      Left("FEN cannot contain more than eight pawns per side")
    else Right(())
  }

  private def normalizeCastling(castling: String): Either[String, String] =
    if (castling == "-") Right("-")
    else {
      val allowed = Set('K', 'Q', 'k', 'q')
      if (castling.exists(c => !allowed.contains(c)))
        Left(s"invalid castling availability '$castling'")
      else if (castling.toSet.size != castling.length)
        Left(s"castling availability '$castling' contains duplicates")
      else {
        val ordered = "KQkq".filter(castling.contains(_))
        if (ordered.isEmpty)
          Left("castling availability must be '-' when no rights remain")
        else Right(ordered)
      }
    }

  private def validateEnPassant(active: String, square: String): Either[String, String] =
    if (square == "-") Right("-")
    else if (square.length != 2) Left(s"invalid en passant square '$square'")
    else {
      val file = square(0).toLower
      val rank = square(1)
      val expectedRank = if (active == "w") '6' else '3'
      if (file < 'a' || file > 'h') Left(s"en passant file '${square(0)}' is invalid")
      else if (!rank.isDigit) Left(s"en passant rank '$rank' is invalid")
      else if (rank != expectedRank)
        Left(s"en passant square '$square' inconsistent with active color")
      else Right(s"$file$rank")
    }

  private def parseIntField(s: String, name: String, min: Int): Either[String, Int] =
    try {
      val v = s.toInt
      if (v >= min) Right(v)
      else Left(s"$name must be ${if (min == 0) "non-negative" else s">= $min"}")
    } catch { case _: NumberFormatException => Left(s"$name must be an integer") }

  /** Content address of a position — md5 hex of the FEN string, matching the
    * reference's vector point id (fen.ml:172, embedding_worker.ml:232).
    */
  def hash(fen: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(fen.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
