package graft.ingest

import graft.chess.Openings

/** PGN headers -> typed game metadata
  * (reference: /root/reference/lib/chess/game_metadata.ml).
  */
object GameMetadata {

  final case class Player(name: String, fideId: Option[String], rating: Option[Int])
  final case class Meta(
      event: Option[String], site: Option[String], date: Option[String],
      round: Option[String], white: Player, black: Player,
      ecoCode: Option[String], openingName: Option[String],
      openingSlug: Option[String], result: Option[String])

  private def clean(v: Option[String]): Option[String] =
    v.map(_.trim).filter(_.nonEmpty)

  private def parseIntOpt(v: Option[String]): Option[Int] =
    v.flatMap(s => scala.util.Try(s.trim.toInt).toOption)

  /** `YYYY.MM.DD` -> `YYYY-MM-DD`; `??`/junk month/day default to 01; junk
    * year -> None; non-3-part strings pass through trimmed
    * (game_metadata.ml:39-71).
    */
  def normalizeDate(raw: Option[String]): Option[String] =
    raw.flatMap { r =>
      val trimmed = r.trim
      if (trimmed.isEmpty) None
      else trimmed.split("\\.", -1) match {
        case Array(yyyyRaw, mm, dd) =>
          val yyyy = yyyyRaw.trim
          if (yyyy.isEmpty || yyyy.contains('?') || !yyyy.forall(_.isDigit)) None
          else {
            def canon(part: String, default: String): String = {
              val s = part.trim
              if (s.isEmpty || s.contains('?') || !s.forall(_.isDigit)) default
              else s.length match {
                case 1 => "0" + s
                case 2 => s
                case _ => default
              }
            }
            Some(s"$yyyy-${canon(mm, "01")}-${canon(dd, "01")}")
          }
        case _ => Some(trimmed)
      }
    }

  def ofHeaders(headers: List[(String, String)]): Meta = {
    def find(key: String): Option[String] =
      headers.collectFirst { case (k, v) if k == key => v }
    val ecoCode = clean(find("ECO"))
    val openingHeader = clean(find("Opening"))
    val canonicalFromEco = ecoCode.flatMap(Openings.canonicalNameOfEco)
    val openingName = openingHeader.orElse(canonicalFromEco)
    val openingSlug = openingName match {
      case Some(name) => Some(Openings.slugify(name))
      case None => ecoCode.flatMap(Openings.slugOfEco)
    }
    def player(nameKey: String, eloKey: String, fideKey: String): Player =
      Player(clean(find(nameKey)).getOrElse(""),
        clean(find(fideKey)), parseIntOpt(find(eloKey)))
    Meta(
      event = clean(find("Event")),
      site = clean(find("Site")),
      date = normalizeDate(find("Date")),
      round = clean(find("Round")),
      white = player("White", "WhiteElo", "WhiteFideId"),
      black = player("Black", "BlackElo", "BlackFideId"),
      ecoCode = ecoCode,
      openingName = openingName,
      openingSlug = openingSlug,
      result = clean(find("Result")))
  }
}
