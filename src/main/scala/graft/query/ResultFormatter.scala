package graft.query

import org.apache.spark.sql.Row

/** Response shaping (reference services/api/chessmate_api.ml:16-115 +
  * lib/query/result_formatter.ml): synopsis lines, year extraction,
  * opening-name prettification from slug.
  */
object ResultFormatter {

  /** "kings_indian_defense" -> "Kings Indian Defense"
    * (chessmate_api.ml:41-51).
    */
  def prettifySlug(slug: String): String =
    slug.split("_").filter(_.nonEmpty)
      .map(w => w.substring(0, 1).toUpperCase + w.substring(1))
      .mkString(" ")

  /** Year from a YYYY-MM-DD (or YYYY-ish) date string
    * (chessmate_api.ml:29-35).
    */
  def yearOf(date: Option[String]): Option[Int] =
    date.flatMap { d =>
      val head = d.takeWhile(_.isDigit)
      if (head.length == 4) Some(head.toInt) else None
    }

  /** "#id white vs black (score 0.87)" (result_formatter.ml:8-15). */
  def synopsis(gameId: String, white: String, black: String,
      score: Double): String =
    f"#$gameId $white vs $black (score $score%.2f)"

  /** Top-5 summary block (V14). */
  def summarize(rows: Seq[Row]): String =
    rows.take(5).map { r =>
      synopsis(r.getAs[String]("game_id"), r.getAs[String]("white"),
        r.getAs[String]("black"), r.getAs[Double]("total_score"))
    }.mkString("\n")

  /** One result row -> display/JSON-ish map (P2 response shape). */
  def resultFields(r: Row): Map[String, Any] = {
    val openingName = Option(r.getAs[String]("opening_name"))
      .orElse(Option(r.getAs[String]("opening_slug")).map(prettifySlug))
    Map(
      "game_id" -> r.getAs[String]("game_id"),
      "white" -> r.getAs[String]("white"),
      "black" -> r.getAs[String]("black"),
      "event" -> Option(r.getAs[String]("event")),
      "year" -> yearOf(Option(r.getAs[String]("played_on_str"))),
      "opening" -> openingName,
      "result" -> Option(r.getAs[String]("result")),
      "total_score" -> r.getAs[Double]("total_score"),
      "vector_score" -> r.getAs[Double]("vector_score"),
      "keyword_score" -> r.getAs[Double]("keyword_score"))
  }
}
