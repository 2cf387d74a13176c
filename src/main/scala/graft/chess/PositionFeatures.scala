package graft.chess

/** Position tag -> theme features (reference
  * lib/chess/position_features.ml:5-25): substring match over free-text
  * tags to a small theme enum. Extension point for richer text analysis
  * (graft.llmops.TextAnalysis).
  */
object PositionFeatures {

  /** theme name -> substrings that imply it (lowercased match). */
  val themeRules: List[(String, List[String])] = List(
    ("king_attack", List("kingside attack", "king attack", "attack on the king")),
    ("queenside_majority", List("queenside majority", "queenside pawn majority")),
    ("central_break", List("central break", "center break", "centre break")))

  def themesOfTags(tags: Seq[String]): Seq[String] = {
    val lowered = tags.map(_.toLowerCase)
    themeRules.collect {
      case (theme, needles)
        if lowered.exists(t => needles.exists(t.contains)) => theme
    }
  }

  /** Column form over an array<string> tags column. */
  def themesCol(tags: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val lowered = transform(tags, t => lower(t))
    val themeCols = themeRules.map { case (theme, needles) =>
      when(exists(lowered, t =>
        needles.map(n => t.contains(n)).reduce(_ || _)), theme)
        .otherwise(null)
    }
    filter(array(themeCols: _*), c => c.isNotNull)
  }
}
