package graft.core

/** The three reference PGN fixtures (reference test/fixtures/), bundled as
  * main resources so driver-run verification queries (SparkEntry) can reach
  * them without a test classpath.
  */
object Fixtures {
  private def read(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  lazy val sampleGame: String = read("sample_game.pgn")
  lazy val extendedSampleGame: String = read("extended_sample_game.pgn")
  lazy val annotatedGame: String = read("annotated_game.pgn")

  /** All fixtures as (name, text) -- a tiny in-memory corpus. */
  def all: Seq[(String, String)] = Seq(
    ("sample_game.pgn", sampleGame),
    ("extended_sample_game.pgn", extendedSampleGame),
    ("annotated_game.pgn", annotatedGame))
}
