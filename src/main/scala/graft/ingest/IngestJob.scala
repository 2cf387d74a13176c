package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.chess.{Chess, Fen}

/** PGN corpus -> relational chess tables, as one distributed lineage:
  *
  *   read (wholetext) -> flatMap(split games) -> map(parse + metadata +
  *   SAN->FEN replay) -> project games / explode positions / dedup players
  *
  * Scale design (100 TB corpus, 1000 executors):
  *   - Splitting is per-file and parse/replay is per-game: embarrassingly
  *     parallel, no shuffle until the final player dedup (which is tiny:
  *     the player dimension is orders of magnitude smaller than games).
  *   - ids are DETERMINISTIC content hashes, not sequences:
  *     game_id = hash(source_file, game_index, raw_pgn) and
  *     player_id = hash(player key). Foreign keys are therefore computed
  *     locally with zero joins/shuffles -- the reference's transactional
  *     player upsert (repo_postgres_caqti.ml:503-523) becomes a stateless
  *     hash + a small `dropDuplicates` dimension build.
  *   - Malformed games become rows with `parse_ok=false` + `error`, never
  *     exceptions (error-channel parity with pgn_parser.ml:204-260).
  *
  * Reference: /root/reference/lib/cli/ingest_command.ml (entry),
  * lib/storage/repo_postgres_caqti.ml:536-586 (insert pipeline).
  */
object IngestJob {

  /** One game after parse + replay; positions nested until projection. */
  final case class GameRecord(
      game_id: String,
      source_file: String,
      game_index: Int,
      event: Option[String], site: Option[String], round: Option[String],
      played_on: Option[String], // normalized YYYY-MM-DD (or raw passthrough)
      white_name: String, white_fide_id: Option[String], white_rating: Option[Int],
      black_name: String, black_fide_id: Option[String], black_rating: Option[Int],
      eco_code: Option[String], opening_name: Option[String],
      opening_slug: Option[String], result: Option[String],
      ply_count: Int,
      tags: Map[String, String],
      pgn: String,
      parse_ok: Boolean,
      error: Option[String],
      positions: Seq[PositionRecord])

  final case class PositionRecord(
      ply: Int, move_number: Int, side_to_move: String,
      san: String, fen: String, fen_valid: Boolean, vector_id: String)

  /** Stable 128-bit id: 32-hex md5 over the ' '-joined parts (same shape
    * as `vector_id = md5(fen)`). Content-derived ids make every run
    * reproducible and every FK computable without a join. 128 bits, not a
    * truncated long: at the design corpus (~5e10 games) a 63-bit id has
    * ~100 expected birthday collisions that would silently merge games in
    * every downstream join; at 128 bits the bound is ~1e-17.
    */
  def stableId(parts: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Player key: fide id if present, else lowercase name (reference lookup
    * order, repo_postgres_caqti.ml:503-523).
    */
  def playerKey(name: String, fideId: Option[String]): String =
    fideId.map(f => s"fide:$f").getOrElse("name:" + name.trim.toLowerCase)

  def playerId(name: String, fideId: Option[String]): String =
    stableId("player", playerKey(name, fideId))

  /** Parse + replay one raw game (pure; runs inside tasks). */
  def processGame(sourceFile: String, index: Int, raw: String): GameRecord = {
    val gameId = stableId("game", sourceFile, index.toString, raw)
    PgnParser.parse(raw) match {
      case Left(err) =>
        GameRecord(gameId, sourceFile, index, None, None, None, None,
          "", None, None, "", None, None, None, None, None, None,
          0, Map.empty, raw, parse_ok = false, error = Some(err), positions = Nil)
      case Right(parsed) =>
        val meta = GameMetadata.ofHeaders(parsed.headers)
        val sans = parsed.moves.map(_.san)
        val (positions, replayError) = Chess.fensOfMoves(sans) match {
          case Left(err) => (Seq.empty[PositionRecord], Some(err))
          case Right(fens) =>
            val pos = parsed.moves.zip(fens).map { case (m, fen) =>
              val normalized = Fen.normalize(fen)
              PositionRecord(
                ply = m.ply,
                move_number = m.turn,
                // side ABOUT to move after this ply -- parity with
                // repo_postgres_caqti.ml:501 (ply % 2 = 1 -> black).
                side_to_move = if (m.ply % 2 == 1) "black" else "white",
                san = m.san,
                fen = normalized.getOrElse(fen),
                fen_valid = normalized.isRight,
                vector_id = Fen.hash(normalized.getOrElse(fen)))
            }
            (pos, None)
        }
        GameRecord(gameId, sourceFile, index,
          meta.event, meta.site, meta.round, meta.date,
          meta.white.name, meta.white.fideId, meta.white.rating,
          meta.black.name, meta.black.fideId, meta.black.rating,
          meta.ecoCode, meta.openingName, meta.openingSlug, meta.result,
          positions.length,
          parsed.headers.toMap,
          raw,
          parse_ok = replayError.isEmpty,
          error = replayError,
          positions = positions)
    }
  }

  /** Split whole-file PGN text into per-game records. */
  def gamesFromText(spark: SparkSession,
      files: Dataset[(String, String)]): Dataset[GameRecord] = {
    import spark.implicits._
    files.flatMap { case (path, text) =>
      // splitRaws, not splitGames: processGame parses each game anyway,
      // and the eager parse inside GameSlot would be thrown away
      PgnParser.splitRaws(text).zipWithIndex.map { case (g, i) =>
        processGame(path, i + 1, g)
      }
    }
  }

  /** Read a directory/glob of .pgn files. wholetext keeps one game dump per
    * record; at 100 TB the dumps are many files, so parallelism comes from
    * file count (and games-per-file via the flatMap above). A SINGLE huge
    * dump file is one task here — use [[readPgnSplittable]] for that shape.
    */
  def readPgn(spark: SparkSession, path: String): Dataset[GameRecord] = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
    gamesFromText(spark, files)
  }

  /** Record-boundary-splitting PGN reader: one multi-GB dump file fans out
    * across tasks instead of being a single `wholetext` record (S1 at the
    * 100 TB shape the reference never faces — its queue feeds one file per
    * job, twic_ingest.ml; a Spark cluster ingests the whole archive at
    * once).
    *
    * Mechanics: Hadoop `TextInputFormat` with a custom record delimiter
    * `"\n[Event "` — the input-format splits files at arbitrary byte
    * offsets and the record reader re-synchronizes each split to the next
    * delimiter (first split keeps offset 0), so records NEVER tear across
    * split boundaries. Joining a file's records (with the stripped
    * `"[Event "` prefix re-attached) with "\n" reproduces the file's bytes
    * EXACTLY, and running [[PgnParser.splitGames]] over each
    * moveless*-then-movesful run of records reproduces the wholetext
    * splitter exactly (the haveMoves merge rule — banners and header-only
    * blocks merge forward into the next game).
    *
    * SHUFFLE-FREE BY DESIGN — the whole read is two scans and zero
    * exchanges of the text:
    *
    *  - Pass 1 walks each input split's records once ([[walkChunks]]) and
    *    emits ONE tiny row per SPLIT: how many complete games close
    *    inside it, plus the trailing moveless text (usually empty) that
    *    must flow into the next split. Collected to the driver: O(#splits)
    *    rows (~800k at 100 TB / 128 MB splits), independent of game
    *    count.
    *  - The driver walks the splits of each file in byte order computing
    *    each split's game-index base and cross-split carry text, and
    *    broadcasts that map.
    *  - Pass 2 re-reads, and each split emits its parsed games directly
    *    (same [[walkChunks]] kernel, so pass-1 counts and pass-2 slots
    *    cannot disagree), with the sequential per-file index = base +
    *    local position. Parse + SAN→FEN replay runs fully distributed.
    *
    * Game index — and hence `game_id = md5("game <file> <index> <raw>")`
    * — is therefore byte-identical to [[readPgn]] (spec-asserted incl.
    * forced 2 KB splits), so cross-snapshot incremental anti-joins (E1)
    * are stable across reader choices. Driver memory holds only carry
    * texts (moveless banners), not games.
    */
  def readPgnSplittable(spark: SparkSession, path: String,
      hadoopConf: Map[String, String] = Map.empty): Dataset[GameRecord] = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n[Event ")
    hadoopConf.foreach { case (k, v) => conf.set(k, v) }

    def scan[U: scala.reflect.ClassTag](
        f: (String, Long, Iterator[String]) => Iterator[U]) =
      spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text],
        conf)
        .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[
          org.apache.hadoop.io.LongWritable, org.apache.hadoop.io.Text]]
        .mapPartitionsWithInputSplit { (split, iter) =>
          val fs = split
            .asInstanceOf[org.apache.hadoop.mapreduce.lib.input.FileSplit]
          // render the path EXACTLY as input_file_name() does
          // (scheme://authority/path, empty authority rendered as //),
          // so source_file -- and with it game_id -- matches readPgn's
          val u = fs.getPath.toUri
          val file = new java.net.URI(u.getScheme,
            Option(u.getAuthority).getOrElse(""), u.getPath, null, null)
            .toString
          // The FIRST record of the split that starts the file is the
          // file head (banner or first game with its own "[Event"
          // line); every later record lost the delimiter's "[Event "
          // prefix. Head detection uses first-record-of-first-split,
          // NOT record key == 0: with a splittable compressed codec
          // (bzip2) the LongWritable key is the COMPRESSED block
          // position, so every record in the first block reads key 0.
          var first = true
          f(file, fs.getStart, iter.map { case (_, text) =>
            val head = first && fs.getStart == 0L
            first = false
            if (head) text.toString else "[Event " + text.toString
          })
        }

    // Pass 1: one row per split.
    val reports = scan { (file, splitStart, iter) =>
      val (slots, trailing) = walkChunks(iter, carryIn = "")
      Iterator((file, splitStart, slots.size, trailing))
    }.collect()

    val bc = spark.sparkContext.broadcast(planSplits(reports.toSeq))

    // Pass 2: emit parsed games with exact sequential indices.
    val records = scan { (file, splitStart, iter) =>
      // strict lookup: a split key absent from the pass-1 plan means the
      // input changed between passes (or the lazy RDD recomputed over
      // mutated files) — falling back to base 0 would silently mint
      // duplicate game_index/game_id values, so fail loudly instead.
      val (carryIn, base, tailText) =
        bc.value.getOrElse((file, splitStart),
          throw new IllegalStateException(
            s"splittable PGN plan has no entry for split $file@$splitStart" +
              " — input changed between pass 1 and pass 2"))
      val (slots, trailing) = walkChunks(iter, carryIn)
      val localTail =
        if (tailText.nonEmpty) {
          // sanity: the driver-computed file tail must equal this
          // split's trailing text chained with its carry history; the
          // driver's copy is authoritative (it chained across splits)
          PgnParser.splitRaws(tailText)
        } else Vector.empty[String]
      (slots ++ localTail).iterator.zipWithIndex.map { case (raw, i) =>
        processGame(file, base + i + 1, raw)
      }
    }
    spark.createDataset(records)
  }

  /** Shared pass-1/pass-2 kernel for [[readPgnSplittable]]: walk one
    * split's restored records in order, merging each run of moveless
    * records into the next movesful one (splitGames' haveMoves rule) and
    * emitting the slot raws of every block that CLOSES inside this split.
    * Returns (closed slots in order, trailing moveless text not yet
    * closed). Block text is rebuilt with "\n" joins — byte-identical to
    * the original file span — and split via [[PgnParser.splitGames]], so
    * slot boundaries and raws match the wholetext path exactly.
    */
  /** Driver walk for [[readPgnSplittable]]: from pass-1 reports
    * (file, splitStart, slotsClosed, trailingMovelessText) compute each
    * split's entry (carryInText, indexBase, tailText). tailText is the
    * file-final all-moveless block (usually empty), emitted by the
    * file's LAST split. Pure -- property-tested against splitGames over
    * random corpora and split points.
    */
  private[ingest] def planSplits(
      reports: Seq[(String, Long, Int, String)])
      : Map[(String, Long), (String, Int, String)] = {
    val entries = scala.collection.mutable.HashMap
      .empty[(String, Long), (String, Int, String)]
    reports.groupBy(_._1).foreach { case (file, rs) =>
      val ordered = rs.sortBy(_._2)
      var carry = ""
      var base = 0
      ordered.foreach { case (_, start, nSlots, trailing) =>
        entries((file, start)) = (carry, base, "")
        base += nSlots
        // a split whose chunks are ALL moveless closes no game: its
        // trailing text is carry + its whole body; walkChunks reports
        // exactly that as `trailing` given empty carry, so chain it
        carry = if (carry.isEmpty || nSlots > 0) trailing
          else if (trailing.isEmpty) carry
          else carry + "\n" + trailing
      }
      if (carry.nonEmpty) {
        // file ends in a moveless block: it is its own slot (splitGames
        // finalizes the trailing collected block); the last split emits
        val (f, start, _, _) = ordered.last
        val (c, b, _) = entries((f, start))
        entries((f, start)) = (c, b, carry)
      }
    }
    entries.toMap
  }

  private[ingest] def walkChunks(chunks: Iterator[String],
      carryIn: String): (Vector[String], String) = {
    val out = Vector.newBuilder[String]
    val buf = new StringBuilder(carryIn)
    chunks.foreach { chunk =>
      if (buf.nonEmpty) buf.append('\n')
      buf.append(chunk)
      if (PgnParser.hasMoveText(chunk)) {
        // splitRawsWithTail, NOT splitRaws: a movesful chunk can END in a
        // moveless block (`[EventDate …]` after moves — starts a new block
        // in the wholetext splitter but is not a "\n[Event " delimiter).
        // That block must merge FORWARD into the next game, exactly as
        // wholetext does, so it stays in buf as carry instead of being
        // flushed as a phantom closed slot (which would shift every later
        // game_index/game_id).
        val (slots, tail) = PgnParser.splitRawsWithTail(buf.toString)
        out ++= slots
        buf.setLength(0)
        buf.append(tail)
      }
    }
    (out.result(), buf.toString)
  }

  final case class ChessTables(games: DataFrame, players: DataFrame,
      positions: DataFrame, issues: DataFrame)

  /** Project the nested records into the relational model.
    *
    * Encoding discipline: the typed record dataset is converted to a
    * DataFrame ONCE (player ids computed in the same pass); all four
    * projections are then pure column ops (select/explode/groupBy) over
    * that frame -- no per-projection case-class decode/encode cycles,
    * which dominate wall time on wide nested records.
    *
    * @param persistRecords persist the converted frame so parse+replay
    *   runs once for all four projections (MEMORY_AND_DISK: spills
    *   instead of recomputing at 100 TB). Callers own unpersist.
    */
  def tables(spark: SparkSession, records0: Dataset[GameRecord],
      persistRecords: Boolean = false): ChessTables = {
    import spark.implicits._
    // one encode pass: attach FK ids while still typed, then to rows.
    val df0 = records0.map { g =>
      (g, playerId(g.white_name, g.white_fide_id),
        playerId(g.black_name, g.black_fide_id))
    }.toDF("g", "white_player_id", "black_player_id")
      .select(col("g.*"), col("white_player_id"), col("black_player_id"))
    val df =
      if (persistRecords)
        df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df0
    val ok = df.where(col("parse_ok"))

    val games = ok.select(col("game_id"), col("white_player_id"),
      col("black_player_id"), col("event"), col("site"), col("round"),
      col("played_on").as("date_raw"), col("eco_code"), col("opening_name"),
      col("opening_slug"), col("result"), col("white_rating"),
      col("black_rating"), col("ply_count"), col("tags"), col("pgn"),
      col("source_file"), col("game_index"))
      .withColumn("played_on", to_date(col("date_raw"), "yyyy-MM-dd"))

    val players = ok.select(explode(array(
      struct(col("white_player_id").as("id"), col("white_name").as("name"),
        col("white_fide_id").as("fide_id"), col("white_rating").as("rating")),
      struct(col("black_player_id").as("id"), col("black_name").as("name"),
        col("black_fide_id").as("fide_id"), col("black_rating").as("rating"))))
      .as("p"))
      .select(col("p.*"))
      // dimension build: one row per player id; rating_peak = max seen.
      .groupBy("id")
      .agg(first("name", ignoreNulls = true).as("name"),
        first("fide_id", ignoreNulls = true).as("fide_id"),
        max("rating").as("rating_peak"))

    val positions = ok
      .select(col("game_id"), explode(col("positions")).as("p"))
      .select(col("game_id"), col("p.ply"), col("p.move_number"),
        col("p.side_to_move"), col("p.san"), col("p.fen"),
        col("p.fen_valid"), col("p.vector_id"))

    val issues = df.where(!col("parse_ok"))
      .select(col("source_file"), col("game_index"),
        coalesce(col("error"), lit("unknown")).as("error"),
        substring(col("pgn"), 1, 200).as("preview"))

    ChessTables(games, players, positions, issues)
  }

  def run(spark: SparkSession, inputPath: String): ChessTables =
    tables(spark, readPgn(spark, inputPath))

  /** Persist tables. `positions` carries the heavy rows (~80x games);
    * `games` partitioned by year for partition pruning on date predicates
    * at 100 TB.
    */
  def write(t: ChessTables, outDir: String): Unit = {
    t.games
      .withColumn("year", coalesce(year(col("played_on")), lit(0)))
      .write.mode("overwrite").partitionBy("year")
      .parquet(s"$outDir/games")
    t.players.write.mode("overwrite").parquet(s"$outDir/players")
    t.positions.write.mode("overwrite").parquet(s"$outDir/positions")
    t.issues.write.mode("overwrite").parquet(s"$outDir/issues")
  }

  /** Bucketed variant (saveAsTable; requires a warehouse): positions and
    * games bucketed by game_id so the positions<->games join -- the
    * backbone of the vectors build and every per-game analysis -- is
    * co-located with NO shuffle on either side. At 100 TB this removes
    * the single largest exchange in the pipeline; size `buckets` to ~2-4x
    * target cluster cores.
    */
  def writeBucketed(t: ChessTables, db: String, buckets: Int = 64): Unit = {
    val spark = t.games.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Seq("games", "positions", "players").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$n"))
    t.games.write.mode("overwrite")
      .bucketBy(buckets, "game_id").sortBy("game_id")
      .saveAsTable(s"$db.games")
    t.positions.write.mode("overwrite")
      .bucketBy(buckets, "game_id").sortBy("game_id", "ply")
      .saveAsTable(s"$db.positions")
    t.players.write.mode("overwrite").saveAsTable(s"$db.players")
  }
}
