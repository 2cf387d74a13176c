package graft.gate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chess.{Chess, Openings}
import graft.core.Fixtures
import graft.embed.{DeterministicEmbedder, VectorsJob}
import graft.ingest.{GameMetadata, IngestJob, PgnParser}
import graft.query.{AgentEvaluator, HybridExecutor, QueryIntent, Reranker}

/** Chessmate-workload gate queries over the bundled reference fixtures.
  *
  * Oracles are DuckDB VALUES tables: golden values anchored in the
  * reference's own test suite (test_chess_parsing.ml, test_query.ml,
  * test_integration.ml -- see FIXTURES.md) plus pure-Scala replay for the
  * full FEN lists (the chess core itself is golden-tested against the
  * reference FENs in ChessCoreSpec).
  */
object ChessQueries {

  /** Build fixture tables once per session (tiny corpus, cached). */
  private var cached: Option[(SparkSession, IngestJob.ChessTables, DataFrame)] =
    None

  val embedDims = 16

  def data(s: SparkSession): (IngestJob.ChessTables, DataFrame) =
    synchronized {
      cached match {
        case Some((sess, t, v)) if sess eq s => (t, v)
        case _ =>
          import s.implicits._
          val files = s.createDataset(Fixtures.all)
          val t = IngestJob.tables(s, IngestJob.gamesFromText(s, files))
          val v = VectorsJob.build(s, t.games, t.players, t.positions,
            DeterministicEmbedder(embedDims))
          t.games.cache(); t.players.cache(); t.positions.cache(); v.cache()
          cached = Some((s, t, v))
          (t, v)
      }
    }

  private def sq(v: String): String = "'" + v.replace("'", "''") + "'"

  /** Driver-side pure replay of a fixture -> (file, ply, san, fen) rows. */
  private def replayRows(name: String, text: String): Seq[(String, Int, String, String)] = {
    val game = PgnParser.parseGames(text).toOption.get.head
    val fens = Chess.fensOfMoves(game.moves.map(_.san)).toOption.get
    game.moves.zip(fens).map { case (m, f) => (name, m.ply, m.san, f) }
  }

  private lazy val allReplayRows: Seq[(String, Int, String, String)] =
    Fixtures.all.flatMap { case (n, t) => replayRows(n, t) }

  /** One concatenated multi-game dump of the fixtures (name-sorted order)
    * for the splittable-reader gate, written once per JVM. The '%' banner
    * exercises the moveless-block merge rule across coarse records.
    */
  private lazy val splitDumpDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_split_gate").toString
    val dump = "% banner line\n" +
      Fixtures.all.sortBy(_._1).map(_._2).mkString("\n\n") + "\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/dump.pgn"), dump)
    dir
  }

  /** Pure-driver-side inputs for the agent-rerank oracle: per fixture
    * game, the raw PGN slice plus the header metadata the evaluator's
    * candidate block carries. Same precedent as [[allReplayRows]]: the
    * ORACLE recomputes every algorithm (game_id md5, block assembly,
    * score hash, blend, re-sort) in SQL from these raw inputs.
    */
  private lazy val rerankInputs: Seq[(String, Int, String, GameMetadata.Meta)] =
    Fixtures.all.map { case (name, text) =>
      val slot = PgnParser.splitGames(text).head
      val game = PgnParser.parse(slot.raw).toOption.get
      (name, slot.index, slot.raw, GameMetadata.ofHeaders(game.headers))
    }

  val rerankQuestion = "best games"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // I2/S2-S5: distributed PGN split + parse + SAN->FEN replay.
    "chess_fen_replay" -> ((s, _) => {
      val (t, _) = data(s)
      t.positions
        .join(t.games.select("game_id", "source_file"), Seq("game_id"))
        .select(col("source_file"), col("ply"), col("san"), col("fen"))
    }),

    // S1 at scale: the record-boundary-splitting reader over ONE
    // concatenated dump file, with input splits FORCED to 2 KB so
    // records tear mid-game and the reader must re-synchronize; the
    // oracle is the same golden FEN replay keyed by the dump's
    // sequential game index. The '%' banner block must merge into game
    // 1 (haveMoves rule), not become a phantom slot.
    "chess_split_ingest" -> ((s, _) => {
      import s.implicits._
      val records = graft.ingest.IngestJob.readPgnSplittable(s,
        splitDumpDir, hadoopConf = Map(
          "mapreduce.input.fileinputformat.split.maxsize" -> "2048",
          "mapreduce.input.fileinputformat.split.minsize" -> "1"))
      records.toDF()
        .select(col("game_index"), explode(col("positions")).as("p"))
        .select(col("game_index"), col("p.ply").as("ply"),
          col("p.san").as("san"), col("p.fen").as("fen"))
    }),

    // I4: content addressing vector_id = md5(fen) (DuckDB recomputes md5).
    "chess_vector_id" -> ((s, _) => {
      val (t, _) = data(s)
      t.positions
        .join(t.games.select("game_id", "source_file"), Seq("game_id"))
        .select(col("source_file"), col("ply"), col("vector_id"))
    }),

    // I5: opening catalog (ECO ranges, canonical names, slugs).
    "chess_openings_catalog" -> ((s, _) => {
      import s.implicits._
      Openings.all.map(e => (e.ecoStart, e.ecoEnd, e.slug))
        .toDF("eco_start", "eco_end", "slug")
    }),

    // I5 lookup path: ECO code -> slug via range join against the catalog.
    "chess_eco_lookup" -> ((s, _) => {
      import s.implicits._
      val codes = Seq("A05", "A83", "B13", "B52", "C07", "C65", "D32",
        "D85", "E15", "E76", "Z99").toDF("eco")
      val catalog = Openings.all.map(e => (e.ecoStart, e.ecoEnd, e.slug))
        .toDF("eco_start", "eco_end", "cat_slug")
      codes.join(broadcast(catalog),
        col("eco") >= col("eco_start") && col("eco") <= col("eco_end"),
        "left")
        .select(col("eco"), coalesce(col("cat_slug"), lit("none")).as("slug"))
    }),

    // S6/I1/R6: ingest stats per fixture (counts from the reference's
    // integration suite + README).
    "chess_ingest_stats" -> ((s, _) => {
      val (t, _) = data(s)
      val posStats = t.positions.groupBy("game_id")
        .agg(count(lit(1)).as("positions"),
          sum(when(col("fen_valid"), 1).otherwise(0)).as("valid_fens"),
          countDistinct("vector_id").as("distinct_positions"))
      t.games.join(posStats, Seq("game_id"))
        .select(col("source_file"), col("ply_count"), col("positions"),
          col("valid_fens"), col("distinct_positions"),
          coalesce(col("eco_code"), lit("-")).as("eco"),
          coalesce(col("result"), lit("*")).as("result"),
          coalesce(col("white_rating").cast("string"), lit("-")).as("white_elo"))
    }),

    // Q1-Q10: NL planner goldens (reference test_query.ml).
    "chess_plan_golden" -> ((s, _) => {
      import s.implicits._
      val questions = Seq(
        (1, "Find top 3 King's Indian games where white is rated at least 2500 and black is 100 points lower"),
        (2, "Show me five games that end in a draw in the French Defense endgame"),
        (3, "Show black wins with a queenside majority in the endgame"),
        (4, "find 10 sicilian games with tactics"),
        (5, "white win over 2700 elo"))
      questions.map { case (id, q) =>
        val p = QueryIntent.analyse(QueryIntent.Request(q))
        (id, p.limit, p.offset,
          p.rating.whiteMin.map(_.toString).getOrElse("-"),
          p.rating.blackMin.map(_.toString).getOrElse("-"),
          p.rating.maxRatingDelta.map(_.toString).getOrElse("-"),
          p.filters.map(f => s"${f.field}=${f.value}").mkString("|"),
          p.keywords.mkString("|"))
      }.toDF("qid", "lim", "off", "white_min", "black_min", "delta",
        "filters", "keywords")
    }),

    // Full degraded-mode hybrid execution (V10/V11/V13 formulas
    // end-to-end) -- "show me black wins" over the fixtures, no vectors.
    "chess_hybrid_fallback" -> ((s, _) => {
      val (t, _) = data(s)
      val plan = QueryIntent.analyse(
        QueryIntent.Request("show me black wins", Some(10)))
      HybridExecutor.execute(s,
        HybridExecutor.Tables(t.games, t.players, None), plan,
        computeTotal = false) // page-only output: skip the count scan
        .results
        .select(col("white"), col("black"), col("result"),
          col("vector_score"), col("keyword_score"), col("total_score"))
    }),

    // KNN chain verification: embed(fen) -> cosine vs query vector ->
    // top-k -> per-game max collapse, over the fixture corpus. The DuckDB
    // oracle recomputes the ENTIRE chain (md5 bucket embedding, cosine,
    // top-k, group-max) from the golden FEN values in pure SQL.
    "chess_knn_collapse" -> ((s, _) => {
      val (t, v) = data(s)
      // default limit 50 -> k = 150 > 99 positions: no top-k boundary,
      // so duplicate FENs across games can't introduce tie ambiguity.
      val plan = QueryIntent.analyse(QueryIntent.Request("smyslov"))
      val qv = HybridExecutor.queryVector(plan, DeterministicEmbedder(embedDims))
      HybridExecutor.vectorHits(v, plan, qv)
        .select(col("game_id"),
          floor(col("hit_score") * 1000000).cast("long").as("score_micro"))
        .join(t.games.select(col("game_id"), col("source_file")), Seq("game_id"))
        .select("source_file", "score_micro")
    }),

    // A2/A3/A4-adjacent end-to-end agent rerank: hybrid fallback page ->
    // candidate selection -> PGN batch fetch (R5) -> prompt block
    // assembly -> deterministic batched backend (retry/breaker/telemetry
    // in the path) -> clamp -> 0.6/0.4 blend -> re-sort. The DuckDB
    // oracle recomputes EVERYTHING in SQL from the raw fixture text:
    // game_id = md5('game <file> 0 <raw>'), the evaluator's candidate
    // block string, score = hex32(md5(question ' ' block)) % 101 / 100,
    // the blend, and the final rank order.
    "chess_agent_rerank" -> ((s, _) => {
      val (t, _) = data(s)
      val plan = QueryIntent.analyse(QueryIntent.Request(rerankQuestion))
      // computeTotal=true: the page comes back MATERIALIZED (single-pass
      // count+page), so the reranker's candidate/PGN/score actions run
      // over a 3-row local frame instead of re-executing the fixture DAG.
      val exec = HybridExecutor.execute(s,
        HybridExecutor.Tables(t.games, t.players, None), plan)
      val reranked = Reranker.apply(exec.results, plan,
        new AgentEvaluator.AgentReranker(t.games))
      val w = org.apache.spark.sql.expressions.Window.orderBy(
        desc("total_score"), col("played_on_str").desc_nulls_last,
        col("game_id").desc)
      reranked
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("rank"), col("white"), col("black"), col("explanation"),
          round(col("agent_score") * 100).cast("long").as("agent_centi"),
          floor(col("total_score") * 1000000).cast("long").as("total_micro"))
    }),

    // Full vector-path hybrid execution over the fixture corpus: the
    // DuckDB oracle recomputes the ENTIRE path -- 16-dim embedding,
    // cosine, per-game max collapse, summary-token keyword overlap, and
    // the 0.75/0.25 blend -- from golden FENs + literal metadata.
    // Default limit 50 -> k=150 > 99 positions and no page cut, so no
    // ordering/tie sensitivity anywhere.
    "chess_hybrid_vector" -> ((s, _) => {
      val (t, v) = data(s)
      val plan = QueryIntent.analyse(
        QueryIntent.Request("games with smyslov"))
      HybridExecutor.execute(s,
        HybridExecutor.Tables(t.games, t.players, Some(v)), plan,
        DeterministicEmbedder(embedDims),
        computeTotal = false) // page-only output: skip the count scan
        .results
        .select(col("white"), col("black"),
          floor(col("vector_score") * 1000000).cast("long").as("vector_micro"),
          floor(col("keyword_score") * 1000000).cast("long").as("keyword_micro"),
          floor(col("total_score") * 1000000).cast("long").as("total_micro"))
    }))

  def oracles: Map[String, String] = {
    val fenValues = allReplayRows.map { case (f, ply, san, fen) =>
      s"(${sq(f)}, $ply, ${sq(san)}, ${sq(fen)})"
    }.mkString(", ")
    val vidValues = allReplayRows.map { case (f, ply, _, fen) =>
      s"(${sq(f)}, $ply, ${sq(fen)})"
    }.mkString(", ")
    // DuckDB: first 8 hex chars of md5(e) as unsigned 32-bit int.
    def hex8(e: String): String =
      s"""CAST(list_sum(list_transform(range(1, 9), i ->
          (strpos('0123456789abcdef', substr(md5($e), CAST(i AS INT), 1)) - 1)
            * CAST(16 ** (8 - i) AS BIGINT))) AS BIGINT)"""
    val knnOracle = {
      val dims = embedDims
      s"""WITH pos(source_file, ply, fen) AS (VALUES $vidValues),
          ftok AS (
            SELECT DISTINCT fen,
              list_filter(string_split_regex(lower(fen), '\\s+'),
                x -> x <> '') AS ws
            FROM pos),
          -- 16-dim deterministic embedding, float32-rounded like the
          -- stored vectors table (CAST AS REAL), then back to double.
          evec AS (
            SELECT fen, list_transform(range(0, $dims), d ->
              CAST(CAST(least(greatest(
                CAST(list_sum(list_transform(ws, t ->
                  ${hex8("t || ':' || CAST(d AS VARCHAR)")} % 10000))
                  AS DOUBLE) / (CAST(len(ws) AS DOUBLE) * 10000.0),
                0.0), 1.0) AS REAL) AS DOUBLE)) AS e
            FROM ftok),
          -- query vector: tokens = ['smyslov'] (plan keywords), unrounded.
          qvec AS (
            SELECT list_transform(range(0, $dims), d ->
              CAST(${hex8("'smyslov:' || CAST(d AS VARCHAR)")} % 10000
                AS DOUBLE) / 10000.0) AS q),
          scored AS (
            SELECT p.source_file,
              list_sum(list_transform(range(1, $dims + 1), i ->
                e[CAST(i AS INT)] * q[CAST(i AS INT)])) /
              (sqrt(list_sum(list_transform(e, x -> x * x))) *
               sqrt(list_sum(list_transform(q, x -> x * x)))) AS c
            FROM pos p JOIN evec v ON p.fen = v.fen, qvec)
          SELECT source_file,
            CAST(FLOOR(MAX(c) * 1000000) AS BIGINT) AS score_micro
          FROM scored GROUP BY source_file"""
    }
    // Full hybrid blend on top of the same embedding/cosine CTEs: summary
    // metadata written literally from the fixture headers; keyword =
    // |{smyslov} ∩ summary_tokens| / 1; total = 0.75*v + 0.25*k.
    val hybridVectorOracle = {
      val prefix = knnOracle.substring(0, knnOracle.lastIndexOf("SELECT"))
      s"""$prefix,
          collapsed AS (
            SELECT source_file, MAX(c) AS hit FROM scored GROUP BY source_file),
          meta(source_file, white, black, event, opening_name, opening_slug)
            AS (VALUES
            ('sample_game.pgn', 'Sample White', 'Sample Black',
             'Test Event', NULL, NULL),
            ('extended_sample_game.pgn', 'Seirawan, Y', 'Smyslov, V',
             'Interpolis International Tournament',
             '1.d4 Nf6 2.c4 e6: Indian systems with ...e6',
             '1_d4_nf6_2_c4_e6_indian_systems_with_e6'),
            ('annotated_game.pgn', 'Annotator, A', 'Responder, B',
             'Annotated Fixture', NULL, NULL)),
          scored_games AS (
            SELECT m.white, m.black,
              least(co.hit, 1.0) AS v,
              CASE WHEN list_contains(
                list_filter(string_split_regex(lower(
                  concat_ws(' ', m.white, m.black, m.event,
                    coalesce(m.opening_name, ''),
                    coalesce(m.opening_slug, ''))), '[^a-z0-9]+'),
                  x -> length(x) >= 3), 'smyslov')
                THEN 1.0 ELSE 0.0 END AS kw
            FROM meta m JOIN collapsed co ON co.source_file = m.source_file)
          SELECT white, black,
            CAST(FLOOR(v * 1000000) AS BIGINT) AS vector_micro,
            CAST(FLOOR(kw * 1000000) AS BIGINT) AS keyword_micro,
            CAST(FLOOR((0.75 * v + 0.25 * kw) * 1000000) AS BIGINT)
              AS total_micro
          FROM scored_games"""
    }
    // Agent rerank: full SQL recomputation from raw fixture text. The
    // heuristic total for the "best games" plan (no filters, no
    // keywords, no rating bounds) is 0.75*0.6 + 0.25*0.0 = 0.45 for
    // every game (V10 fallback + V8 keyword formulas, same literals the
    // executor uses); the blend is A3's min(1, 0.6h + 0.4a).
    val rerankOracle = {
      def opt(v: Option[String]) = v.map(sq).getOrElse("NULL")
      val values = rerankInputs.map { case (name, idx, raw, meta) =>
        val playedOn = meta.date.filter(d =>
          d.matches("\\d{4}-\\d{2}-\\d{2}") &&
            scala.util.Try(java.time.LocalDate.parse(d)).isSuccess)
        Seq(sq(name), idx.toString, sq(raw), sq(meta.white.name),
          sq(meta.black.name),
          opt(meta.result), opt(meta.ecoCode), opt(meta.openingName),
          opt(playedOn),
          meta.white.rating.map(r => sq(r.toString)).getOrElse("NULL"),
          meta.black.rating.map(r => sq(r.toString)).getOrElse("NULL"))
          .mkString("(", ", ", ")")
      }.mkString(", ")
      s"""WITH cand(source_file, idx, raw, white, black, result, eco, opening,
              played_on, white_elo, black_elo) AS (VALUES $values),
          b AS (
            SELECT *, md5('game ' || source_file || ' ' ||
              CAST(idx AS VARCHAR) || ' ' || raw) AS gid,
              CASE WHEN length(raw) <= 3000 THEN raw
                   ELSE substr(raw, 1, 3000) || chr(10) ||
                     '... [PGN truncated]' END AS pgn_t
            FROM cand),
          blk AS (
            SELECT gid, white, black, played_on,
              'Game ID: ' || gid || chr(10) ||
              'White: ' || white || chr(10) ||
              'Black: ' || black || chr(10) ||
              'Result: ' || coalesce(result, '*') || chr(10) ||
              'Opening: ' || coalesce(opening, 'Unknown opening') ||
                ' (' || coalesce(eco, 'Unknown ECO') || ')' || chr(10) ||
              'Played on: ' || coalesce(played_on, 'Unknown date') || chr(10) ||
              'Ratings (White | Black): ' || coalesce(white_elo, '?') ||
                ' vs ' || coalesce(black_elo, '?') || chr(10) ||
              'PGN:' || chr(10) || pgn_t AS block
            FROM b),
          scored AS (
            SELECT gid, white, black, played_on,
              ${hex8(s"${sq(rerankQuestion + " ")} || block")} % 101 AS centi
            FROM blk),
          blended AS (
            -- every literal CAST to DOUBLE: DuckDB folds bare numeric
            -- literals as DECIMAL (exact 0.462), Spark computes IEEE
            -- doubles (0.46199999...); the floor(*1e6) differs by 1.
            SELECT white, black, gid, played_on, centi,
              least(CAST(1.0 AS DOUBLE),
                CAST(0.6 AS DOUBLE) * (CAST(0.75 AS DOUBLE) *
                  CAST(0.6 AS DOUBLE) + CAST(0.25 AS DOUBLE) *
                  CAST(0.0 AS DOUBLE)) +
                CAST(0.4 AS DOUBLE) * least(greatest(
                  CAST(centi AS DOUBLE) / CAST(100.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE)), CAST(1.0 AS DOUBLE))) AS total
            FROM scored)
          SELECT
            CAST(ROW_NUMBER() OVER (ORDER BY total DESC,
              played_on DESC NULLS LAST, gid DESC) AS BIGINT) AS rank,
            white, black,
            'deterministic[medium/low]' AS explanation,
            CAST(centi AS BIGINT) AS agent_centi,
            CAST(FLOOR(total * 1000000) AS BIGINT) AS total_micro
          FROM blended"""
    }
    Map(
      "chess_knn_collapse" -> knnOracle,
      "chess_hybrid_vector" -> hybridVectorOracle,
      "chess_agent_rerank" -> rerankOracle,
      "chess_fen_replay" ->
        s"SELECT * FROM (VALUES $fenValues) t(source_file, ply, san, fen)",
      // splittable reader: same golden replay, keyed by the dump's
      // name-sorted sequential game index (banner merges into game 1).
      "chess_split_ingest" -> {
        val idxOf = Fixtures.all.map(_._1).sorted.zipWithIndex.toMap
        val rows = allReplayRows.map { case (f, ply, san, fen) =>
          s"(${idxOf(f) + 1}, $ply, ${sq(san)}, ${sq(fen)})"
        }.mkString(", ")
        s"SELECT * FROM (VALUES $rows) t(game_index, ply, san, fen)"
      },
      // DuckDB recomputes the content address from the golden FENs.
      "chess_vector_id" ->
        s"""SELECT source_file, ply, md5(fen) AS vector_id
            FROM (VALUES $vidValues) t(source_file, ply, fen)""",
      "chess_openings_catalog" ->
        """SELECT * FROM (VALUES
           ('A00','A39','white_first_moves_other_than_1_e4_1_d4'),
           ('A40','A44','1_d4_without_1_d5_1_nf6_or_1_f5_atypical_replies_to_1_d4'),
           ('A45','A49','1_d4_nf6_without_2_c4_atypical_replies_to_1_nf6'),
           ('A50','A79','1_d4_nf6_2_c4_without_2_e6_or_2_g6_atypical_indian_systems'),
           ('A80','A99','dutch_defense'),
           ('B00','B09','1_e4_without_1_c6_1_c5_1_e6_1_e5'),
           ('B10','B19','caro_kann_defense'),
           ('B20','B99','sicilian_defense'),
           ('C00','C19','french_defense'),
           ('C20','C99','1_e4_e5_double_king_pawn_games'),
           ('D00','D69','1_d4_d5_double_queen_pawn_games'),
           ('D70','D99','grunfeld_defense'),
           ('E00','E59','1_d4_nf6_2_c4_e6_indian_systems_with_e6'),
           ('E60','E99','kings_indian_defense')
           ) t(eco_start, eco_end, slug)""",
      "chess_eco_lookup" ->
        """SELECT * FROM (VALUES
           ('A05','white_first_moves_other_than_1_e4_1_d4'),
           ('A83','dutch_defense'),
           ('B13','caro_kann_defense'),
           ('B52','sicilian_defense'),
           ('C07','french_defense'),
           ('C65','1_e4_e5_double_king_pawn_games'),
           ('D32','1_d4_d5_double_queen_pawn_games'),
           ('D85','grunfeld_defense'),
           ('E15','1_d4_nf6_2_c4_e6_indian_systems_with_e6'),
           ('E76','kings_indian_defense'),
           ('Z99','none')
           ) t(eco, slug)""",
      // 1 game / 6 positions (integration suite), 77 positions (README),
      // 16 plies (annotated fixture); Seirawan Elo 2568, eco E11 / B33 /
      // none per the fixture headers.
      "chess_ingest_stats" ->
        """SELECT * FROM (VALUES
           ('sample_game.pgn', 6, 6, 6, 6, '-', '1-0', '-'),
           ('extended_sample_game.pgn', 77, 77, 77, 77, 'E11', '0-1', '2568'),
           ('annotated_game.pgn', 16, 16, 16, 16, '-', '1-0', '-')
           ) t(source_file, ply_count, positions, valid_fens,
               distinct_positions, eco, result, white_elo)""",
      // Golden plans: rows 1-2 from reference test_query.ml asserts;
      // 3-5 hand-derived from the same planner rules.
      "chess_plan_golden" ->
        """SELECT * FROM (VALUES
           (1, 3, 0, '2500', '-', '100',
            'eco_range=E60-E99|opening=kings_indian_defense',
            'kings|indian|white|2500|black|100'),
           (2, 5, 0, '-', '-', '-',
            'eco_range=C00-C19|opening=french_defense|phase=endgame|result=1/2-1/2',
            'five|end|draw|french|defense|endgame'),
           (3, 50, 0, '-', '-', '-',
            'phase=endgame|result=0-1|theme=queenside_majority',
            'black|queenside|majority|endgame'),
           (4, 10, 0, '-', '-', '-',
            'eco_range=B20-B99|opening=sicilian_defense|theme=tactics',
            'sicilian|tactics'),
           (5, 50, 0, '2700', '-', '-', 'result=1-0', 'white|2700')
           ) t(qid, lim, off, white_min, black_min, delta, filters, keywords)""",
      // Degraded mode over fixtures: only the extended game is 0-1;
      // filters all match -> fallback vector 1.0; keywords=['black'] with
      // no summary-token overlap -> keyword 0; total 0.75.
      "chess_hybrid_fallback" ->
        """SELECT white, black, result,
             CAST(vector_score AS DOUBLE) AS vector_score,
             CAST(keyword_score AS DOUBLE) AS keyword_score,
             CAST(total_score AS DOUBLE) AS total_score
           FROM (VALUES
           ('Seirawan, Y', 'Smyslov, V', '0-1', 1.0, 0.0, 0.75)
           ) t(white, black, result, vector_score, keyword_score, total_score)"""
    )
  }
}
