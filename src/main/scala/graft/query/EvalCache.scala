package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A4 agent-evaluation cache (reference lib/query/agent_cache.ml).
  *
  * Key construction follows agent_cache.ml:14-36 in spirit -- MD5 over
  * the fields that change an evaluation -- with three DELIBERATE
  * divergences from the reference's exact key:
  *   - the reference hashes the FULL pgn and joins fields with "\n";
  *     we truncate the PGN to 3000 chars first (agent_evaluator.ml:30-33
  *     truncates the evaluator's prompt to the same 3000, so two
  *     candidates sharing that prefix produce the identical evaluator
  *     input -- caching them under one key is strictly better) and join
  *     with NUL, which unlike "\n" cannot occur inside a field;
  *   - the reference encodes missing ratings as -1 sentinels; we use ""
  *     (distinct from any real rating, same collision-freedom);
  *   - we key on BOTH the candidate summary's opening_slug/result (like
  *     the reference, agent_cache.ml:17-36 -- evaluator prompts include
  *     per-candidate metadata, build_candidate_block) AND the plan's
  *     opening/result filters, which gated the candidate set the
  *     evaluator saw -- a strictly finer key than the reference's.
  *
  * Soundness contract: the cache key covers (plan fields, candidate
  * opening_slug, candidate result, the full candidate-block fields the
  * evaluator prompt renders -- game_id, white/black names, ratings,
  * played_on, eco, opening name -- and the first 3000 chars of pgn).
  * That is every column AgentEvaluator.buildCandidateBlock reads, so the
  * bundled evaluator is key-compatible by construction; a custom Reranker
  * whose scores depend on candidate columns OUTSIDE that set must not be
  * wrapped in `cached`.
  *
  * Backend is an LRU memo (reference default cap 1000, config.ml:101) on
  * the DRIVER: candidates per query are <= 25 (A1), so the working set is
  * tiny; a distributed memo would add a shuffle to save a driver map
  * lookup. A Redis-style external backend drops in by implementing
  * `Backend`.
  */
object EvalCache {

  val defaultCapacity = 1000 // agent_cache.ml memory backend default
  val pgnTruncateChars = 3000 // agent_evaluator.ml:30-33

  final case class Entry(agentScore: Double, explanation: String)

  trait Backend {
    def get(key: String): Option[Entry]
    def put(key: String, e: Entry): Unit
  }

  /** Thread-safe LRU via access-order LinkedHashMap. */
  final class LruBackend(capacity: Int = defaultCapacity) extends Backend {
    private val m =
      new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Entry]): Boolean =
          size() > capacity
      }
    def get(key: String): Option[Entry] =
      m.synchronized(Option(m.get(key)))
    def put(key: String, e: Entry): Unit =
      m.synchronized { m.put(key, e); () }
    def size: Int = m.synchronized(m.size())
  }

  /** Persistent backend -- the reference's Redis cache
    * (agent_cache.ml Redis backend) re-expressed without a network
    * service: an append-only JSONL log under `dir` with an in-memory
    * index, durable across processes. `put` appends one line and fsyncs
    * are left to the OS (same durability class as Redis's default
    * everysec appendfsync); a crash can lose the tail but never corrupts
    * earlier entries because a torn final line is skipped on load.
    * Last-write-wins on duplicate keys (log order), like SET. `compact()`
    * rewrites the log to one line per live key; callers run it
    * opportunistically, as Redis does AOF rewrite.
    */
  final class PersistentBackend(dir: java.nio.file.Path) extends Backend {
    private val file = dir.resolve("eval_cache.jsonl")
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
    private def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    private def unesc(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '"' => b += '"'; i += 2
            case '\\' => b += '\\'; i += 2
            case 'n' => b += '\n'; i += 2
            case 'r' => b += '\r'; i += 2
            case 't' => b += '\t'; i += 2
            case 'u' if i + 6 <= s.length =>
              b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case o => b += o; i += 2
          }
        } else { b += c; i += 1 }
      }
      b.toString
    }
    // one entry per line: {"k":"<md5>","s":<score>,"e":"<explanation>"}
    private def render(k: String, e: Entry): String =
      s"""{"k":"${esc(k)}","s":${e.agentScore},"e":"${esc(e.explanation)}"}"""
    private val lineRe =
      """\{"k":"((?:[^"\\]|\\.)*)","s":(-?[0-9.Ee+-]+),"e":"((?:[^"\\]|\\.)*)"\}""".r
    private def parseLine(line: String): Option[(String, Entry)] =
      line.trim match {
        case lineRe(k, s, e) =>
          try Some((unesc(k), Entry(s.toDouble, unesc(e))))
          catch { case _: NumberFormatException => None }
        case _ => None // torn tail line from a crash -- skip
      }

    def get(key: String): Option[Entry] = Option(m.get(key))
    def put(key: String, e: Entry): Unit = synchronized {
      m.put(key, e)
      java.nio.file.Files.writeString(file, render(key, e) + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      ()
    }
    def size: Int = m.size()
    /** Rewrite the log to one line per live key (AOF-rewrite analog). */
    def compact(): Unit = synchronized {
      val tmp = dir.resolve("eval_cache.jsonl.tmp")
      val sb = new StringBuilder
      m.forEach((k, e) => { sb.append(render(k, e)).append('\n'); () })
      java.nio.file.Files.writeString(tmp, sb.toString)
      java.nio.file.Files.move(tmp, file,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }

    // load AFTER every val above is initialized (lineRe is used here)
    java.nio.file.Files.createDirectories(dir)
    if (java.nio.file.Files.exists(file)) {
      val it = java.nio.file.Files.lines(file)
      try it.forEach { line =>
        parseLine(line).foreach { case (k, e) => m.put(k, e) }
      } finally it.close()
    }
  }

  /** Backend selection shared by the CLI and HTTP apps: persistent
    * JSONL-backed when GRAFT_EVAL_CACHE_DIR is set (the reference's
    * Redis agent cache without the network service — survives across
    * processes; the same knob ConfigApp prints and /health probes),
    * in-memory LRU otherwise.
    */
  def backendFromEnv(env: String => Option[String] = sys.env.get): Backend =
    env("GRAFT_EVAL_CACHE_DIR")
      .map(d => new PersistentBackend(java.nio.file.Paths.get(d)): Backend)
      .getOrElse(new LruBackend())

  /** Candidate columns (beyond opening_slug/result/pgn) that the bundled
    * evaluator's prompt block renders -- all fold into the cache key so a
    * cached score can never go stale against a block change.
    */
  val blockColumns: Seq[String] = Seq("game_id", "white", "black",
    "played_on_str", "eco_code", "opening_name", "white_rating",
    "black_rating")

  /** Cache key for one (plan, candidate) pair. `candidateSlug` /
    * `candidateResult` are the candidate summary's opening_slug / result
    * ("" when absent), matching the reference key (agent_cache.ml:17-36);
    * `blockFields` carries the remaining [[blockColumns]] values (a
    * strictly finer key than the reference's -- finer can only cause an
    * extra miss, never a stale hit).
    */
  def key(plan: QueryIntent.Plan, pgn: String,
      candidateSlug: String = "", candidateResult: String = "",
      blockFields: Seq[String] = Nil): String = {
    val rating = plan.rating
    val opening = plan.filters.collect {
      case QueryIntent.MetadataFilter("opening" | "opening_slug", v) => v
    }.sorted.mkString(",")
    val result = plan.filters.collect {
      case QueryIntent.MetadataFilter("result", v) => v
    }.sorted.mkString(",")
    val parts = Seq(
      plan.cleanedText,
      plan.keywords.mkString(" "),
      plan.limit.toString,
      rating.whiteMin.fold("")(_.toString),
      rating.blackMin.fold("")(_.toString),
      rating.maxRatingDelta.fold("")(_.toString),
      opening,
      result,
      candidateSlug,
      candidateResult,
      pgn.take(pgnTruncateChars)) ++ blockFields
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.mkString("\u0000").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Wrap a reranker with the cache: only candidates whose key misses go
    * to the inner evaluator; fresh scores populate the cache. Candidate
    * frames are <= candidateMax rows (A1), so the split/merge runs on
    * driver-collected rows exactly like the reference's per-candidate
    * loop.
    */
  def cached(inner: Reranker, backend: Backend): Reranker = new Reranker {
    def scores(candidates: DataFrame, plan: QueryIntent.Plan): DataFrame = {
      val spark = candidates.sparkSession
      import spark.implicits._
      // candidate metadata columns are part of the key when present
      // (candidate frames from Reranker.apply carry them; bare test
      // frames may not). `pgn` is likewise optional: serving-page
      // candidate frames carry no pgn column (the inner AgentReranker
      // batch-fetches PGNs itself, R5) — keying without the text stays
      // SOUND here because game_id (always in the key via blockColumns)
      // is md5(source_file, index, raw_pgn): any pgn change changes the
      // game_id and therefore the key.
      // cast BEFORE coalescing: coalesce(int_col, "") resolves to the
      // numeric type under ANSI and fails casting "" at runtime — real
      // candidate frames carry int rating columns (the gate/spec frames
      // that existed before the serving wiring happened not to).
      def optCol(n: String): Column =
        if (candidates.columns.contains(n))
          coalesce(col(n).cast("string"), lit(""))
        else lit("")
      val rows = candidates.select(col("game_id"),
          optCol("pgn").as("pgn"),
          optCol("opening_slug").as("slug"), optCol("result").as("res"),
          array(blockColumns.map(optCol): _*).as("blk"))
        .as[(String, String, String, String, Seq[String])].collect()
      val keyed = rows.map { case (gid, pgn, slug, res, blk) =>
        (gid, key(plan, pgn, slug, res, blk))
      }
      val hits = keyed.flatMap { case (gid, k) =>
        backend.get(k).map(e => (gid, e.agentScore, e.explanation))
      }
      val missIds = keyed.collect {
        case (gid, _) if !hits.exists(_._1 == gid) => gid
      }.toSet
      EngineMetrics.agentCacheTotal.inc(Seq("hit"), hits.length.toDouble)
      EngineMetrics.agentCacheTotal.inc(Seq("miss"), missIds.size.toDouble)
      val fresh: Seq[(String, Double, String)] =
        if (missIds.isEmpty) Nil
        else {
          val missDf = candidates.where(col("game_id").isin(missIds.toSeq: _*))
          val scored = inner.scores(missDf, plan)
            .select(col("game_id"), col("agent_score"), col("explanation"))
            .as[(String, Double, String)].collect().toSeq
          val keyByGid = keyed.toMap
          scored.foreach { case (gid, s, ex) =>
            keyByGid.get(gid).foreach(k => backend.put(k, Entry(s, ex)))
          }
          scored
        }
      (hits.toSeq ++ fresh)
        .toDF("game_id", "agent_score", "explanation")
    }
  }
}
