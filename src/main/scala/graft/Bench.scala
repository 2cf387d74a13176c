package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every gate query on SPARK_GRAFT_SF_DIR plus a
  * chessmate-workload section (ingest games/sec, embedding positions/sec,
  * hybrid query latency -- the BASELINE.md metrics), and prints ONE JSON
  * line for the driver.
  */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-work single-thread CPU canary: the wall time of a constant
    * 1e9-iteration integer loop. On a quiet host this is a stable
    * machine constant; a co-tenant CPU burst inflates it proportionally,
    * so a bench record whose canary is far above the repo's BASELINE.md
    * canary is KNOWN-contaminated without re-running anything (round 7's
    * driver record manufactured three phantom 5-15x regressions that a
    * canary would have explained).
    */
  private def cpuCanary(): Double = {
    var x = 0L
    val t0 = System.nanoTime()
    var i = 0L
    while (i < 1000000000L) { x = x * 6364136223846793005L + i; i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    sec
  }

  /** ALL-CORE companion to [[cpuCanary]]: `threads` workers each run a
    * fixed loop; the wall is the slowest worker. The single-thread
    * canary has a blind spot this closes: a co-tenant burst that leaves
    * one core free reads "quiet" on cpuCanary while every 32-thread
    * Spark stage runs at a fraction of the machine -- exactly the
    * signature of the r10/r11 driver records, where llm_chunking /
    * llm_dup_clusters (alphabetically adjacent) degraded 8-9x between
    * two quiet single-thread canaries. quiet-host value scales with
    * the per-thread loop (2.5e8 iters ~ 0.33s); a value far above the
    * committed baseline = multi-core contention during the window.
    */
  private def mcCanary(threads: Int): Double = {
    val t0 = System.nanoTime()
    val pool = (1 to threads).map { t =>
      val th = new Thread(() => {
        var x = t.toLong
        var i = 0L
        while (i < 250000000L) { x = x * 6364136223846793005L + i; i += 1 }
        if (x == 42L) System.err.println("")
      })
      th.start(); th
    }
    pool.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // test tables are single-row-group files; allow sub-file splits
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.adaptive.enabled", "true")
      // The generated-code cache defaults to 100 entries; a 123-gate
      // sweep churns it, so every pass-2 (soak) run re-pays janino
      // compilation (~0.3s/query -- run 2's soak read a uniform 1.3x
      // over warm with FLAT gc_offsets, the codegen-eviction signature,
      // not real engine degradation). A steady-state service runs a
      // bounded set of plans that fits its cache; size the cache to
      // this harness's plan count so soak measures the engine.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warmResults = scala.collection.mutable.LinkedHashMap[String, Double]()
    val soakResults = scala.collection.mutable.LinkedHashMap[String, Double]()
    val tOffsets = scala.collection.mutable.LinkedHashMap[String, Double]()
    val gcOffsets = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warmMin = scala.collection.mutable.LinkedHashMap[String, Double]()
    val benchT0 = System.nanoTime()
    def sinceStart(): Double = (System.nanoTime() - benchT0) / 1e9
    // Cumulative driver-JVM GC seconds. Recorded at every gate start so
    // an anomaly WINDOW in the record (a contiguous alphabetical span of
    // slow gates, as in r10/r11) can be attributed: if the GC column
    // jumps across the window, the degradation is in-JVM heap pressure;
    // if it is flat, the stall was outside the JVM (host contention) --
    // the two theories the r11 postmortem could not separate.
    def gcSec(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    }

    // 0) Warmup: materialize the shared chess fixture tables and run one
    // trivial sf-table action, so the alphabetically-first gate query does
    // not absorb fixture ingest + JIT warmup (r4/r5 benches mischarged
    // 3-9s to whichever query ran first).
    val warmupSec = time {
      // ALL four fixture frames (chess_agent_rerank, alphabetically
      // first, otherwise absorbs positions+vectors materialization),
      // one sf-table action, and one window-function action (JITs the
      // window/codegen path the first gate's rank() would otherwise pay)
      val (t, v) = graft.gate.ChessQueries.data(spark)
      t.games.count(); t.players.count(); t.positions.count(); v.count()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
      import org.apache.spark.sql.expressions.Window
      spark.range(100).toDF("id")
        .withColumn("r", org.apache.spark.sql.functions.row_number()
          .over(Window.orderBy(org.apache.spark.sql.functions.col("id"))))
        .count()
    }

    val canaryPre = cpuCanary()
    val mcPre = mcCanary(cpus.toInt)

    // 1) Gate queries (SURVEY §2 inventory) on the sf tables: one cold
    // run (first execution this session), then warm = MEDIAN OF 3
    // repeats (shuffle files + broadcast reuse + fully JIT'd code
    // paths). Median, not a single repeat: a one-off co-tenant CPU burst
    // on a shared host lands in at most one of three consecutive runs,
    // so it can shift the median by at most the quiet-run spread --
    // round 7's single-repeat warm column archived 5-15x phantom
    // regressions that evaporated on a quiet host. Warm is the number to
    // compare across rounds; cold-warm gaps localize setup cost. A
    // failed query records -elapsed (negative sentinel) so a broken
    // query can't masquerade as a fast one in the bench JSON.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var failed = false
      def run(): Double = time {
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
      }
      // per-gate start offset: a co-tenant burst in a future driver
      // record localizes to a wall-clock window, and this maps windows
      // to gates (r11's 8x llm_chunking..llm_dup_clusters anomaly was
      // alphabetically contiguous -- i.e. a time window, not a plan)
      tOffsets(name) = sinceStart()
      gcOffsets(name) = gcSec()
      // release the operator-internal scoped persists BETWEEN runs, not
      // once per gate (r22, verdict item 2): Spark's CacheManager
      // matches canonicalized plans, so a warm repeat's freshly-built
      // frame resolves to the cold run's already-materialized
      // InMemoryRelation -- every Caches.scoped pin would otherwise move
      // its subtree OUT of the warm timed region, inflating warm/min for
      // pinned gates (the r21 sketch pins read warm 1.4x better while
      // cold got worse -- exactly this artifact). Releasing after each
      // run makes every run pay its own persist; dropping them between
      // gates also stops a 160+-gate session from evicting the warm
      // fixture caches. The release itself is outside the timed region
      // (unpersist is non-blocking bookkeeping).
      def runReleased(): Double = {
        val s = run(); graft.core.Caches.releaseScoped(); s
      }
      val cold = runReleased()
      val reps = if (failed) Seq(cold)
        else Seq(runReleased(), runReleased(), runReleased())
      val warm = if (failed) cold else reps.sorted.apply(1)
      results(name) = if (failed) -cold else cold
      warmResults(name) = if (failed) -warm else warm
      // min-of-3 alongside the median: when a contention window spans
      // two of the three repeats the median reads slow even though the
      // operator is fine -- the min is the honest per-gate capability
      // bound (it cannot be inflated by a burst, only by the plan).
      warmMin(name) = if (failed) -cold else reps.min
    }

    // 1b) SOAK: a SECOND full sweep (one run per gate) in the same JVM.
    // If the same session really degrades over time (broadcast/GC
    // accumulation), pass 2 must be slower than pass 1's warm column;
    // if pass 2 matches pass 1, a slow gate in pass 1 was external
    // (host contention), proven without the driver in the loop.
    val mcMid = mcCanary(cpus.toInt)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var failed = false
      tOffsets(name + "#2") = sinceStart()
      gcOffsets(name + "#2") = gcSec()
      val sec = time {
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] soak $name FAILED: ${e.getMessage}")
        }
      }
      soakResults(name) = if (failed) -sec else sec
      graft.core.Caches.releaseScoped()
    }

    // 1c) RETRY pass — contention-proofing the recorded warm column.
    // The r13 driver record shipped gates reading warm >> min (5.75 s vs
    // 0.71 s) because a co-tenant burst spanned 2 of the 3 median
    // repeats; the record survived scrutiny only because min/soak
    // columns existed. Unattended rule: any gate whose warm median
    // exceeds RETRY_K x its min-of-3 (and by >0.25 s absolute — tiny
    // gates jitter) is re-measured with 3 fresh runs, and the recorded
    // warm becomes min(original, retry median). A genuine plan
    // regression reproduces in the retry; a burst does not.
    val retryK = 1.4
    val retried = scala.collection.mutable.ListBuffer[String]()
    val queryByName = SparkEntry.queries
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val warm = warmResults(name); val mn = warmMin(name)
      def rerun(): Double =
        try { val s = time(queryByName(name)(spark, sfDir).count())
          graft.core.Caches.releaseScoped(); s }
        catch { case _: Throwable => Double.MaxValue } // keep original
      if (warm > 0 && mn > 0 && warm > retryK * mn && warm - mn > 0.25) {
        retried += name
        val reps = Seq.fill(3)(rerun()).sorted
        if (reps(1) < warm) warmResults(name) = reps(1)
        warmMin(name) = math.min(mn, reps.head)
      }
      // same rule for the single-run soak column (a burst in pass 2
      // would otherwise fabricate a "session degrades over time" story)
      val soak = soakResults(name)
      if (soak > 0 && warmMin(name) > 0 && soak > retryK * warmMin(name) &&
        soak - warmMin(name) > 0.25) {
        val again = rerun()
        if (again < soak) soakResults(name) = again
      }
    }

    // 2) Chessmate workload (BASELINE.md metrics), on a synthetic corpus:
    //    the 77-ply fixture replicated with distinct headers.
    // COST-ATTRIBUTION NOTE: at the default 500 games this charges
    // fixture-corpus construction + Spark job setup to chess_ingest, so
    // the games/sec figure here is the TOY-SIZE floor (~400-500/s);
    // amortized throughput at 20k games is ~1,500 games/s and embedding
    // ~160k positions/s -- the stress rows recorded in BASELINE.md. Set
    // SPARK_GRAFT_BENCH_GAMES=20000 to reproduce those numbers with this
    // same harness.
    import spark.implicits._
    val nGames = sys.env.getOrElse("SPARK_GRAFT_BENCH_GAMES", "500").toInt
    val base = graft.core.Fixtures.extendedSampleGame
    val corpus = (1 to nGames).map { i =>
      (s"bench_$i.pgn", base.replace(
        "[Event \"Interpolis International Tournament\"]",
        s"""[Event "Bench $i"]"""))
    }
    val files = spark.createDataset(corpus)

    var positionCount = 0L
    var t: graft.ingest.IngestJob.ChessTables = null
    val ingestSec = time {
      t = graft.ingest.IngestJob.tables(spark,
        graft.ingest.IngestJob.gamesFromText(spark, files),
        persistRecords = true)
      t.games.cache(); t.players.cache(); t.positions.cache()
      positionCount = t.positions.count()
      t.games.count(); t.players.count()
    }
    val embedder = graft.embed.DeterministicEmbedder(dims = 256)
    var vectors: org.apache.spark.sql.DataFrame = null
    val embedSec = time {
      vectors = graft.embed.VectorsJob.build(spark, t.games, t.players,
        t.positions, embedder)
      vectors.cache()
      vectors.count()
    }
    val plan = graft.query.QueryIntent.analyse(graft.query.QueryIntent
      .Request("find top 5 games where white is rated at least 2500"))
    // summaries materialized once (the reference serves queries from a
    // warm, indexed game_summary view; this is the Spark analog).
    val summaries = graft.query.HybridExecutor.summaries(t.games, t.players)
    summaries.cache(); summaries.count()
    val queryTimes = (1 to 5).map { _ =>
      time {
        graft.query.HybridExecutor.execute(spark,
          graft.query.HybridExecutor.Tables(t.games, t.players, Some(vectors),
            summariesPrebuilt = Some(summaries)),
          plan, embedder).results.collect()
      }
    }.sorted

    // Batch-amortized hybrid serving: 10 distinct plans through ONE
    // collect action (+1 batched totals action) via executeBatch. The
    // per-query p50 above carries the full fixed Spark per-action cost
    // every time; the amortized figure divides that cost by the batch --
    // the honest batch-engine analog of the reference's online
    // throughput (~110 ms/query median). Correctness is asserted per
    // run: batch rows must equal per-query rows or the metric records a
    // negative sentinel.
    val batchPlans = Seq(
      "find top 5 games where white is rated at least 2500",
      "show black wins",
      "english opening games",
      "kingside attack in the endgame",
      "best games after 1990",
      "games where black is rated at least 2400",
      "queens gambit declined",
      "tactical middlegame sacrifices",
      "show draws",
      "najdorf sicilian games").map(q =>
      graft.query.QueryIntent.analyse(
        graft.query.QueryIntent.Request(q, Some(5))))
    val ht = graft.query.HybridExecutor.Tables(t.games, t.players,
      Some(vectors), summariesPrebuilt = Some(summaries))
    graft.query.HybridExecutor.executeBatch(spark, ht, batchPlans,
      embedder) // warm the branch plans
    var batchResults: Seq[graft.query.HybridExecutor.Execution] = null
    val batchSec = time {
      batchResults = graft.query.HybridExecutor.executeBatch(spark, ht,
        batchPlans, embedder)
    }
    val batchMatches = batchPlans.zip(batchResults).forall {
      case (plan, b) =>
        val s = graft.query.HybridExecutor.execute(spark, ht, plan, embedder)
        b.total == s.total &&
          b.results.collect().toSeq == s.results.collect().toSeq
    }

    results("chess_ingest") = ingestSec
    results("chess_embed") = embedSec
    results("chess_query_p50") = queryTimes(queryTimes.length / 2)
    val total = results.values.sum // seconds only; rates appended after
    val totalWarm = warmResults.values.sum +
      ingestSec + embedSec + queryTimes(queryTimes.length / 2)
    results("chess_ingest_games_per_sec") = nGames / ingestSec
    results("chess_embed_positions_per_sec") = positionCount / embedSec
    results("chess_query_batch10_sec") = batchSec
    results("chess_query_batch10_amortized") =
      if (batchMatches) batchSec / batchPlans.length
      else -batchSec / batchPlans.length // sentinel: rows diverged

    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + f"\":$v%.4f" }.mkString("{", ",", "}")
    def jesc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    // Engine counters (cache hits, breaker trips, per-stage totals) so
    // rounds can diff behavior, not just wall times.
    val metrics = graft.core.Metrics.default.snapshot
      .map { case (k, v) => "\"" + jesc(k) + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    // canary_sec = min(pre, post): both are the same fixed work, so the
    // smaller one is the closer bound on the machine's quiet speed; a
    // large pre/post GAP additionally localizes WHEN contention hit.
    val canaryPost = cpuCanary()
    val mcPost = mcCanary(cpus.toInt)
    val canarySec = math.min(canaryPre, canaryPost)
    val mcSec = math.min(mcPre, math.min(mcMid, mcPost))
    val totalSoak = soakResults.values.sum

    // CONTENDED verdict: the record is self-judging. Quiet-host canary
    // baselines are committed knowledge (BASELINE.md; overridable per
    // host via env); contention shows as (a) an inflated fixed-work
    // canary, (b) gates still reading warm >> min AFTER the retry pass,
    // or (c) the two full sweeps (warm vs soak) disagreeing in total.
    // Any hit prints a LOUD verdict and lands in the JSON, so an
    // unattended end-of-round record can't silently masquerade as an
    // engine regression (or as a clean capability claim).
    val quietCanary = sys.env.getOrElse("SPARK_GRAFT_CANARY_QUIET", "1.25")
      .toDouble
    val quietMc = sys.env.getOrElse("SPARK_GRAFT_CANARY_MC_QUIET", "0.35")
      .toDouble
    val contendedReasons = scala.collection.mutable.ListBuffer[String]()
    if (canarySec > 1.10 * quietCanary)
      contendedReasons += f"cpu canary $canarySec%.3f s > 1.10x quiet $quietCanary%.2f s"
    if (mcSec > 1.30 * quietMc)
      contendedReasons += f"mc canary $mcSec%.3f s > 1.30x quiet $quietMc%.2f s"
    val residual = warmResults.collect { case (n, w)
      if w > 0 && warmMin(n) > 0 && w > 1.5 * warmMin(n) &&
        w - warmMin(n) > 0.5 => n }.toSeq
    if (residual.nonEmpty)
      contendedReasons += s"${residual.size} gate(s) warm >> min after retry: " +
        residual.take(5).mkString(", ")
    val gateWarmSum = warmResults.values.filter(_ > 0).sum
    val gateSoakSum = soakResults.values.filter(_ > 0).sum
    if (gateWarmSum > 0 && gateSoakSum > 0) {
      val rel = math.abs(gateWarmSum - gateSoakSum) /
        math.min(gateWarmSum, gateSoakSum)
      if (rel > 0.12)
        contendedReasons += f"warm/soak totals disagree ${rel * 100}%.0f%% " +
          f"($gateWarmSum%.1f s vs $gateSoakSum%.1f s)"
    }
    val contended = contendedReasons.nonEmpty
    if (contended)
      System.err.println("[bench] VERDICT: CONTENDED — " +
        contendedReasons.mkString("; "))
    else
      System.err.println(f"[bench] VERDICT: quiet (canary $canarySec%.3f s," +
        f" warm/soak $gateWarmSum%.1f/$gateSoakSum%.1f s," +
        f" ${retried.size} retried)")
    val contendedJson = contendedReasons.map(r => "\"" + jesc(r) + "\"")
      .mkString("[", ",", "]")
    val retriedJson = retried.map(r => "\"" + r + "\"")
      .mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(results)},"queries_warm":${jmap(warmResults)},"queries_soak":${jmap(soakResults)},"queries_warm_min":${jmap(warmMin)},"total_warm":$totalWarm%.3f,"total_soak":$totalSoak%.3f,"t_offsets":${jmap(tOffsets)},"gc_offsets":${jmap(gcOffsets)},"gc_total_sec":${gcSec()}%.3f,"warmup_sec":$warmupSec%.3f,"canary_sec":$canarySec%.3f,"canary_pre_sec":$canaryPre%.3f,"canary_post_sec":$canaryPost%.3f,"canary_mc_sec":$mcSec%.3f,"canary_mc_pre_sec":$mcPre%.3f,"canary_mc_mid_sec":$mcMid%.3f,"canary_mc_post_sec":$mcPost%.3f,"contended":$contended,"contended_reasons":$contendedJson,"retried":$retriedJson,"engine_metrics":$metrics,"sf":"$sfDir"}"""
    // stdout gets a COMPACT record: the driver's wrapper keeps only a
    // bounded tail of output and has recorded parsed:null whenever a
    // full per-query map rode the line (r9-r11 -- even the 123-entry
    // warm map alone overflowed the window). Headline metrics ONLY here
    // (~400 bytes); every per-query number lives in BENCH_FULL.json.
    val compact = results.filter(_._1.startsWith("chess_"))
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jmap(compact)},"total_warm":$totalWarm%.3f,"total_soak":$totalSoak%.3f,"canary_sec":$canarySec%.3f,"canary_mc_sec":$mcSec%.3f,"contended":$contended,"contended_reasons":$contendedJson,"retried_n":${retried.size},"sf":"$sfDir"}""")
    // Persist the COMPLETE record to a repo file, so every per-query
    // number is independently checkable (the stdout tail has truncated
    // past rounds' records: r8's llm_pipeline2 time was unverifiable
    // from the artifact).
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
