package graft.core

import org.apache.spark.sql.SparkSession

/** Per-dependency health probes with latency, mirroring the reference's
  * check protocol (lib/core/health.ml: run_probe times each check and
  * sanitizes details; summary_status is error if a REQUIRED check is
  * unhealthy, degraded if any optional one is, ok otherwise; each check
  * serializes as {name, status, required, latency_ms, detail}).
  *
  * The graft engine's dependencies are storage-shaped, not service-shaped
  * (no Postgres/Qdrant/Redis): the probes check that the parquet tables
  * are readable, vectors are present for hybrid ranking, and the optional
  * eval-cache directory is writable.
  */
object Health {

  final case class Check(name: String, required: Boolean,
      latencyMs: Double, status: String, detail: Option[String])

  final case class Summary(status: String, checks: Seq[Check]) {
    /** Reference config_command exit protocol (config_command.ml run():
      * fatal -> exit 1, warnings non-empty -> exit 2, else 0). In the
      * reference a dependency that is CONFIGURED but broken is fatal
      * regardless of being "optional" (service_health.ml marks every
      * Unavailable check fatal=true), while an UNSET optional dependency
      * is Skipped and only produces the exit-2 warning path. So: any
      * errored check -> 1; else any skipped check -> 2; else 0.
      */
    def exitCode: Int =
      if (checks.exists(_.status == "error")) 1
      else if (checks.exists(_.status == "skipped")) 2
      else 0
  }

  sealed trait Probe
  final case class Ok(detail: Option[String] = None) extends Probe
  final case class Bad(reason: String) extends Probe
  final case class Skip(reason: String) extends Probe

  /** Time one probe; exceptions become an unhealthy state with the
    * sanitized message (run_probe, health.ml:23-34).
    */
  def runProbe(name: String, required: Boolean)(f: => Probe): Check = {
    val t0 = System.nanoTime()
    val (status, detail) =
      (try f
      catch { case e: Throwable =>
        Bad(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
      }) match {
        case Ok(d) => ("ok", d.map(Sanitizer.sanitize))
        case Bad(r) => ("error", Some(Sanitizer.sanitize(r)))
        case Skip(r) => ("skipped", Some(Sanitizer.sanitize(r)))
      }
    Check(name, required, (System.nanoTime() - t0) / 1e6, status, detail)
  }

  def summarize(checks: Seq[Check]): Summary = {
    val status =
      if (checks.exists(c => c.required && c.status == "error")) "error"
      else if (checks.exists(_.status == "error")) "degraded"
      else "ok"
    Summary(status, checks)
  }

  /** The engine's dependency checks over a tables directory. Optional
    * vectors: the hybrid executor falls back to metadata-only ranking
    * without them (documented fallback, not an outage). The eval-cache
    * check is skipped unless GRAFT_EVAL_CACHE_DIR is set (same contract
    * as the reference's AGENT_CACHE_REDIS_URL: unset = disabled).
    */
  def engineChecks(spark: SparkSession, dir: String,
      env: String => Option[String] = sys.env.get): Seq[Check] = Seq(
    runProbe("tables", required = true) {
      val games = spark.read.parquet(s"$dir/games").count()
      val players = spark.read.parquet(s"$dir/players").count()
      Ok(Some(s"games=$games players=$players"))
    },
    runProbe("vectors", required = false) {
      try {
        val v = spark.read.parquet(s"$dir/vectors")
        val dims = v.selectExpr("size(embedding)").head().getInt(0)
        Ok(Some(s"vectors=${v.count()} dims=$dims"))
      } catch { case _: org.apache.spark.sql.AnalysisException =>
        Skip("no vectors table (hybrid falls back to metadata ranking)")
      }
    },
    runProbe("eval_cache", required = false) {
      env("GRAFT_EVAL_CACHE_DIR") match {
        case None => Skip("GRAFT_EVAL_CACHE_DIR not set")
        case Some(d) =>
          val p = java.nio.file.Paths.get(d)
          java.nio.file.Files.createDirectories(p)
          val probe = java.nio.file.Files.createTempFile(p, ".health", "")
          java.nio.file.Files.delete(probe)
          Ok(Some(s"writable dir=$d"))
      }
    })

  /** `[health] %-13s %s%s` status line (service_health.ml:21-29). */
  def statusLine(c: Check): String = {
    val detail = c.detail.map(d => s" ($d)").getOrElse("")
    f"[health] ${c.name}%-13s ${c.status}$detail"
  }
}
