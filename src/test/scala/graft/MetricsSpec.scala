package graft

import graft.core.Metrics
import graft.query.EngineMetrics

/** P6 metrics registry: instrument semantics + Prometheus exposition
  * format + engine wiring (executor / cache / agent instruments advance
  * as the other suites drive those paths; here we drive them directly).
  */
class MetricsSpec extends SparkSpec {

  test("counter: labeled cells accumulate; negative increments rejected") {
    val r = new Metrics.Registry
    val c = r.counter("t_requests_total", "help text", Seq("route", "status"))
    c.inc(Seq("q", "ok"))
    c.inc(Seq("q", "ok"), 2.0)
    c.inc(Seq("q", "error"))
    assert(c.value(Seq("q", "ok")) == 3.0)
    assert(c.value(Seq("q", "error")) == 1.0)
    assert(c.value(Seq("q", "missing")) == 0.0)
    intercept[IllegalArgumentException](c.inc(Seq("q", "ok"), -1.0))
    intercept[IllegalArgumentException](c.inc(Seq("q"), 1.0)) // arity
  }

  test("histogram: cumulative buckets, sum and count") {
    val r = new Metrics.Registry
    val h = r.histogram("t_latency_seconds", "h", Nil,
      buckets = Seq(0.1, 1.0, 10.0))
    Seq(0.05, 0.5, 5.0, 50.0).foreach(h.observe(_))
    assert(h.count() == 4)
    assert(math.abs(h.sum() - 55.55) < 1e-9)
    val text = h.render
    assert(text.contains("""t_latency_seconds_bucket{le="0.1"} 1"""))
    assert(text.contains("""t_latency_seconds_bucket{le="1"} 2"""))
    assert(text.contains("""t_latency_seconds_bucket{le="10"} 3"""))
    assert(text.contains("""t_latency_seconds_bucket{le="+Inf"} 4"""))
    assert(text.contains("t_latency_seconds_count 4"))
  }

  test("render: exposition format with HELP/TYPE headers, escaping") {
    val r = new Metrics.Registry
    val c = r.counter("t_total", "counts things", Seq("k"))
    c.inc(Seq("va\"l\\x"))
    val g = r.gauge("t_state", "breaker")
    g.set(1.0)
    val text = r.render
    assert(text.contains("# HELP t_total counts things"))
    assert(text.contains("# TYPE t_total counter"))
    assert(text.contains("t_total{k=\"va\\\"l\\\\x\"} 1"))
    assert(text.contains("# TYPE t_state gauge"))
    assert(text.contains("t_state 1"))
    intercept[IllegalArgumentException](r.counter("t_total", "dup", Nil))
  }

  test("engine wiring: a hybrid execution advances request metrics") {
    import spark.implicits._
    val before = EngineMetrics.requestsTotal.value(Seq("hybrid", "ok"))
    val latBefore = EngineMetrics.requestLatency.count(Seq("hybrid"))
    val files = spark.createDataset(graft.core.Fixtures.all)
    val t = graft.ingest.IngestJob.tables(spark,
      graft.ingest.IngestJob.gamesFromText(spark, files))
    val plan = graft.query.QueryIntent.analyse(
      graft.query.QueryIntent.Request("metrics probe", Some(5)))
    graft.query.HybridExecutor.execute(spark,
      graft.query.HybridExecutor.Tables(t.games, t.players, None), plan)
    assert(EngineMetrics.requestsTotal.value(Seq("hybrid", "ok")) == before + 1)
    assert(EngineMetrics.requestLatency.count(Seq("hybrid")) == latBefore + 1)
    val text = Metrics.default.render
    assert(text.contains("chessmate_api_requests_total"))
    assert(text.contains("chessmate_api_request_duration_seconds_bucket"))
  }
}
