package graft.query

/** A6 agent telemetry: per-evaluation latency / token / cost accounting
  * (reference lib/query/agent_telemetry.ml:1-107). Cost rates come from
  * the same env vars the reference reads (AGENT_COST_INPUT_PER_1K,
  * AGENT_COST_OUTPUT_PER_1K, AGENT_COST_REASONING_PER_1K); malformed or
  * negative values are ignored with a warning, like the reference's
  * parse_rate.
  *
  * The sink is pluggable: production logs one structured line per
  * evaluation to stderr (the reference's eprintf JSON), tests capture
  * records in a buffer.
  */
object AgentTelemetry {

  val questionTruncateChars = 160 // agent_telemetry.ml:10-14

  final case class Tokens(input: Option[Long], output: Option[Long],
      reasoning: Option[Long])

  final case class Rates(inputPer1k: Option[Double],
      outputPer1k: Option[Double], reasoningPer1k: Option[Double])

  object Rates {
    /** Parse one $-per-1k-tokens rate; reject non-floats and negatives
      * (agent_telemetry.ml:22-38).
      */
    def parseRate(name: String, raw: Option[String],
        warn: String => Unit = System.err.println): Option[Double] =
      raw.map(_.trim).filter(_.nonEmpty).flatMap { t =>
        t.toDoubleOption match {
          case Some(v) if v >= 0 => Some(v)
          case Some(_) =>
            warn(s"[agent-telemetry] ignoring $name=$t (must be >= 0)"); None
          case None =>
            warn(s"[agent-telemetry] ignoring $name=$t (expected float)"); None
        }
      }

    def fromEnv(env: String => Option[String] = sys.env.get): Rates = Rates(
      parseRate("AGENT_COST_INPUT_PER_1K", env("AGENT_COST_INPUT_PER_1K")),
      parseRate("AGENT_COST_OUTPUT_PER_1K", env("AGENT_COST_OUTPUT_PER_1K")),
      parseRate("AGENT_COST_REASONING_PER_1K",
        env("AGENT_COST_REASONING_PER_1K")))
  }

  final case class Cost(total: Option[Double], input: Option[Double],
      output: Option[Double], reasoning: Option[Double]) {
    def isEmpty: Boolean =
      total.isEmpty && input.isEmpty && output.isEmpty && reasoning.isEmpty
  }

  /** cost = rate * tokens / 1000 per component; total only when some
    * component priced and the sum is positive (agent_telemetry.ml:47-68).
    */
  def cost(tokens: Tokens, rates: Rates): Cost = {
    def comp(t: Option[Long], r: Option[Double]): Option[Double] =
      for (tv <- t; rv <- r) yield rv * tv.toDouble / 1000.0
    val in = comp(tokens.input, rates.inputPer1k)
    val out = comp(tokens.output, rates.outputPer1k)
    val rsn = comp(tokens.reasoning, rates.reasoningPer1k)
    val components = Seq(in, out, rsn).flatten
    val total = if (components.isEmpty) None
      else Some(components.sum).filter(_ > 0)
    Cost(total, in, out, rsn)
  }

  def truncateQuestion(text: String): String = {
    val cleaned = text.trim
    if (cleaned.length <= questionTruncateChars) cleaned
    else cleaned.take(questionTruncateChars) + "..."
  }

  final case class Record(
      timestampMs: Long,
      question: String,
      candidateCount: Int,
      evaluated: Int,
      reasoningEffort: String,
      latencyMs: Double,
      tokens: Tokens,
      cost: Cost)

  trait Sink { def log(r: Record): Unit }

  /** One structured line per evaluation on stderr (the reference's
    * eprintf of Yojson).
    */
  object StderrSink extends Sink {
    private def num(v: Option[Double]): String =
      v.map(_.toString).getOrElse("null")
    private def int(v: Option[Long]): String =
      v.map(_.toString).getOrElse("null")
    def log(r: Record): Unit = {
      val q = r.question.replace("\\", "\\\\").replace("\"", "\\\"")
      val costJson = if (r.cost.isEmpty) "null"
        else s"""{"total":${num(r.cost.total)},"input":${num(r.cost.input)},""" +
          s""""output":${num(r.cost.output)},"reasoning":${num(r.cost.reasoning)}}"""
      System.err.println(
        s"""[agent-telemetry] {"event":"agent_evaluation",""" +
        s""""timestamp_ms":${r.timestampMs},"question":"$q",""" +
        s""""candidate_count":${r.candidateCount},"evaluated":${r.evaluated},""" +
        s""""reasoning_effort":"${r.reasoningEffort}",""" +
        s""""latency_ms":${r.latencyMs},""" +
        s""""tokens":{"input":${int(r.tokens.input)},""" +
        s""""output":${int(r.tokens.output)},""" +
        s""""reasoning":${int(r.tokens.reasoning)}},"cost":$costJson}""")
    }
  }

  /** Test sink: records in memory. */
  final class BufferSink extends Sink {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Record]
    def log(r: Record): Unit = synchronized { buf += r; () }
    def records: Seq[Record] = synchronized(buf.toSeq)
  }
}
