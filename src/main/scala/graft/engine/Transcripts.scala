package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One conversation turn — the engine's input row, schema exactly per
  * the north rule's input hint (BASELINE.json `input_hint`). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable
    ts: java.sql.Timestamp)

/**
 * Deterministic synthetic transcript tables (no external data; single
 * fixed seed). Conversation sizes are Zipf-skewed so hot-conversation
 * skew handling (salting / AQE) is actually exercised; inter-turn gaps
 * are log-uniform, giving the uneven cadence the reference crate is
 * built for (cf. /root/reference/test-util/src/lc_data/csv_parser.rs —
 * irregularly sampled light curves).
 *
 * Generation is distributed and partition-order independent: every
 * conversation derives its own RNG stream from (seed, convIdx) via
 * SplittableRandom, so the same (nConvs, seed) always yields the same
 * table regardless of parallelism — a correctness requirement for the
 * resume-from-snapshot tests and the two-cluster-size benchmark.
 */
object Transcripts {

  /** Engine epoch: 2024-01-01T00:00:00Z. Series time `t` is seconds
    * since this epoch so double-precision round-off stays ~1e-10 s. */
  val EpochSeconds: Long = 1704067200L

  private val Vocab: Array[String] = Array(
    "plan", "step", "tool", "call", "result", "think", "check", "run",
    "read", "write", "query", "table", "join", "group", "agg", "scan",
    "filter", "sort", "merge", "spark", "shuffle", "partition", "skew",
    "commit", "retry", "error", "ok", "done", "next", "loop", "batch",
    "stream", "window", "bucket", "tier", "rollup", "series", "point")

  private val Roles = Array("user", "assistant", "tool", "system")
  private val Tools = Array("search", "calculator", "browser", "compiler", "null")

  /** Zipf-ish conversation length: rank-independent power-law draw so
    * a few conversations are 100-1000x the median (hot keys). */
  private def convLength(rng: java.util.SplittableRandom, meanTurns: Int): Int = {
    val u = rng.nextDouble()
    // P(L > x) ~ x^-1.2, clamped; median ~ meanTurns/2
    val base = meanTurns / 2.0
    val len = base / math.pow(1.0 - u, 1.0 / 1.2) - base + 2.0
    math.min(len, meanTurns * 200.0).toInt.max(2)
  }

  /** Deterministic Dataset[Turn]: `nConvs` conversations, Zipf-skewed
    * sizes around `meanTurns`, log-uniform inter-turn gaps in
    * [0.5 s, 10 min]. */
  def synthetic(spark: SparkSession, nConvs: Long, meanTurns: Int = 40,
      seed: Long = 42L, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val rangeDf =
      if (partitions > 0) spark.range(0L, nConvs, 1L, partitions)
      else spark.range(0L, nConvs)
    rangeDf.as[Long].flatMap { convIdx =>
      val rng = new java.util.SplittableRandom(seed * 1000003L + convIdx)
      val n = convLength(rng, meanTurns)
      val convId = f"c$convIdx%09d"
      // conversations start spread over ~30 days
      var tMicros = (EpochSeconds + (convIdx * 2654435761L) % (30L * 86400)) * 1000000L
      (0 until n).map { i =>
        val role =
          if (i == 0) "system"
          else if (rng.nextDouble() < 0.12) "tool"
          else Roles(i % 2) // user/assistant alternating
        val tool = if (role == "tool") Tools(rng.nextInt(4)) else null
        val nWords = 3 + rng.nextInt(38)
        val sb = new StringBuilder
        var k = 0
        while (k < nWords) {
          if (k > 0) sb.append(' ')
          sb.append(Vocab(rng.nextInt(Vocab.length)))
          k += 1
        }
        val turn = Turn(convId, i, role, sb.toString, tool,
          new java.sql.Timestamp(tMicros / 1000L))
        // log-uniform dt in [0.5, 600] seconds, micro resolution
        val dt = math.exp(math.log(0.5) + rng.nextDouble() * (math.log(600.0) - math.log(0.5)))
        tMicros += (dt * 1e6).toLong
        turn
      }
    }
  }

  /** Derive the (conv_id, turn_idx, t, m, w) series from a transcript
    * table: t = seconds since engine epoch, m = length(text), w = 1
    * (unit weights — the reference's `new_without_weight` path,
    * /root/reference/src/data/time_series.rs:110-136). */
  def series(turns: DataFrame): DataFrame =
    turns.select(
      col("conv_id"),
      col("turn_idx"),
      (unix_micros(col("ts").cast("timestamp")) / 1000000.0 - EpochSeconds.toDouble).as("t"),
      length(col("text")).cast("double").as("m"),
      lit(1.0).as("w"))

  /** Transcript-shaped view of the driver's `events` test table so the
    * engine's tier queries are DuckDB-verifiable: conv_id = user id,
    * role = event_type (passband analogue), text = props JSON,
    * turn_idx = stable per-conv sequence. */
  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Partition the turn-index window by the derived conv_id COLUMN,
    // not by user_id (guide §2.4 "share one exchange"): the mapping is
    // 1:1 so row_number is identical, but every downstream engine
    // operator keys on conv_id — with the window's exchange already
    // hash(conv_id), the tier aggregations and the sessionize chunk
    // aggregate satisfy their ClusteredDistribution without a SECOND
    // corpus shuffle. conv_id must be projected BEFORE the window so
    // the window partitions by the attribute itself (partitioning by
    // the concat expression makes the planner extract a hidden `_w0`
    // alias, and the partitioning dies with `_w0` at the next
    // projection — measured; by-attribute keying removes one Exchange
    // from every q_tr_* plan).
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("event_id"))
    spark.read.parquet(s"$dir/events.parquet")
      .select(
        concat(lit("c"), col("user_id")).as("conv_id"),
        col("event_id"),
        col("event_type").as("role"),
        col("props").as("text"),
        col("ts").cast("timestamp").as("ts"))
      .select(
        col("conv_id"),
        (row_number().over(w) - 1).as("turn_idx"),
        col("role"),
        col("text"),
        lit(null: String).as("tool"),
        col("ts"))
  }
}
