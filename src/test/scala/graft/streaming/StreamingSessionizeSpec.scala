package graft.streaming

import graft.engine.{Sessionize, Transcripts, Turn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization must close exactly the sessions the batch
  * gap-split operator produces, with state carried across batches. */
class StreamingSessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-sessionize")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1704067200L // 2024-01-01T00:00:00Z
  private def turn(cid: String, idx: Int, sec: Long, len: Int = 10) =
    Turn(cid, idx, "user", "x" * len, "",
      new java.sql.Timestamp((t0 + sec) * 1000L))

  test("closed sessions match the batch operator across batches; open tail stays pending") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 1800.0
    // c1: sessions [0s..60s], [5000s..5030s], open tail at 12000s
    // c2: one long session crossing the batch boundary, still open
    val batch1 = Seq(turn("c1", 0, 0, 4), turn("c1", 1, 60, 6),
      turn("c2", 0, 100, 3))
    val batch2 = Seq(turn("c1", 2, 5000, 8), turn("c1", 3, 5030, 2),
      turn("c2", 1, 900, 5), turn("c1", 4, 12000, 9))

    val stream = MemoryStream[Turn]
    val query = StreamingSessionize.sessions(stream.toDS, gap)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    stream.addData(batch1: _*)
    query.processAllAvailable()
    stream.addData(batch2: _*)
    query.processAllAvailable()
    val got = spark.table("sess_stream")
      .as[StreamingSessionize.SessionEvent].collect()
      .map(e => (e.conv_id, e.session_idx) -> e).toMap
    query.stop()

    // c1's two gap-closed sessions emit; c2's open session flushes by
    // TIMEOUT (c1's 12000 s turn advances the global watermark past
    // c2's idle horizon); c1's open tail at 12000 s stays pending
    assert(got.keySet == Set(("c1", 0L), ("c1", 1L), ("c2", 0L)))
    assert(got(("c1", 0L)).n_turns == 2 && got(("c1", 0L)).sum_m == 10.0)
    assert(got(("c1", 1L)).n_turns == 2 && got(("c1", 1L)).duration == 30.0)
    assert(!got(("c1", 0L)).closed_by_timeout && !got(("c1", 1L)).closed_by_timeout)
    assert(got(("c2", 0L)).closed_by_timeout && got(("c2", 0L)).n_turns == 2)

    // value parity with the batch operator on the same turns
    val all = (batch1 ++ batch2).toDF()
    val batch = Sessionize.sessions(Transcripts.series(all), gap)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(6))).toMap
    got.foreach { case ((cid, idx), e) =>
      val (n, ts, te, sm) = batch((cid, idx))
      assert(e.n_turns == n && e.sum_m == sm)
      // batch t is epoch-shifted by the synthetic origin
      assert(e.t_start - Transcripts.EpochSeconds == ts)
      assert(e.t_end - Transcripts.EpochSeconds == te)
    }
  }

  test("post-timeout resume continues the session numbering from the tombstone") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Turn]
    val query = StreamingSessionize.sessions(stream.toDS, gapSeconds = 100.0,
        watermark = "1 minute", idleFlush = "5min")
      .writeStream.format("memory").queryName("sess_tomb")
      .outputMode("append").start()
    stream.addData(turn("c3", 0, 0), turn("c3", 1, 50))
    query.processAllAvailable()
    // ANOTHER conversation advances the watermark past c3's idle
    // horizon -> c3's session 0 flushes by timeout, leaving a tombstone
    stream.addData(turn("c4", 0, 7200))
    query.processAllAvailable()
    // c3 resumes within the tombstone horizon, then a far gap closes
    // its next session
    stream.addData(turn("c3", 2, 7500))
    query.processAllAvailable()
    stream.addData(turn("c3", 3, 14400))
    query.processAllAvailable()
    val got = spark.table("sess_tomb")
      .as[StreamingSessionize.SessionEvent].collect()
      .filter(_.conv_id == "c3").sortBy(_.session_idx)
    query.stop()
    // numbering CONTINUED through the tombstone: no duplicate
    // (conv_id, session_idx) key, the resumed session is idx 1
    assert(got.map(e => (e.conv_id, e.session_idx)).toSeq ==
      Seq(("c3", 0L), ("c3", 1L)))
    assert(got(0).closed_by_timeout && !got(1).closed_by_timeout)
    assert(got(1).n_turns == 1 && got(1).t_start - t0 == 7500.0)
  }

  test("batch invocation works (no watermark API) and emits the gap-closed sessions") {
    import spark.implicits._
    val gap = 1800.0
    val turns = Seq(turn("b1", 0, 0, 4), turn("b1", 1, 60, 6),
      turn("b1", 2, 5000, 8), turn("b1", 3, 5030, 2),
      turn("b1", 4, 12000, 9), turn("b2", 0, 100, 3)).toDS()
    val got = StreamingSessionize.sessions(turns, gap).collect()
      .map(e => (e.conv_id, e.session_idx) -> e).toMap
    // batch mode fires no timeouts: exactly the gap-CLOSED sessions
    // emit (open tails withheld — batch Sessionize is the batch API)
    assert(got.keySet == Set(("b1", 0L), ("b1", 1L)))
    assert(got(("b1", 0L)).n_turns == 2 && got(("b1", 0L)).sum_m == 10.0)
    assert(got(("b1", 1L)).duration == 30.0)
  }

  test("out-of-order turns within a batch sort by event time before folding") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Turn]
    val query = StreamingSessionize.sessions(stream.toDS, gapSeconds = 100.0)
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    // arrival order scrambled; event order = 0, 50, 5000(gap), 5020
    stream.addData(turn("c9", 2, 5000), turn("c9", 0, 0),
      turn("c9", 3, 5020), turn("c9", 1, 50))
    query.processAllAvailable()
    val got = spark.table("sess_ooo")
      .as[StreamingSessionize.SessionEvent].collect()
    query.stop()
    assert(got.length == 1)
    assert(got(0).session_idx == 0L && got(0).n_turns == 2 &&
      got(0).duration == 50.0)
  }
}
