package graft.streaming

import graft.engine.{Transcripts, Turn}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental 1m continuous aggregate fed out-of-order chunks
  * must converge to exactly the batch tier (associative carries). */
class StreamingRollupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-rollup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming 1m tier equals the batch 1m carries after all data arrives") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val turns = Transcripts.synthetic(spark, nConvs = 20, meanTurns = 30, seed = 5L)
      .collect().toSeq

    val stream = MemoryStream[Turn]
    val query = StreamingRollup.tier1m(stream.toDF)
      .writeStream
      .format("memory")
      .queryName("tier1m_stream")
      .outputMode("complete")
      .start()

    // feed in three out-of-order chunks (late data within a batch)
    val chunks = turns.grouped(math.max(turns.size / 3, 1)).toSeq
    chunks.foreach { chunk =>
      stream.addData(chunk.sortBy(t => t.text.length): _*) // scrambled order
      query.processAllAvailable()
    }

    val got = spark.table("tier1m_stream")
      .orderBy(col("conv_id"), col("bucket"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    query.stop()

    val batch = StreamingRollup.tier1m(turns.toDF)
      .orderBy(col("conv_id"), col("bucket"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))

    assert(got.length == batch.length)
    got.zip(batch).foreach { case (g, b) =>
      assert(g._1 == b._1 && g._2 == b._2 && g._3 == b._3) // key + count
      assert(math.abs(g._4 - b._4) < 1e-9 && math.abs(g._5 - b._5) < 1e-9)
      assert(math.abs(g._6 - b._6) < 1e-9 && math.abs(g._7 - b._7) < 1e-9)
    }
  }

  test("late data past the watermark is dropped in append mode; batch rebuild reconciles") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def turn(cid: String, idx: Int, epochSec: Long): Turn =
      Turn(cid, idx, "user", "x" * 10, "", new java.sql.Timestamp(epochSec * 1000L))

    val t0 = 1704067200L // 2024-01-01T00:00:00Z, bucket B = t0/60
    val onTime = Seq(turn("c1", 0, t0), turn("c1", 1, t0 + 30))
    val advance = Seq(turn("c1", 2, t0 + 3600)) // pushes watermark past B
    val straggler = Seq(turn("c1", 3, t0 + 10)) // now older than the watermark

    val stream = MemoryStream[Turn]
    val query = StreamingRollup.tier1m(stream.toDF, watermark = "10 minutes")
      .writeStream.format("memory").queryName("tier1m_late")
      .outputMode("append").start()
    Seq(onTime, advance, straggler).foreach { chunk =>
      stream.addData(chunk: _*)
      query.processAllAvailable()
    }
    // flush: move the watermark far ahead so every window closes
    stream.addData(turn("c1", 4, t0 + 7200))
    query.processAllAvailable()
    query.stop()

    val emitted = spark.table("tier1m_late")
      .filter(col("bucket") === t0 / 60)
      .select(col("n")).as[Long].collect()
    // bucket B emitted exactly once, with ONLY the on-time rows —
    // the straggler was dropped, not merged and not re-emitted
    assert(emitted.toSeq == Seq(2L), s"expected one closed bucket n=2, got ${emitted.toSeq}")

    // the batch rebuild path sees everything — the reconciliation story
    val batchN = StreamingRollup.tier1m((onTime ++ advance ++ straggler).toDF)
      .filter(col("bucket") === t0 / 60)
      .select(col("n")).as[Long].collect()
    assert(batchN.toSeq == Seq(3L))
  }

  test("stateful gap detector finds exactly the batch-computed gaps across chunks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapThreshold = 120.0 // seconds

    val turns = Transcripts.synthetic(spark, nConvs = 15, meanTurns = 40, seed = 17L)
      .collect().toSeq.sortBy(t => (t.conv_id, t.turn_idx))

    // expected: consecutive in-order gaps > threshold per conversation
    val expected = turns.groupBy(_.conv_id).toSeq.flatMap { case (cid, ts) =>
      val sorted = ts.sortBy(t => (t.ts.getTime, t.turn_idx))
      sorted.sliding(2).collect {
        case Seq(a, b) if (b.ts.getTime - a.ts.getTime) / 1e3 > gapThreshold =>
          (cid, a.ts.getTime, (b.ts.getTime * 1000L - a.ts.getTime * 1000L) / 1e6)
      }
    }.toSet

    val stream = MemoryStream[Turn]
    val query = StreamingRollup.gapEvents(stream.toDS, gapThreshold)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode("append").start()
    // feed in two event-time-ordered chunks (state must carry lastTs
    // across batch boundaries; global time order keeps the second
    // chunk ahead of the first chunk's watermark)
    val byTime = turns.sortBy(_.ts.getTime)
    val half = byTime.length / 2
    stream.addData(byTime.take(half): _*)
    query.processAllAvailable()
    stream.addData(byTime.drop(half): _*)
    query.processAllAvailable()

    val got = spark.table("gap_stream").as[StreamingRollup.GapEvent].collect()
      .map(g => (g.conv_id, g.gap_start.getTime, g.gap_seconds)).toSet
    query.stop()
    assert(got == expected, s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "test corpus should contain gaps")
  }

  test("streaming bucket indices line up with the batch rollup's floor(t/60)") {
    import spark.implicits._
    val turns = Transcripts.synthetic(spark, nConvs = 10, meanTurns = 20, seed = 9L)
    val viaWindow = StreamingRollup.tier1m(turns.toDF)
      .select(col("conv_id"), col("bucket"), col("n"))
    val viaFloor = Transcripts.series(turns.toDF)
      .groupBy(col("conv_id"),
        floor((col("t") + Transcripts.EpochSeconds) / 60.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
    assert(viaWindow.exceptAll(viaFloor).isEmpty && viaFloor.exceptAll(viaWindow).isEmpty)
  }
}
