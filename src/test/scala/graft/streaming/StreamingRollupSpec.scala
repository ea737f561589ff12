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
