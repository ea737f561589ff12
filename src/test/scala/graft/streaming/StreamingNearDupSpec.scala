package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

object StreamingNearDupSpec {
  case class In(doc_id: Long, text: String, ts: java.sql.Timestamp)
}

/** Streaming near-dup annotation must match the batch evaluation of
  * the same stream-static join, across micro-batch boundaries, with
  * signal-less (empty-shingle) docs annotated false, never joined. */
class StreamingNearDupSpec extends AnyFunSuite {
  import StreamingNearDupSpec.In

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-neardup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val t0 = 1704067200000L
  private def doc(id: Long, text: String, sec: Long) =
    In(id, text, new java.sql.Timestamp(t0 + sec * 1000L))

  private val corpusText = Seq(
    100L -> "the quick brown fox jumps over the lazy dog near the river bank",
    101L -> "pack my box with five dozen liquor jugs before the night falls",
    102L -> "the quick brown fox jumps over the lazy dog near the river bank", // dup of 100
    103L -> "sphinx of black quartz judge my vow in the ancient temple hall")

  test("stream annotations match batch, across batches, with rep-id matching") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = corpusText.toDF("id", "text")
    val index = StreamingNearDup.buildBandIndex(corpus).persist()
    assert(index.count() > 0)
    // 100 and 102 share a signature -> ONE representative row (min id)
    assert(index.select("id").distinct().count() == 3)

    val b1 = Seq(
      doc(1, corpusText.head._2, 0),   // exact clone of corpus 100/102
      doc(2, "completely unrelated words about spark catalyst optimizer internals here", 5),
      doc(3, "tiny", 10))              // empty shingle set (1 token, 2-grams)
    val b2 = Seq(
      doc(4, corpusText(1)._2, 60))    // exact clone of corpus 101
    val flush = Seq(doc(99, "flush row far in the future to advance the watermark", 100000))

    val stream = MemoryStream[In]
    val query = StreamingNearDup.annotate(stream.toDF(), index,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    stream.addData(b1: _*)
    query.processAllAvailable()
    stream.addData(b2: _*)
    query.processAllAvailable()
    stream.addData(flush: _*)
    query.processAllAvailable()
    val got = spark.table("neardup_stream")
      .collect().map(r => r.getLong(0) -> r).toMap
    query.stop()

    // all four probe docs finalized (the flush row may or may not have
    // been emitted yet — watermark-boundary semantics, not under test)
    assert(Set(1L, 2L, 3L, 4L).subsetOf(got.keySet))
    assert(got(1).getBoolean(2) && got(1).getLong(3) == 100L &&
      got(1).getDouble(4) == 1.0, s"doc 1: ${got(1)}")
    assert(!got(2).getBoolean(2) && got(2).isNullAt(3))
    assert(!got(3).getBoolean(2) && got(3).isNullAt(3)) // no signal, not joined
    assert(got(4).getBoolean(2) && got(4).getLong(3) == 101L &&
      got(4).getDouble(4) == 1.0)

    // batch parity: same rows evaluated as a plain DataFrame
    val batch = StreamingNearDup.annotate((b1 ++ b2).toDF(), index)
      .collect().map(r => r.getLong(0) -> r).toMap
    (b1 ++ b2).map(_.doc_id).foreach { id =>
      val (s, b) = (got(id), batch(id))
      assert(s.getBoolean(2) == b.getBoolean(2), s"verdict differs for $id")
      assert(s.isNullAt(3) == b.isNullAt(3) &&
        (s.isNullAt(3) || s.getLong(3) == b.getLong(3)), s"match differs for $id")
    }
    index.unpersist()
  }
}
