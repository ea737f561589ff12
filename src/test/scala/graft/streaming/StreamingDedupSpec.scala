package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact-dedup must annotate duplicates exactly as a batch
  * first-arrival pass would, with state carried across batches. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-dedup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def doc(id: Long, hash: String, sec: Long) =
    StreamingDedup.DocIn(id, hash, new java.sql.Timestamp(1704067200000L + sec * 1000L))

  test("duplicates within and across batches get the first arrival as canonical") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // h1 repeats inside batch 1 and again in batch 2; h2 unique;
    // h3 appears once per batch
    val batch1 = Seq(doc(1, "h1", 0), doc(2, "h2", 5), doc(3, "h1", 10),
      doc(4, "h3", 15))
    val batch2 = Seq(doc(5, "h1", 60), doc(6, "h3", 65), doc(7, "h4", 70))

    val stream = MemoryStream[StreamingDedup.DocIn]
    val query = StreamingDedup.dedup(stream.toDS)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(batch1: _*)
    query.processAllAvailable()
    stream.addData(batch2: _*)
    query.processAllAvailable()

    val got = spark.table("dedup_stream").as[StreamingDedup.DedupedDoc]
      .collect().map(d => d.doc_id -> d).toMap
    query.stop()

    assert(got.size == 7)
    assert(!got(1).is_duplicate && got(1).canonical_id == 1)
    assert(!got(2).is_duplicate)
    assert(got(3).is_duplicate && got(3).canonical_id == 1 && got(3).dup_index == 1)
    assert(!got(4).is_duplicate)
    // cross-batch state: batch-2 h1 still points at doc 1, index advanced
    assert(got(5).is_duplicate && got(5).canonical_id == 1 && got(5).dup_index == 2)
    assert(got(6).is_duplicate && got(6).canonical_id == 4 && got(6).dup_index == 1)
    assert(!got(7).is_duplicate)
  }

  test("same-batch out-of-order arrivals elect the earliest event time as canonical") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[StreamingDedup.DocIn]
    val query = StreamingDedup.dedup(stream.toDS)
      .writeStream.format("memory").queryName("dedup_stream2")
      .outputMode("append").start()
    // doc 11 arrives listed first but has the LATER event time
    stream.addData(doc(11, "hx", 100), doc(10, "hx", 50))
    query.processAllAvailable()
    val got = spark.table("dedup_stream2").as[StreamingDedup.DedupedDoc]
      .collect().map(d => d.doc_id -> d).toMap
    query.stop()
    assert(!got(10).is_duplicate && got(10).canonical_id == 10)
    assert(got(11).is_duplicate && got(11).canonical_id == 10)
  }
}
