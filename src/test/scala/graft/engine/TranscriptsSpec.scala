package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TranscriptsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("transcripts")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("generation is deterministic and partitioning-independent") {
    val a = Transcripts.synthetic(spark, 50, 30, seed = 42L, partitions = 1)
      .collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = Transcripts.synthetic(spark, 50, 30, seed = 42L, partitions = 16)
      .collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("schema matches the north-rule input hint exactly") {
    val df = Transcripts.synthetic(spark, 3, 10).toDF
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
      ("text", "string"), ("tool", "string"), ("ts", "timestamp")))
  }

  test("conversations are Zipf-skewed with strictly increasing ts and contiguous turn_idx") {
    val turns = Transcripts.synthetic(spark, 300, 40, seed = 1L).collect()
    val sizes = turns.groupBy(_.conv_id).map(_._2.length).toSeq
    // skew: max conversation far above median
    assert(sizes.max > 10 * sizes.sorted.apply(sizes.length / 2))
    turns.groupBy(_.conv_id).foreach { case (_, ts) =>
      val sorted = ts.sortBy(_.turn_idx)
      assert(sorted.map(_.turn_idx).toSeq == (0 until sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(p, q) => q.ts.getTime >= p.ts.getTime
        case _ => true
      })
    }
  }

  test("series derivation: t in seconds since engine epoch, m = text length, unit w") {
    val turns = Transcripts.synthetic(spark, 5, 10, seed = 2L)
    val s = Transcripts.series(turns.toDF).collect()
    val raw = turns.collect().map(t => (t.conv_id, t.turn_idx) -> t).toMap
    s.foreach { r =>
      val t = raw((r.getString(0), r.getInt(1)))
      assert(r.getDouble(3) == t.text.length.toDouble)
      assert(r.getDouble(4) == 1.0)
      val expT = t.ts.getTime / 1000.0 - Transcripts.EpochSeconds
      assert(math.abs(r.getDouble(2) - expT) < 1e-3)
    }
  }

  test("events-derived transcript view has the contract schema") {
    val df = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq == Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val n = df.count()
    assert(n > 0)
    val idx = df.groupBy(col("conv_id")).agg(min(col("turn_idx")).as("mn")).collect()
    idx.foreach(r => assert(r.getInt(1) == 0))
  }
}
