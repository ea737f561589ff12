package graft.operators

import graft.ref.{Bins, LightCurve}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-state series collection: series under the cap take the
  * exact path bit-identically; a hot series far over the cap is
  * Bins-downsampled through scalar-state aggregation so no task ever
  * holds more than ~maxN points of one series. */
class BoundedCollectSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("bounded-collect")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic points: t = i*0.01 (+ per-key shift), m/w closed
    * forms, reproducible on the driver for the single-node oracle. */
  private def mkPts(key: Long, n: Int) = {
    val df = spark.range(n).select(
      lit(key).as("user_id"),
      (col("id") * 0.01).as("t"),
      (sin(col("id") * 0.001) + col("id") % 7 * 0.1).as("m"),
      (lit(1.0) + col("id") % 5 * 0.1).as("w"),
      col("id").as("idx"))
    df
  }

  private def localLc(n: Int): LightCurve = {
    val t = Array.tabulate(n)(i => i * 0.01)
    val m = Array.tabulate(n)(i => math.sin(i * 0.001) + i % 7 * 0.1)
    val w = Array.tabulate(n)(i => 1.0 + i % 5 * 0.1)
    new LightCurve(t, m, w)
  }

  test("series under the cap: exact collect path, bit-identical points") {
    val plain = mkPts(1L, 500)
      .groupBy(col("user_id"))
      .agg(SeriesFeatures.collectSorted(col("t"), col("idx"), col("m"), col("w")).as("p"))
      .select(col("p.t"), col("p.m"), col("p.w")).head()
    val bounded = SeriesFeatures.boundedCollect(mkPts(1L, 500), "user_id", maxN = 1000)
      .select(col("n_obs"), col("p.t"), col("p.m"), col("p.w")).head()
    assert(bounded.getLong(0) == 500L)
    for (i <- 1 to 3)
      assert(plain.getSeq[Double](i - 1) == bounded.getSeq[Double](i),
        s"field $i differs")
  }

  test("hot series over the cap: <= maxN+1 binned points matching single-node Bins") {
    val n = 200000
    val maxN = 500
    val got = SeriesFeatures.boundedCollect(mkPts(2L, n), "user_id", maxN)
      .select(col("n_obs"), col("p.t"), col("p.m"), col("p.w")).head()
    assert(got.getLong(0) == n.toLong, "n_obs must stay the ORIGINAL count")
    val ts = got.getSeq[Double](1)
    assert(ts.length <= maxN + 1,
      s"collected ${ts.length} points — the memory bound is broken")
    // single-node oracle: reference Bins at the same window
    val lc = localLc(n)
    val win = (lc.t(n - 1) - lc.t(0)) / maxN
    val binned = Bins(lc, win, 0.0)
    assert(ts.length == binned.t.length)
    def close(a: Seq[Double], b: Array[Double]): Unit =
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)), s"$x != $y")
      }
    close(ts, binned.t)
    close(got.getSeq[Double](2), binned.m)
    close(got.getSeq[Double](3), binned.w)
  }

  test("mixed corpus: each series takes its own route") {
    val df = mkPts(1L, 300).unionByName(mkPts(2L, 5000))
    val out = SeriesFeatures.boundedCollect(df, "user_id", maxN = 1000)
      .select(col("user_id"), col("n_obs"), size(col("p")).as("np"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L) == ((300L, 300)))
    assert(out(2L)._1 == 5000L && out(2L)._2 <= 1001)
  }
}
