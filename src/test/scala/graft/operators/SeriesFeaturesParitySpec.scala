package graft.operators

import graft.ref.{Features, LightCurve}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The north-rule correctness gate: rolled-up points computed by the
 * distributed operator must BIT-MATCH the single-node reference port,
 * per group, under stable ordering — and must be invariant to how the
 * input is partitioned (the distributed property the single-node
 * reference never needed to test).
 */
class SeriesFeaturesParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("parity")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic synthetic series: uneven cadence, skewed sizes,
    * duplicate times, one plateau group, one singleton group. */
  private def rows: Seq[(String, Long, Double, Double, Double)] = {
    val rng = new scala.util.Random(12345)
    val out = Seq.newBuilder[(String, Long, Double, Double, Double)]
    for (g <- 0 until 40) {
      val id = f"conv$g%03d"
      val n = 1 + (math.pow(rng.nextDouble(), 2.0) * 120).toInt
      var t = rng.nextDouble() * 100
      for (i <- 0 until n) {
        t += (if (rng.nextDouble() < 0.1) 0.0 else rng.nextDouble() * 5) // dup times
        val m = if (g == 7) 3.5 else rng.nextGaussian() * 4 + 20 // plateau group
        val w = 0.25 + rng.nextDouble()
        out += ((id, i.toLong, t, m, w))
      }
    }
    out.result()
  }

  test("distributed extract bit-matches the single-node port per group") {
    val data = rows
    val feats = Features.all
    val names = SeriesFeatures.outputNames(feats)

    import spark.implicits._
    val df = data.toDF("conv_id", "turn_idx", "t", "m", "w")
    val got = SeriesFeatures.aggregate(
      df, Seq(col("conv_id")), col("t"), col("turn_idx"), col("m"), col("w"), feats)
      .collect()
      .map(r => r.getString(0) -> names.indices.map(i => r.getDouble(r.fieldIndex(names(i)))))
      .toMap

    // single-node oracle: same stable (t, idx, m, w) sort, same kernels
    val expected = data.groupBy(_._1).map { case (id, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2, r._4, r._5))
      val lc = LightCurve(sorted.map(_._3).toArray, sorted.map(_._4).toArray, sorted.map(_._5).toArray)
      id -> feats.flatMap(f => f.evalOrFill(lc, Double.NaN).toSeq)
    }

    assert(got.keySet == expected.keySet)
    for ((id, exp) <- expected; i <- exp.indices) {
      val g = got(id)(i)
      val e = exp(i)
      assert(java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(e),
        s"series $id feature ${names(i)}: spark=$g oracle=$e (bit mismatch)")
    }
  }

  test("result is invariant to input partitioning (merge order)") {
    val feats = Seq(Features.Mean, Features.StandardDeviation, Features.Median,
      Features.Cusum, Features.OtsuSplit, Features.LinearFit)
    val names = SeriesFeatures.outputNames(feats)
    import spark.implicits._
    val df = spark.sparkContext.parallelize(rows, 1).toDF("conv_id", "turn_idx", "t", "m", "w")

    def run(parts: Int): Map[String, Seq[Long]] =
      SeriesFeatures.aggregate(
        df.repartition(parts, col("turn_idx")), // scatter group members
        Seq(col("conv_id")), col("t"), col("turn_idx"), col("m"), col("w"), feats)
        .collect()
        .map(r => r.getString(0) ->
          names.indices.map(i => java.lang.Double.doubleToLongBits(r.getDouble(r.fieldIndex(names(i))))))
        .toMap

    val a = run(1)
    val b = run(7)
    val c = run(32)
    assert(a == b, "1 vs 7 partitions diverged")
    assert(a == c, "1 vs 32 partitions diverged")
  }
}
