package graft.ref

import graft.operators.McSeriesFeatures
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.SortedSet

/** MultiColorExtractor semantics: reference-exact values, per-feature
  * fill on missing bands, and bit-parity of the distributed path with
  * the single-node layer. */
class MultiColorSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("multicolor")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def lc(t: Seq[Double], m: Seq[Double], w: Seq[Double]): LightCurve =
    LightCurve(t.toArray, m.toArray, w.toArray)

  test("color features match the reference's hand-computable values") {
    // reference color_of_maximum.rs test vectors: g=[4,5,6], r=[1,3,2]
    val g = lc(Seq(0.0, 2.0, 4.0), Seq(4.0, 5.0, 6.0), Seq(1.0, 1.0, 1.0))
    val r = lc(Seq(1.0, 3.0, 5.0), Seq(1.0, 3.0, 2.0), Seq(1.0, 1.0, 1.0))
    val bands = Map("g" -> g, "r" -> r)
    assert(McFeature.ColorOfMaximum("g", "r").evalNoCheck(bands).toSeq == Seq(3.0))
    assert(McFeature.ColorOfMinimum("g", "r").evalNoCheck(bands).toSeq == Seq(3.0))
    assert(McFeature.ColorOfMedian("g", "r").evalNoCheck(bands).toSeq == Seq(3.0))
    // spread: weighted means 5.0 and 2.0 -> pop sigma of {5,2} = 1.5
    assert(McFeature.ColorSpread(SortedSet("g", "r")).evalNoCheck(bands).toSeq == Seq(1.5))
    // per-band: amplitude of g = 1.0
    assert(McFeature.PerBand(Features.Amplitude, "g").evalNoCheck(bands).toSeq == Seq(1.0))
  }

  test("evalOrFill fills exactly the failing feature's slice") {
    val g = lc(Seq(0.0, 1.0), Seq(1.0, 3.0), Seq(1.0, 1.0))
    val ex = McExtractor(Seq(
      McFeature.ColorOfMedian("g", "missing"), // band absent -> fill
      McFeature.PerBand(Features.Amplitude, "g"), // fine
      McFeature.PerBand(Features.LinearTrend, "g"))) // minTsLength 3 -> fill (3 outputs)
    val out = ex.evalOrFill(Map("g" -> g), Double.NaN)
    assert(ex.names.size == 5 && out.length == 5)
    assert(out(0).isNaN)
    assert(out(1) == 1.0)
    assert(out(2).isNaN && out(3).isNaN && out(4).isNaN)
    assert(ex.passbandSet == Set("g", "missing"))
  }

  test("distributed extraction bit-matches the single-node extractor") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = for {
      uid <- 0 until 25
      band <- Seq("g", "r", "i").take(1 + rng.nextInt(3)) // some series miss bands
      k <- 0 until (2 + rng.nextInt(8))
    } yield (uid.toLong, band, rng.nextDouble() * 100, rng.nextDouble() * 10,
      1.0 + rng.nextInt(3), uid * 1000L + k)
    val df = rows.toDF("user_id", "band", "t", "m", "w", "idx")
      .withColumn("w", col("w").cast("double"))

    val ex = McExtractor(Seq(
      McFeature.ColorOfMedian("g", "r"),
      McFeature.ColorOfMaximum("g", "r"),
      McFeature.ColorSpread(SortedSet("g", "i", "r")),
      McFeature.PerBand(Features.StetsonK, "g")))

    val got = McSeriesFeatures.extract(df, "user_id", "band", ex)
      .orderBy(col("user_id")).collect()
      .map(r2 => r2.getLong(0) -> ex.names.indices.map(i => r2.getDouble(2 + i)))
      .toMap

    // single-node oracle per user, same (t, idx) sort
    val local = rows.groupBy(_._1).map { case (uid, rs) =>
      val byBand = rs.groupBy(_._2).map { case (b, brs) =>
        val sorted = brs.sortBy(x => (x._3, x._6))
        b -> lc(sorted.map(_._3), sorted.map(_._4), sorted.map(_._5.toDouble))
      }
      uid -> ex.evalOrFill(byBand, Double.NaN).toSeq
    }
    local.foreach { case (uid, exp) =>
      val g = got(uid)
      exp.indices.foreach { i =>
        assert(g(i) == exp(i) || (g(i).isNaN && exp(i).isNaN),
          s"user $uid col ${ex.names(i)}: ${g(i)} != ${exp(i)}")
      }
    }
  }
}
