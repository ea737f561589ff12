package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * North-rule correctness gate: rolled-up points at EVERY retention
 * tier (1m/1h/1d) produced by the distributed engine must bit-match
 * the single-node reference rollup, compared as text under stable
 * (conv_id, turn_idx) ordering — and must be invariant to input
 * partitioning (the distributed-only property).
 */
class RollupParitySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("rollup-parity")
    .config("spark.sql.shuffle.partitions", "7") // deliberately odd
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val features = Rollup.defaultFeatures
  private lazy val featNames = graft.operators.SeriesFeatures.outputNames(features)

  /** Render a tier row as text — Double.toString is injective on
    * doubles (shortest round-trip repr), so text equality == bit
    * equality, NaN-safe. */
  private def fmt(convId: String, bucket: Long, bucketT: Double, n: Long,
      sumW: Double, sumMw: Double, binM: Double, binW: Double,
      feats: Seq[Double]): String =
    s"$convId|$bucket|$bucketT|$n|$sumW|$sumMw|$binM|$binW|" + feats.mkString(",")

  private def sparkTierText(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy(col("conv_id"), col("bucket")).collect().toSeq.map { r =>
      fmt(r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        (8 until 8 + featNames.length).map(r.getDouble))
    }

  private def refTierText(points: Seq[RefRollup.Point]): Seq[String] =
    points.sortBy(p => (p.convId, p.bucket)).map(p =>
      fmt(p.convId, p.bucket, p.bucketT, p.n, p.sumW, p.sumMw, p.binM, p.binW,
        p.feats.toSeq))

  test("all three tiers bit-match the single-node reference rollup") {
    val turns = Transcripts.synthetic(spark, nConvs = 60, meanTurns = 50, seed = 7L)
    val series = Transcripts.series(turns.toDF).cache()

    // single-node oracle: per conversation, sorted by (t, turn_idx)
    val local = series.collect().map(r =>
      (r.getString(0), r.getInt(1).toLong, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val byConv = local.groupBy(_._1)
    val refTiers: Map[String, Vector[RefRollup.Point]] =
      Seq("1m", "1h", "1d").map { tn =>
        tn -> byConv.toVector.sortBy(_._1).flatMap { case (cid, rows) =>
          val sorted = rows.sortBy(r => (r._3, r._2))
          RefRollup.buildAll(cid,
            sorted.map(_._3), sorted.map(_._2),
            sorted.map(_._4), sorted.map(_._5), features)(tn)
        }
      }.toMap

    val sparkTiers = Rollup.buildAll(series, features)
    for (tn <- Seq("1m", "1h", "1d")) {
      val got = sparkTierText(sparkTiers(tn))
      val exp = refTierText(refTiers(tn))
      assert(got.length == exp.length, s"tier $tn row count")
      got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"tier $tn row $i")
      }
    }
    series.unpersist()
  }

  test("native bucket aggregate is bit-identical to the collect_list/UDF form") {
    val turns = Transcripts.synthetic(spark, nConvs = 40, meanTurns = 45, seed = 23L)
    val series = Transcripts.series(turns.toDF)
    val native = sparkTierText(Rollup.tierFromTurns(series, 60L, features))
    val collect = sparkTierText(RollupBaselines.tierFromTurnsCollect(series, 60L, features))
    assert(native == collect)
    val t1m = Rollup.tierFromTurns(series, 60L, features)
    val nativeCascade = sparkTierText(Rollup.tierFromTier(t1m, 3600L, features))
    val collectCascade = sparkTierText(RollupBaselines.tierFromTierCollect(t1m, 3600L, features))
    assert(nativeCascade == collectCascade)
  }

  test("tier points are invariant to input partitioning") {
    val turns = Transcripts.synthetic(spark, nConvs = 30, meanTurns = 30, seed = 11L)
    val s1 = Transcripts.series(turns.toDF.repartition(1))
    val s13 = Transcripts.series(turns.toDF.repartition(13, col("turn_idx")))
    val a = sparkTierText(Rollup.tierFromTurns(s1, 60L, features))
    val b = sparkTierText(Rollup.tierFromTurns(s13, 60L, features))
    assert(a == b)
  }

  test("salted raw-tier build is bit-identical to the unsalted path") {
    val turns = Transcripts.synthetic(spark, nConvs = 30, meanTurns = 60, seed = 31L)
    val series = Transcripts.series(turns.toDF)
    val plain = sparkTierText(Rollup.tierFromTurns(series, 3600L, features))
    val salted = sparkTierText(Rollup.tierFromTurnsSalted(series, 3600L, features, saltBuckets = 5))
    assert(plain == salted)
  }

  test("gap-fill LOCF matches the sequential reference") {
    val turns = Transcripts.synthetic(spark, nConvs = 25, meanTurns = 40, seed = 3L)
    val series = Transcripts.series(turns.toDF)
    val t1h = Rollup.tierFromTier(Rollup.tierFromTurns(series, 60L, features), 3600L, features)

    val got = Rollup.gapFillLocf(t1h, 3600L)
      .orderBy(col("conv_id"), col("bucket")).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)))

    // reference side
    val local = series.collect().map(r =>
      (r.getString(0), r.getInt(1).toLong, r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val exp = local.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (cid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val tiers = RefRollup.buildAll(cid, sorted.map(_._3), sorted.map(_._2),
        sorted.map(_._4), sorted.map(_._5), features)
      RefRollup.gapFillLocf(tiers("1h"), 3600L)
        .map { case (b, bt, gap, m, w) => (cid, b, bt, gap, m, w) }
    }
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4)
      assert(java.lang.Double.doubleToLongBits(g._5) == java.lang.Double.doubleToLongBits(e._5))
      assert(java.lang.Double.doubleToLongBits(g._6) == java.lang.Double.doubleToLongBits(e._6))
    }
  }

  test("gorilla-packed 1m chunks round-trip through the tier writer path") {
    val turns = Transcripts.synthetic(spark, nConvs = 20, meanTurns = 60, seed = 19L)
    val series = Transcripts.series(turns.toDF)
    val t1m = Rollup.tierFromTurns(series, 60L, features)
    // pack each (conv, day) chunk of minute points into one block
    val chunks = t1m
      .groupBy(col("conv_id"), floor(col("bucket") / 1440.0).cast("long").as("day"))
      .agg(
        sort_array(collect_list(struct(col("bucket"), col("bin_m")))).as("pts"))
      .select(col("conv_id"), col("day"),
        col("pts.bucket").as("ts"), col("pts.bin_m").as("vs"),
        Gorilla.encodeCol(col("pts.bucket"), col("pts.bin_m")).as("block"))
      .withColumn("dec", Gorilla.decodeCol(col("block")))
    val rows = chunks.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getAs[scala.collection.Seq[Long]]("ts").toSeq
      val vs = r.getAs[scala.collection.Seq[Double]]("vs").toSeq
      val dec = r.getStruct(r.fieldIndex("dec"))
      assert(dec.getAs[scala.collection.Seq[Long]]("ts").toSeq == ts)
      assert(dec.getAs[scala.collection.Seq[Double]]("vs").toSeq
        .map(java.lang.Double.doubleToLongBits) ==
        vs.map(java.lang.Double.doubleToLongBits))
    }
  }

  test("bucket aggregate buffers round-trip through spill serialization") {
    import graft.plans.{BucketBuffer, CarryBuffer}
    val rng = new scala.util.Random(41)
    val b = new BucketBuffer()
    (0 until 100).foreach(_ =>
      b.append(rng.nextDouble(), rng.nextLong(), rng.nextDouble(), rng.nextDouble()))
    val agg = graft.plans.BucketAggExpr(null, null, null, null, Nil)
    val b2 = agg.deserialize(agg.serialize(b))
    assert(b2.size == b.size)
    (0 until b.size).foreach { i =>
      assert(b2.t(i) == b.t(i) && b2.i(i) == b.i(i) &&
        b2.m(i) == b.m(i) && b2.w(i) == b.w(i))
    }
    val c = new CarryBuffer()
    (0 until 50).foreach(_ => c.append(rng.nextDouble(), rng.nextLong(),
      rng.nextDouble(), rng.nextDouble(), rng.nextLong(), rng.nextDouble(), rng.nextDouble()))
    val cagg = graft.plans.CarryBucketAggExpr(null, null, null, null, null, null, null, Nil)
    val c2 = cagg.deserialize(cagg.serialize(c))
    assert(c2.size == c.size)
    (0 until c.size).foreach { i =>
      assert(c2.t(i) == c.t(i) && c2.n(i) == c.n(i) && c2.smw(i) == c.smw(i))
    }
    // merge preserves order (sortByTime is the only reorder point)
    val m1 = new BucketBuffer(); m1.append(2.0, 1L, 0.0, 1.0)
    val m2 = new BucketBuffer(); m2.append(1.0, 2L, 0.0, 1.0)
    m1.appendAll(m2)
    m1.sortByTime()
    assert(m1.t.take(2).toSeq == Seq(1.0, 2.0) && m1.i.take(2).toSeq == Seq(2L, 1L))
  }
}
