package graft.engine

import graft.ref.Feature
import scala.collection.mutable

/**
 * Single-node reference rollup: the same per-bucket math as
 * [[Rollup]] run sequentially over one conversation's sorted series.
 * This is the oracle the distributed tiers must bit-match at every
 * retention tier (the correctness gate in BASELINE.json).
 *
 * It deliberately shares [[Rollup.evalBucket]] — parity between Spark
 * and single-node then reduces to "did the distributed plan feed each
 * bucket the same points in the same order", which is exactly the
 * property the tests pin down.
 */
object RefRollup {

  final case class Point(convId: String, bucket: Long, bucketT: Double,
      n: Long, sumW: Double, sumMw: Double, binM: Double, binW: Double,
      feats: Array[Double])

  /** Input points pre-sorted by (t, idx). */
  final case class Pts(t: Array[Double], idx: Array[Long], m: Array[Double],
      w: Array[Double], n: Array[Long], sw: Array[Double], smw: Array[Double])

  def fromTurns(t: Array[Double], idx: Array[Long], m: Array[Double],
      w: Array[Double]): Pts =
    Pts(t, idx, m, w,
      Array.fill(t.length)(1L),
      w.clone(),
      Array.tabulate(t.length)(i => m(i) * w(i)))

  /** Roll one conversation's points into `window`-second buckets. */
  def tier(convId: String, pts: Pts, window: Long,
      features: Seq[Feature]): Vector[Point] = {
    // stable sort by (t, idx) — same total order as Spark's
    // sort_array over struct(t, i, ...)
    val order = pts.t.indices.sortBy(i => (pts.t(i), pts.idx(i)))
    val buckets = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Int]]
    order.foreach { i =>
      val b = math.floor(pts.t(i) / window.toDouble).toLong
      buckets.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += i
    }
    buckets.iterator.map { case (b, is) =>
      val tp = Rollup.evalBucket(features)(
        is.map(i => pts.t(i)).toArray, is.map(i => pts.m(i)).toArray,
        is.map(i => pts.w(i)).toArray, is.map(i => pts.n(i)).toArray,
        is.map(i => pts.sw(i)).toArray, is.map(i => pts.smw(i)).toArray)
      Point(convId, b, (b + 0.5) * window.toDouble,
        tp.n, tp.sumW, tp.sumMw, tp.binM, tp.binW, tp.feats)
    }.toVector.sortBy(_.bucket)
  }

  /** Cascade a finer tier's points into a coarser tier. */
  def tierFromPoints(convId: String, finer: Vector[Point], window: Long,
      features: Seq[Feature]): Vector[Point] = {
    val pts = Pts(
      finer.map(_.bucketT).toArray, finer.map(_.bucket).toArray,
      finer.map(_.binM).toArray, finer.map(_.binW).toArray,
      finer.map(_.n).toArray, finer.map(_.sumW).toArray,
      finer.map(_.sumMw).toArray)
    tier(convId, pts, window, features)
  }

  /** All three retention tiers for one conversation. */
  def buildAll(convId: String, t: Array[Double], idx: Array[Long],
      m: Array[Double], w: Array[Double],
      features: Seq[Feature]): Map[String, Vector[Point]] = {
    val t1m = tier(convId, fromTurns(t, idx, m, w), 60L, features)
    val t1h = tierFromPoints(convId, t1m, 3600L, features)
    val t1d = tierFromPoints(convId, t1h, 86400L, features)
    Map("1m" -> t1m, "1h" -> t1h, "1d" -> t1d)
  }

  /** Sequential LOCF gap-fill of one conversation's tier points,
    * mirroring [[Rollup.gapFillLocf]]. Returns
    * (bucket, bucketT, isGap, binMLocf, binWLocf). */
  def gapFillLocf(points: Vector[Point], window: Long)
      : Vector[(Long, Double, Int, Double, Double)] = {
    if (points.isEmpty) return Vector.empty
    val byBucket = points.map(p => p.bucket -> p).toMap
    val b0 = points.map(_.bucket).min
    val b1 = points.map(_.bucket).max
    var lastM = Double.NaN; var lastW = Double.NaN
    (b0 to b1).iterator.map { b =>
      byBucket.get(b) match {
        case Some(p) =>
          lastM = p.binM; lastW = p.binW
          (b, (b + 0.5) * window.toDouble, 0, lastM, lastW)
        case None =>
          (b, (b + 0.5) * window.toDouble, 1, lastM, lastW)
      }
    }.toVector
  }
}
