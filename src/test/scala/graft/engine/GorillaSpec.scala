package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class GorillaSpec extends AnyFunSuite {

  private def bits(v: Double): Long = java.lang.Double.doubleToRawLongBits(v)

  private def roundTrip(ts: Array[Long], vs: Array[Double]): Unit = {
    val enc = Gorilla.encode(ts, vs)
    val (t2, v2) = Gorilla.decode(enc)
    assert(t2.toSeq == ts.toSeq)
    // bit-compare (NaN-safe)
    assert(v2.map(bits).toSeq == vs.map(bits).toSeq)
  }

  test("empty, single, pair blocks round-trip") {
    roundTrip(Array.empty, Array.empty)
    roundTrip(Array(1704067200L), Array(42.0))
    roundTrip(Array(0L, 1L), Array(0.0, -0.0))
  }

  test("special values round-trip (NaN, infinities, denormals)") {
    roundTrip(
      Array(0L, 60L, 120L, 180L, 240L, 300L),
      Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        Double.MinPositiveValue, -0.0, 1e308))
  }

  test("regular minute buckets with slowly varying values compress well") {
    val n = 1440 // one day of minute buckets
    val ts = Array.tabulate(n)(i => 1704067200L + 60L * i)
    val vs = Array.tabulate(n)(i => 100.0 + (i % 7))
    roundTrip(ts, vs)
    val enc = Gorilla.encode(ts, vs)
    val raw = n * 16
    // regular cadence: DoD is 0 after the first delta -> ~1 bit/ts
    assert(enc.length < raw / 4, s"expected >4x compression, got ${enc.length} vs $raw")
  }

  test("seeded random blocks round-trip (property sweep)") {
    val rng = new scala.util.Random(987654321L)
    val specials = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, Double.MinPositiveValue, 1e-308)
    for (trial <- 0 until 200) {
      val n = rng.nextInt(300)
      var t = rng.nextLong() % (1L << 50)
      val ts = Array.fill(n) { t += math.abs(rng.nextLong() % (1L << rng.nextInt(41))); t }
      val vs = Array.fill(n) {
        rng.nextInt(4) match {
          case 0 => specials(rng.nextInt(specials.length))
          case 1 => java.lang.Double.longBitsToDouble(rng.nextLong())
          case 2 => rng.nextDouble() * 1e6 - 5e5
          case _ => (rng.nextInt(1000) - 500).toDouble
        }
      }
      roundTrip(ts, vs)
      val _ = trial
    }
  }

  test("non-monotonic (negative delta) timestamps still round-trip") {
    roundTrip(Array(100L, 40L, 41L, 10000000L, -5L), Array(1.0, 2.0, 3.0, 4.0, 5.0))
  }
}
