package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Gorilla-style time-series block compression (Pelkonen et al.,
 * "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
 * VLDB 2015): delta-of-delta bit classes for timestamps, XOR with
 * leading/trailing-zero windows for values. Used by the tier writer to
 * pack each (conv_id, coarse-chunk) bucket series into one binary cell.
 *
 * Layout: [varint n][ts0: 64b][dt0: zigzag 64b raw]
 *         per further ts: DoD classes
 *           '0'                     dod == 0
 *           '10'   + 7b  zigzag     dod in [-63, 64]
 *           '110'  + 12b zigzag     dod in [-2047, 2048]
 *           '1110' + 20b zigzag     dod in [-524287, 524288]
 *           '1111' + 64b raw        otherwise
 *         values: v0 64b raw; per further value:
 *           '0'                     xor == 0
 *           '10' + meaningful bits  fits previous (lead, len) window
 *           '11' + 6b lead + 6b (len-1) + len bits
 *
 * Pure JVM code — exposed to Spark via [[encodeCol]]/[[decodeCol]]
 * over per-bucket arrays; no instruction-level parallelism needed, the
 * distribution axis is the (conv_id, chunk) group.
 */
object Gorilla {

  // ---------------- bit IO ----------------

  private final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val need = (bitPos + bits + 7) >>> 3
      if (need > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, need))
        System.arraycopy(buf, 0, nb, 0, buf.length)
        buf = nb
      }
    }
    def writeBit(b: Int): Unit = {
      ensure(1)
      if (b != 0) buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    /** Write the low `n` bits of v, MSB first. */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) { writeBitFast(((v >>> i) & 1L).toInt); i -= 1 }
    }
    private def writeBitFast(b: Int): Unit = {
      if (b != 0) buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var bitPos = 0
    def readBit(): Int = {
      val b = (bytes(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  @inline private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  // ---------------- encode ----------------

  /** Encode parallel arrays (timestamps strictly ordered, any doubles
    * incl. NaN/Inf). Empty input encodes to a 1-byte block. */
  def encode(ts: Array[Long], vs: Array[Double]): Array[Byte] = {
    require(ts.length == vs.length, "ts/vs length mismatch")
    val w = new BitWriter
    val n = ts.length
    // varint n (7-bit groups, high bit = continue)
    var nn = n.toLong
    do {
      val g = (nn & 0x7f).toInt
      nn >>>= 7
      w.writeBits((if (nn != 0) g | 0x80 else g).toLong, 8)
    } while (nn != 0)
    if (n == 0) return w.toBytes

    w.writeBits(ts(0), 64)
    w.writeBits(java.lang.Double.doubleToRawLongBits(vs(0)), 64)
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToRawLongBits(vs(0))
    var prevLead = -1
    var prevLen = 0

    def writeValue(w: BitWriter, v: Double): Unit = {
      val bits = java.lang.Double.doubleToRawLongBits(v)
      val x = bits ^ prevBits
      prevBits = bits
      if (x == 0L) w.writeBit(0)
      else {
        val lead = math.min(java.lang.Long.numberOfLeadingZeros(x), 63)
        val trail = java.lang.Long.numberOfTrailingZeros(x)
        val len = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && (64 - lead - len) >= (64 - prevLead - prevLen)) {
          // fits previous (lead, len) window
          w.writeBits(0x2, 2)
          w.writeBits(x >>> (64 - prevLead - prevLen), prevLen)
        } else {
          w.writeBits(0x3, 2)
          w.writeBits(lead.toLong, 6)
          w.writeBits((len - 1).toLong, 6)
          w.writeBits(x >>> trail, len)
          prevLead = lead
          prevLen = len
        }
      }
    }

    if (n > 1) {
      prevDelta = ts(1) - ts(0)
      w.writeBits(zigzag(prevDelta), 64)
      prevTs = ts(1)
      writeValue(w, vs(1))
    }
    var i = 2
    while (i < n) {
      // timestamp: delta of delta
      val delta = ts(i) - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(0)
      else {
        val z = zigzag(dod)
        if (z < (1L << 7)) { w.writeBits(0x2, 2); w.writeBits(z, 7) }
        else if (z < (1L << 12)) { w.writeBits(0x6, 3); w.writeBits(z, 12) }
        else if (z < (1L << 20)) { w.writeBits(0xe, 4); w.writeBits(z, 20) }
        else { w.writeBits(0xf, 4); w.writeBits(z, 64) }
      }
      prevDelta = delta
      prevTs = ts(i)
      writeValue(w, vs(i))
      i += 1
    }

    w.toBytes
  }

  /** Decode a block produced by [[encode]]. */
  def decode(bytes: Array[Byte]): (Array[Long], Array[Double]) = {
    val r = new BitReader(bytes)
    var n = 0L
    var shift = 0
    var cont = true
    while (cont) {
      val g = r.readBits(8)
      n |= (g & 0x7f) << shift
      shift += 7
      cont = (g & 0x80) != 0
    }
    val len = n.toInt
    val ts = new Array[Long](len)
    val vs = new Array[Double](len)
    if (len == 0) return (ts, vs)

    ts(0) = r.readBits(64)
    var prevBits = r.readBits(64)
    vs(0) = java.lang.Double.longBitsToDouble(prevBits)
    var prevLead = -1
    var prevLen = 0

    def readValue(): Double = {
      if (r.readBit() == 0) java.lang.Double.longBitsToDouble(prevBits)
      else {
        if (r.readBit() == 0) {
          val bits = r.readBits(prevLen) << (64 - prevLead - prevLen)
          prevBits ^= bits
        } else {
          prevLead = r.readBits(6).toInt
          prevLen = r.readBits(6).toInt + 1
          val trail = 64 - prevLead - prevLen
          prevBits ^= r.readBits(prevLen) << trail
        }
        java.lang.Double.longBitsToDouble(prevBits)
      }
    }

    var prevDelta = 0L
    if (len > 1) {
      prevDelta = unzigzag(r.readBits(64))
      ts(1) = ts(0) + prevDelta
      vs(1) = readValue()
    }
    var i = 2
    while (i < len) {
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) unzigzag(r.readBits(7))
        else if (r.readBit() == 0) unzigzag(r.readBits(12))
        else if (r.readBit() == 0) unzigzag(r.readBits(20))
        else unzigzag(r.readBits(64))
      prevDelta += dod
      ts(i) = ts(i - 1) + prevDelta
      vs(i) = readValue()
      i += 1
    }
    (ts, vs)
  }

  // ---------------- Spark surface ----------------

  /** `encodeCol(tsArray, valueArray)` -> binary Gorilla block. */
  def encodeCol(ts: Column, vs: Column): Column = {
    val f = udf((t: Array[Long], v: Array[Double]) => encode(t, v))
    f(ts, vs)
  }

  final case class Decoded(ts: Seq[Long], vs: Seq[Double])

  /** Inverse of [[encodeCol]]: binary -> struct(ts array, vs array). */
  def decodeCol(block: Column): Column = {
    val f = udf((b: Array[Byte]) => { val (t, v) = decode(b); Decoded(t, v) })
    f(block)
  }
}
