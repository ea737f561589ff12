package graft.plans

import graft.ref.Feature
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive buffer for one (conv_id, bucket) group: the
  * typed-aggregate replacement for `sort_array(collect_list(struct))`
  * — no per-row struct boxing, no array-of-struct comparator sort, no
  * UDF encoder boundary on the finish path. */
final class BucketBuffer(var size: Int,
    var t: Array[Double], var i: Array[Long],
    var m: Array[Double], var w: Array[Double]) {

  def this() = this(0, new Array[Double](8), new Array[Long](8),
    new Array[Double](8), new Array[Double](8))

  private def grow(min: Int): Unit = {
    var cap = t.length
    while (cap < min) cap *= 2
    t = java.util.Arrays.copyOf(t, cap)
    i = java.util.Arrays.copyOf(i, cap)
    m = java.util.Arrays.copyOf(m, cap)
    w = java.util.Arrays.copyOf(w, cap)
  }

  def append(tv: Double, iv: Long, mv: Double, wv: Double): Unit = {
    if (size == t.length) grow(size + 1)
    t(size) = tv; i(size) = iv; m(size) = mv; w(size) = wv
    size += 1
  }

  def appendAll(o: BucketBuffer): Unit = {
    if (size + o.size > t.length) grow(size + o.size)
    System.arraycopy(o.t, 0, t, size, o.size)
    System.arraycopy(o.i, 0, i, size, o.size)
    System.arraycopy(o.m, 0, m, size, o.size)
    System.arraycopy(o.w, 0, w, size, o.size)
    size += o.size
  }

  /** In-place sort of all four columns by (t, i) — the engine's
    * deterministic total order (stable (conv_id, turn_idx) per the
    * correctness gate; t leads, idx breaks ties). */
  def sortByTime(): Unit = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(t(a), t(b))
      if (c != 0) c else java.lang.Long.compare(i(a), i(b))
    })
    val (t2, i2, m2, w2) = (new Array[Double](size), new Array[Long](size),
      new Array[Double](size), new Array[Double](size))
    var k = 0
    while (k < size) {
      val j = idx(k)
      t2(k) = t(j); i2(k) = i(j); m2(k) = m(j); w2(k) = w(j)
      k += 1
    }
    t = t2; i = i2; m = m2; w = w2
  }
}

/**
 * Native per-bucket rollup aggregate: accumulates (t, idx, m, w) as
 * primitive arrays, and on finish sorts by (t, idx) and runs the SAME
 * single-node kernel battery as [[graft.engine.Rollup.evalBucketRaw]]
 * — bit-parity with the collect_list path by construction (asserted
 * in RollupParitySpec). Runs under ObjectHashAggregate with map-side
 * partial merge and sort-based spill fallback (serialized buffers).
 */
case class BucketAggExpr(
    tc: Expression, ic: Expression, mc: Expression, wc: Expression,
    features: Seq[Feature],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BucketBuffer] {

  override def children: Seq[Expression] = Seq(tc, ic, mc, wc)
  override def nullable: Boolean = false

  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType), StructField("sumW", DoubleType),
    StructField("sumMw", DoubleType), StructField("binM", DoubleType),
    StructField("binW", DoubleType),
    StructField("feats", ArrayType(DoubleType))))

  override def createAggregationBuffer(): BucketBuffer = new BucketBuffer()

  override def update(buf: BucketBuffer, input: InternalRow): BucketBuffer = {
    buf.append(
      tc.eval(input).asInstanceOf[Double],
      ic.eval(input).asInstanceOf[Long],
      mc.eval(input).asInstanceOf[Double],
      wc.eval(input).asInstanceOf[Double])
    buf
  }

  override def merge(b1: BucketBuffer, b2: BucketBuffer): BucketBuffer = {
    b1.appendAll(b2); b1
  }

  override def eval(buf: BucketBuffer): Any = {
    buf.sortByTime()
    val n = buf.size
    val t = if (buf.t.length == n) buf.t else java.util.Arrays.copyOf(buf.t, n)
    val m = if (buf.m.length == n) buf.m else java.util.Arrays.copyOf(buf.m, n)
    val w = if (buf.w.length == n) buf.w else java.util.Arrays.copyOf(buf.w, n)
    val p = graft.engine.Rollup.evalBucketRaw(features)(t, m, w)
    InternalRow(p.n, p.sumW, p.sumMw, p.binM, p.binW, new GenericArrayData(p.feats))
  }

  override def serialize(buf: BucketBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 32)
    bb.putInt(buf.size)
    var k = 0
    while (k < buf.size) {
      bb.putDouble(buf.t(k)); bb.putLong(buf.i(k))
      bb.putDouble(buf.m(k)); bb.putDouble(buf.w(k))
      k += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BucketBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BucketBuffer(0, new Array[Double](math.max(n, 1)),
      new Array[Long](math.max(n, 1)), new Array[Double](math.max(n, 1)),
      new Array[Double](math.max(n, 1)))
    var k = 0
    while (k < n) {
      buf.append(bb.getDouble, bb.getLong, bb.getDouble, bb.getDouble)
      k += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketAggExpr =
    copy(tc = newChildren(0), ic = newChildren(1), mc = newChildren(2),
      wc = newChildren(3))
  override def prettyName: String = "bucket_rollup"
}

/** Carry variant buffer: tier points entering a coarser tier bring
  * their (n, sumW, sumMw) carries alongside (t, i, m, w). */
final class CarryBuffer(var size: Int,
    var t: Array[Double], var i: Array[Long],
    var m: Array[Double], var w: Array[Double],
    var n: Array[Long], var sw: Array[Double], var smw: Array[Double]) {

  def this() = this(0, new Array[Double](8), new Array[Long](8),
    new Array[Double](8), new Array[Double](8), new Array[Long](8),
    new Array[Double](8), new Array[Double](8))

  private def grow(min: Int): Unit = {
    var cap = t.length
    while (cap < min) cap *= 2
    t = java.util.Arrays.copyOf(t, cap); i = java.util.Arrays.copyOf(i, cap)
    m = java.util.Arrays.copyOf(m, cap); w = java.util.Arrays.copyOf(w, cap)
    n = java.util.Arrays.copyOf(n, cap); sw = java.util.Arrays.copyOf(sw, cap)
    smw = java.util.Arrays.copyOf(smw, cap)
  }

  def append(tv: Double, iv: Long, mv: Double, wv: Double,
      nv: Long, swv: Double, smwv: Double): Unit = {
    if (size == t.length) grow(size + 1)
    t(size) = tv; i(size) = iv; m(size) = mv; w(size) = wv
    n(size) = nv; sw(size) = swv; smw(size) = smwv
    size += 1
  }

  def appendAll(o: CarryBuffer): Unit = {
    if (size + o.size > t.length) grow(size + o.size)
    System.arraycopy(o.t, 0, t, size, o.size); System.arraycopy(o.i, 0, i, size, o.size)
    System.arraycopy(o.m, 0, m, size, o.size); System.arraycopy(o.w, 0, w, size, o.size)
    System.arraycopy(o.n, 0, n, size, o.size); System.arraycopy(o.sw, 0, sw, size, o.size)
    System.arraycopy(o.smw, 0, smw, size, o.size)
    size += o.size
  }

  def sortByTime(): Unit = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(t(a), t(b))
      if (c != 0) c else java.lang.Long.compare(i(a), i(b))
    })
    val t2 = new Array[Double](size); val i2 = new Array[Long](size)
    val m2 = new Array[Double](size); val w2 = new Array[Double](size)
    val n2 = new Array[Long](size); val sw2 = new Array[Double](size)
    val smw2 = new Array[Double](size)
    var k = 0
    while (k < size) {
      val j = idx(k)
      t2(k) = t(j); i2(k) = i(j); m2(k) = m(j); w2(k) = w(j)
      n2(k) = n(j); sw2(k) = sw(j); smw2(k) = smw(j)
      k += 1
    }
    t = t2; i = i2; m = m2; w = w2; n = n2; sw = sw2; smw = smw2
  }
}

/** Cascade-tier variant of [[BucketAggExpr]]: carries ride the buffer
  * and are re-summed at finish by the same
  * [[graft.engine.Rollup.evalBucket]] pass as the collect_list path. */
case class CarryBucketAggExpr(
    tc: Expression, ic: Expression, mc: Expression, wc: Expression,
    nc: Expression, swc: Expression, smwc: Expression,
    features: Seq[Feature],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CarryBuffer] {

  override def children: Seq[Expression] = Seq(tc, ic, mc, wc, nc, swc, smwc)
  override def nullable: Boolean = false

  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType), StructField("sumW", DoubleType),
    StructField("sumMw", DoubleType), StructField("binM", DoubleType),
    StructField("binW", DoubleType),
    StructField("feats", ArrayType(DoubleType))))

  override def createAggregationBuffer(): CarryBuffer = new CarryBuffer()

  override def update(buf: CarryBuffer, input: InternalRow): CarryBuffer = {
    buf.append(
      tc.eval(input).asInstanceOf[Double], ic.eval(input).asInstanceOf[Long],
      mc.eval(input).asInstanceOf[Double], wc.eval(input).asInstanceOf[Double],
      nc.eval(input).asInstanceOf[Long], swc.eval(input).asInstanceOf[Double],
      smwc.eval(input).asInstanceOf[Double])
    buf
  }

  override def merge(b1: CarryBuffer, b2: CarryBuffer): CarryBuffer = {
    b1.appendAll(b2); b1
  }

  override def eval(buf: CarryBuffer): Any = {
    buf.sortByTime()
    val sz = buf.size
    def dd(a: Array[Double]) = if (a.length == sz) a else java.util.Arrays.copyOf(a, sz)
    def ll(a: Array[Long]) = if (a.length == sz) a else java.util.Arrays.copyOf(a, sz)
    val p = graft.engine.Rollup.evalBucket(features)(
      dd(buf.t), dd(buf.m), dd(buf.w), ll(buf.n), dd(buf.sw), dd(buf.smw))
    InternalRow(p.n, p.sumW, p.sumMw, p.binM, p.binW, new GenericArrayData(p.feats))
  }

  override def serialize(buf: CarryBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 56)
    bb.putInt(buf.size)
    var k = 0
    while (k < buf.size) {
      bb.putDouble(buf.t(k)); bb.putLong(buf.i(k)); bb.putDouble(buf.m(k))
      bb.putDouble(buf.w(k)); bb.putLong(buf.n(k)); bb.putDouble(buf.sw(k))
      bb.putDouble(buf.smw(k))
      k += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CarryBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val buf = new CarryBuffer()
    var k = 0
    while (k < sz) {
      buf.append(bb.getDouble, bb.getLong, bb.getDouble, bb.getDouble,
        bb.getLong, bb.getDouble, bb.getDouble)
      k += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CarryBucketAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CarryBucketAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CarryBucketAggExpr =
    copy(tc = newChildren(0), ic = newChildren(1), mc = newChildren(2),
      wc = newChildren(3), nc = newChildren(4), swc = newChildren(5),
      smwc = newChildren(6))
  override def prettyName: String = "carry_bucket_rollup"
}
