package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Capacity-bounded id list + exact total count. `df` counts EVERY
  * input row; `ids` stops growing at `cap` elements. The invariant
  * that makes the bound lossless for the n-gram index: size <= df
  * always, so a group whose true df is <= cap never truncates — its
  * id list is complete — while a group over the cap is dropped by the
  * caller's `df <= cap` filter anyway, so its (truncated) ids are
  * never read. Insert order is preserved within a partial buffer but
  * NOT across merges — callers must be order-independent in `ids`
  * (the unordered-pair expansion and the per-doc size count both
  * are). */
final class BoundedIdsBuffer(val cap: Int) {
  var df: Long = 0L
  var size: Int = 0
  var ids: Array[Long] = new Array[Long](math.max(math.min(cap, 8), 1))

  def insert(id: Long): Unit = {
    df += 1L
    if (size < cap) {
      if (size == ids.length)
        ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))
      ids(size) = id
      size += 1
    }
  }

  def mergeFrom(o: BoundedIdsBuffer): Unit = {
    df += o.df
    var j = 0
    if (size + o.size > ids.length && size < cap)
      ids = java.util.Arrays.copyOf(ids, math.min(cap, math.max(size + o.size, ids.length)))
    while (j < o.size && size < cap) { ids(size) = o.ids(j); size += 1; j += 1 }
  }
}

/**
 * One-pass replacement for the n-gram inverted index's
 * count-then-anti-join-then-collect pipeline (guide §2.3/§2.4): the
 * old shape shuffled every posting TWICE (once for the hot-shingle
 * census, once for the kept-posting collect_list) and persisted a
 * corpus-sized shingle table to feed both passes. This
 * TypedImperativeAggregate does the census and the collection in the
 * SAME partial-aggregated pass with per-group memory bounded by `cap`
 * — a stop-shingle held by 10^9 documents accumulates cap ids + one
 * counter per map task, never a corpus-sized list. Returns
 * `struct(df, ids)`; callers filter `df <= cap`, which is exactly the
 * set the anti-join kept, with exactly the same (complete) id lists.
 */
case class BoundedIdsAggExpr(
    idExpr: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedIdsBuffer] {

  override def children: Seq[Expression] = Seq(idExpr)
  override def nullable: Boolean = false

  override val dataType: DataType = StructType(Seq(
    StructField("df", LongType),
    StructField("ids", ArrayType(LongType))))

  override def createAggregationBuffer(): BoundedIdsBuffer = new BoundedIdsBuffer(cap)

  override def update(buf: BoundedIdsBuffer, input: InternalRow): BoundedIdsBuffer = {
    val v = idExpr.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BoundedIdsBuffer, b2: BoundedIdsBuffer): BoundedIdsBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: BoundedIdsBuffer): Any =
    InternalRow(buf.df,
      new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.size)))

  override def serialize(buf: BoundedIdsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + buf.size * 8)
    bb.putInt(buf.cap); bb.putLong(buf.df); bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedIdsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BoundedIdsBuffer(bb.getInt)
    val df = bb.getLong
    val n = bb.getInt
    var j = 0
    while (j < n) { buf.insert(bb.getLong); j += 1 }
    buf.df = df // insert() counted the kept ids; restore the true census
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedIdsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedIdsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedIdsAggExpr =
    copy(idExpr = newChildren(0))
  override def prettyName: String = "bounded_posting_ids"
}

/** Capacity-bounded point collection + exact span stats for
  * [[graft.operators.SeriesFeatures.boundedCollect]]: counts every
  * row and tracks min/max t exactly; keeps at most `cap` (t, i, m, w)
  * points. size <= count always, so a series whose true count is
  * <= cap never truncates — its point set is complete — while a
  * hotter series is dropped by the caller's `n_obs <= cap` filter and
  * re-aggregated through the scalar-state Bins path. */
final class BoundedPointsBuffer(val cap: Int) {
  var cnt: Long = 0L
  var tMin: Double = Double.PositiveInfinity
  var tMax: Double = Double.NegativeInfinity
  var size: Int = 0
  var t: Array[Double] = new Array[Double](8)
  var i: Array[Long] = new Array[Long](8)
  var m: Array[Double] = new Array[Double](8)
  var w: Array[Double] = new Array[Double](8)

  private def grow(min: Int): Unit = {
    var c = t.length
    while (c < min) c = math.min(math.max(cap, 8), c * 2)
    t = java.util.Arrays.copyOf(t, c); i = java.util.Arrays.copyOf(i, c)
    m = java.util.Arrays.copyOf(m, c); w = java.util.Arrays.copyOf(w, c)
  }

  def insert(tv: Double, iv: Long, mv: Double, wv: Double): Unit = {
    cnt += 1L
    if (tv < tMin) tMin = tv
    if (tv > tMax) tMax = tv
    if (size < cap) {
      if (size == t.length) grow(size + 1)
      t(size) = tv; i(size) = iv; m(size) = mv; w(size) = wv
      size += 1
    }
  }

  def mergeFrom(o: BoundedPointsBuffer): Unit = {
    cnt += o.cnt
    if (o.tMin < tMin) tMin = o.tMin
    if (o.tMax > tMax) tMax = o.tMax
    var j = 0
    val keep = math.min(o.size, cap - size)
    if (keep > 0 && size + keep > t.length) grow(size + keep)
    while (j < keep) {
      t(size) = o.t(j); i(size) = o.i(j); m(size) = o.m(j); w(size) = o.w(j)
      size += 1; j += 1
    }
  }

  /** In-place sort by the full (t, i, m, w) lexicographic order —
    * exactly `sort_array` over the collected struct, so the emitted
    * array is bit-identical to the collect_list path. */
  def sortLex(): Unit = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      var c = java.lang.Double.compare(t(a), t(b))
      if (c == 0) c = java.lang.Long.compare(i(a), i(b))
      if (c == 0) c = java.lang.Double.compare(m(a), m(b))
      if (c == 0) c = java.lang.Double.compare(w(a), w(b))
      c
    })
    val (t2, i2, m2, w2) = (new Array[Double](size), new Array[Long](size),
      new Array[Double](size), new Array[Double](size))
    var k = 0
    while (k < size) {
      val j = idx(k); t2(k) = t(j); i2(k) = i(j); m2(k) = m(j); w2(k) = w(j)
      k += 1
    }
    t = t2; i = i2; m = m2; w = w2
  }
}

/**
 * One-pass replacement for boundedCollect's span-stats + join + small
 * collect pipeline (guide §2.4): the two-pass form scanned the input
 * THREE times (span aggregate, small-branch collect, large-branch
 * bins) and shuffled it twice plus a corpus-wide join. This aggregate
 * produces the span stats AND the under-cap point sets in ONE
 * partial-aggregated pass; only over-cap (hot) series — rare by the
 * operator's own contract — are re-scanned, via a join against the
 * tiny hot-key set. Output `struct(n_obs, t0, t1, p)` where `p` is
 * the (t,i,m,w)-lexicographically sorted point array, bit-identical
 * to `sort_array(collect_list(struct(...)))` for any series with
 * n_obs <= cap (truncated-and-unused otherwise: eval emits an empty
 * array for over-cap groups).
 */
case class BoundedPointsAggExpr(
    tc: Expression, ic: Expression, mc: Expression, wc: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedPointsBuffer] {

  override def children: Seq[Expression] = Seq(tc, ic, mc, wc)
  override def nullable: Boolean = false

  override val dataType: DataType = StructType(Seq(
    StructField("n_obs", LongType),
    StructField("t0", DoubleType), StructField("t1", DoubleType),
    StructField("p", ArrayType(StructType(Seq(
      StructField("t", DoubleType), StructField("i", LongType),
      StructField("m", DoubleType), StructField("w", DoubleType)))))))

  override def createAggregationBuffer(): BoundedPointsBuffer =
    new BoundedPointsBuffer(cap)

  override def update(buf: BoundedPointsBuffer, input: InternalRow): BoundedPointsBuffer = {
    buf.insert(
      tc.eval(input).asInstanceOf[Double], ic.eval(input).asInstanceOf[Long],
      mc.eval(input).asInstanceOf[Double], wc.eval(input).asInstanceOf[Double])
    buf
  }

  override def merge(b1: BoundedPointsBuffer, b2: BoundedPointsBuffer): BoundedPointsBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: BoundedPointsBuffer): Any = {
    val pts: GenericArrayData =
      if (buf.cnt > cap) new GenericArrayData(Array.empty[Any])
      else {
        buf.sortLex()
        new GenericArrayData(Array.tabulate[Any](buf.size)(k =>
          InternalRow(buf.t(k), buf.i(k), buf.m(k), buf.w(k))))
      }
    InternalRow(buf.cnt, buf.tMin, buf.tMax, pts)
  }

  override def serialize(buf: BoundedPointsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 16 + 4 + buf.size * 32)
    bb.putInt(buf.cap); bb.putLong(buf.cnt)
    bb.putDouble(buf.tMin); bb.putDouble(buf.tMax); bb.putInt(buf.size)
    var k = 0
    while (k < buf.size) {
      bb.putDouble(buf.t(k)); bb.putLong(buf.i(k))
      bb.putDouble(buf.m(k)); bb.putDouble(buf.w(k))
      k += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedPointsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BoundedPointsBuffer(bb.getInt)
    val cnt = bb.getLong
    val tMin = bb.getDouble; val tMax = bb.getDouble
    val n = bb.getInt
    var k = 0
    while (k < n) { buf.insert(bb.getDouble, bb.getLong, bb.getDouble, bb.getDouble); k += 1 }
    buf.cnt = cnt; buf.tMin = tMin; buf.tMax = tMax
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedPointsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedPointsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedPointsAggExpr =
    copy(tc = newChildren(0), ic = newChildren(1), mc = newChildren(2),
      wc = newChildren(3))
  override def prettyName: String = "bounded_points"
}
