package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity top-k buffer: a size-k binary MIN-heap over
  * (score, id) whose root is the WORST kept element, so a full buffer
  * admits a candidate with one root compare and evicts in O(log k).
  * Order matches the ranking the engine previously expressed as
  * `row_number() OVER (ORDER BY score DESC, id ASC)`: higher score is
  * better, ties prefer the smaller id, and doubles compare via
  * `java.lang.Double.compare` — the same total order (NaN greatest,
  * -0.0 < 0.0) Spark's physical double ordering uses, so the heap is
  * a drop-in for the window form. */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val score: Array[Double] = new Array[Double](math.max(k, 1))
  val id: Array[Long] = new Array[Long](math.max(k, 1))

  /** element 1 strictly worse than element 2 (lower rank priority). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && i1 > i2)
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = score(a); score(a) = score(b); score(b) = s
    val i = id(a); id(a) = id(b); id(b) = i
  }

  def insert(s: Double, i: Long): Unit = {
    if (k == 0) return
    if (size < k) {
      score(size) = s; id(size) = i
      var c = size
      size += 1
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(score(c), id(c), score(p), id(p))) { swap(c, p); c = p }
        else return
      }
    } else if (worse(score(0), id(0), s, i)) {
      score(0) = s; id(0) = i
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1
        val r = l + 1
        var w = c // worst of the triple sifts toward the root
        if (l < size && worse(score(l), id(l), score(w), id(w))) w = l
        if (r < size && worse(score(r), id(r), score(w), id(w))) w = r
        if (w == c) done = true
        else { swap(c, w); c = w }
      }
    }
  }

  /** (id, score) pairs best-first — score desc, id asc on ties. */
  def sortedDesc(): Array[(Long, Double)] = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(score(b), score(a))
      if (c != 0) c else java.lang.Long.compare(id(a), id(b))
    })
    idx.map(j => (id(j), score(j)))
  }
}

/**
 * Bounded-heap exact top-k aggregate: the scale-safe replacement for
 * `row_number() OVER (PARTITION BY group ORDER BY score DESC, id)` +
 * `rank <= k`. The window form funnels EVERY candidate row of a group
 * through one sorting task; this TypedImperativeAggregate keeps at
 * most k (score, id) pairs per group per map task (partial aggregation
 * under ObjectHashAggregate), so the shuffle carries k rows per group
 * per partition instead of the full candidate set, and no task ever
 * materializes more than k elements per group. Identical output to
 * the window form by construction (same comparator; asserted in
 * ExpressionsSpec against a reference sort).
 *
 * Returns `array<struct<id, score, rank>>` best-first; callers
 * `inline` / `explode` it back to rows.
 */
case class TopKAggExpr(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false

  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("rank", IntegerType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // null score/id rows rank nowhere (the window form's Filter
    // upstream never produced them either)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < b2.size) { b1.insert(b2.score(j), b2.id(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc()
    new GenericArrayData(sorted.zipWithIndex.map { case ((i, s), r) =>
      InternalRow(i, s, r + 1)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.score(j)); bb.putLong(buf.id(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggExpr =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "bounded_top_k"
}

/** String-keyed sibling of [[TopKBuffer]]: a size-k binary MIN-heap
  * over (count, token) whose root is the WORST kept element. Order
  * matches `row_number() OVER (ORDER BY count DESC, token ASC)`:
  * higher count is better, ties prefer the binary-smaller token
  * (UTF8String.compareTo — the same byte-wise order Spark's physical
  * string sort uses). Tokens are cloned on admission: the evaluated
  * UTF8String may be backed by a reused row buffer. */
final class TopKTokBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  var size: Int = 0
  val cnt: Array[Long] = new Array[Long](math.max(k, 1))
  val tok: Array[UTF8String] = new Array[UTF8String](math.max(k, 1))

  /** element 1 strictly worse than element 2 (lower rank priority). */
  @inline private def worse(c1: Long, t1: UTF8String,
      c2: Long, t2: UTF8String): Boolean =
    c1 < c2 || (c1 == c2 && t1.compareTo(t2) > 0)

  @inline private def swap(a: Int, b: Int): Unit = {
    val c = cnt(a); cnt(a) = cnt(b); cnt(b) = c
    val t = tok(a); tok(a) = tok(b); tok(b) = t
  }

  def insert(c: Long, t: UTF8String): Unit = {
    if (k == 0) return
    if (size < k) {
      cnt(size) = c; tok(size) = t.clone()
      var x = size
      size += 1
      while (x > 0) {
        val p = (x - 1) >> 1
        if (worse(cnt(x), tok(x), cnt(p), tok(p))) { swap(x, p); x = p }
        else return
      }
    } else if (worse(cnt(0), tok(0), c, t)) {
      cnt(0) = c; tok(0) = t.clone()
      var x = 0
      var done = false
      while (!done) {
        val l = 2 * x + 1
        val r = l + 1
        var w = x
        if (l < size && worse(cnt(l), tok(l), cnt(w), tok(w))) w = l
        if (r < size && worse(cnt(r), tok(r), cnt(w), tok(w))) w = r
        if (w == x) done = true
        else { swap(x, w); x = w }
      }
    }
  }

  /** (token, count) pairs best-first — count desc, token asc on ties. */
  def sortedDesc(): Array[(UTF8String, Long)] = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c = java.lang.Long.compare(cnt(b), cnt(a))
      if (c != 0) c else tok(a).compareTo(tok(b))
    })
    idx.map(j => (tok(j), cnt(j)))
  }
}

/**
 * Bounded-heap exact top-k-tokens aggregate: the scale-safe
 * replacement for `row_number() OVER (PARTITION BY group ORDER BY
 * count DESC, token ASC)` + `rank <= k` when the ranked key is a
 * STRING (the languageId profile cut — VERDICT r05 finding #1: the
 * window form sorted each language's ENTIRE distinct-token table
 * through one task; this keeps k tokens per language per map task).
 * Identical output to the window form by construction (same
 * comparator; UTF8String.compareTo is the byte order the window sort
 * used). Returns `array<struct<token, cnt>>` best-first.
 */
case class TopKTokAggExpr(
    cntExpr: Expression, tokExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTokBuffer] {
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(cntExpr, tokExpr)
  override def nullable: Boolean = false

  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): TopKTokBuffer = new TopKTokBuffer(k)

  override def update(buf: TopKTokBuffer, input: InternalRow): TopKTokBuffer = {
    val c = cntExpr.eval(input)
    val t = tokExpr.eval(input)
    if (c != null && t != null)
      buf.insert(c.asInstanceOf[Long], t.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: TopKTokBuffer, b2: TopKTokBuffer): TopKTokBuffer = {
    var j = 0
    while (j < b2.size) { b1.insert(b2.cnt(j), b2.tok(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKTokBuffer): Any = {
    val sorted = buf.sortedDesc()
    new GenericArrayData(sorted.map { case (t, c) => InternalRow(t, c) })
  }

  override def serialize(buf: TopKTokBuffer): Array[Byte] = {
    var bytes = 0
    var j = 0
    while (j < buf.size) { bytes += buf.tok(j).numBytes(); j += 1 }
    val bb = java.nio.ByteBuffer.allocate(8 + buf.size * 12 + bytes)
    bb.putInt(buf.k); bb.putInt(buf.size)
    j = 0
    while (j < buf.size) {
      bb.putLong(buf.cnt(j))
      val tb = buf.tok(j).getBytes
      bb.putInt(tb.length); bb.put(tb)
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTokBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKTokBuffer(bb.getInt)
    val n = bb.getInt
    var j = 0
    while (j < n) {
      val c = bb.getLong
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.insert(c, UTF8String.fromBytes(tb))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTokAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTokAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKTokAggExpr =
    copy(cntExpr = newChildren(0), tokExpr = newChildren(1))
  override def prettyName: String = "bounded_top_tokens"
}
