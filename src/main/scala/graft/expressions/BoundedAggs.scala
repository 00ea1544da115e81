package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst twins of the repo's bounded-state `Aggregator`s
  * (KMV distinct sketch, the TopK family) — r10 VERDICT items 1/3.
  *
  * `udaf(Aggregator)` plans as a ScalaAggregator whose UPDATE path runs
  * the input through an ExpressionEncoder deserializer per row (row ->
  * boxed case-class object, reflective field assembly) before the
  * Scala `reduce` sees it — measured ~2.7s single-core overhead across
  * a 7-column KMV profile pre-floor, and the same boxing sits on every
  * similarity/search ranking path through TopK. These
  * TypedImperativeAggregates read the child expressions' primitive
  * values straight off the input row into growable primitive buffers —
  * no encoder, no per-row allocation — and keep the EXACT reduce /
  * merge / finish semantics of the Aggregators they replace (same
  * compaction discipline, same orderings including the
  * `Ordering.by(-score)` negated-double and NaN placement, same
  * integer estimate arithmetic), so every declared result is
  * bit-identical; the legacy Aggregators stay for differential specs.
  */
private[graft] object BoundedAggs {
  /** Growable primitive long buffer. */
  final class LongBuf(initial: Int) {
    var arr = new Array[Long](initial)
    var len = 0
    def add(v: Long): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      arr(len) = v
      len += 1
    }
  }
}

// ---------------------------------------------------------------- KMV

/** K-minimum-values sketch as a native typed-imperative aggregate.
  * Input: u32 hash as LONG, negative = the callers' null sentinel
  * (skipped — `count(DISTINCT)` null semantics); null input skipped
  * the same way. `emitSketch = false` finishes to the integer
  * estimate ([[graft.functions.Kmv.KmvAggregator.finish]] arithmetic,
  * exact below k); `true` finishes to the sorted k-smallest-distinct
  * sketch ([[graft.functions.Kmv.KmvSketchAggregator]]). Compaction:
  * dedupe+sort+truncate to k when the buffer passes 4k — identical
  * lossless semilattice discipline, so estimates and sketches equal
  * the Aggregator's bit-for-bit. */
case class KmvAgg(child: Expression, k: Int, emitSketch: Boolean,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedAggs.LongBuf] {
  require(k > 1, "k must be > 1")
  private val cap = 4 * k

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (emitSketch) ArrayType(LongType, containsNull = false) else LongType

  override def createAggregationBuffer(): BoundedAggs.LongBuf =
    new BoundedAggs.LongBuf(math.min(cap, 64))

  private def compact(b: BoundedAggs.LongBuf): BoundedAggs.LongBuf = {
    if (b.len > k) {
      java.util.Arrays.sort(b.arr, 0, b.len)
      // in-place dedupe of the sorted prefix, keep at most k
      var w = 0
      var i = 0
      while (i < b.len && w < k) {
        if (w == 0 || b.arr(i) != b.arr(w - 1)) { b.arr(w) = b.arr(i); w += 1 }
        i += 1
      }
      b.len = w
    }
    b
  }

  override def update(b: BoundedAggs.LongBuf,
                      input: InternalRow): BoundedAggs.LongBuf = {
    val v = child.eval(input)
    if (v == null) return b
    val h = v.asInstanceOf[Long]
    if (h < 0) return b // null sentinel (hashes live in [0, 2^32))
    b.add(h)
    if (b.len >= cap) compact(b) else b
  }

  override def merge(a: BoundedAggs.LongBuf,
                     b: BoundedAggs.LongBuf): BoundedAggs.LongBuf = {
    var i = 0
    while (i < b.len) { a.add(b.arr(i)); i += 1 }
    compact(a)
  }

  /** sorted distinct k-smallest prefix (<= k values). */
  private def mins(b: BoundedAggs.LongBuf): Array[Long] = {
    compact(b)
    // compact() only fires past k entries; small buffers still need
    // the dedupe+sort for finish
    val sorted = java.util.Arrays.copyOf(b.arr, b.len)
    java.util.Arrays.sort(sorted)
    val out = new Array[Long](math.min(k, sorted.length))
    var w = 0
    var i = 0
    while (i < sorted.length && w < k) {
      if (w == 0 || sorted(i) != out(w - 1)) { out(w) = sorted(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  override def eval(b: BoundedAggs.LongBuf): Any = {
    val m = mins(b)
    if (emitSketch) new GenericArrayData(m)
    else if (m.length < k) m.length.toLong
    else (k - 1).toLong * 4294967296L / math.max(m(k - 1), 1L)
  }

  override def serialize(b: BoundedAggs.LongBuf): Array[Byte] = {
    compact(b)
    val bb = ByteBuffer.allocate(b.len * 8)
    var i = 0
    while (i < b.len) { bb.putLong(b.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedAggs.LongBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BoundedAggs.LongBuf(math.max(bytes.length / 8, 8))
    while (bb.remaining() >= 8) b.add(bb.getLong())
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** Integer-estimate form (replaces `udaf(new Kmv.KmvAggregator(k))`). */
  def estimate(c: Column, k: Int): Column =
    GraftSql.column(KmvAgg(GraftSql.expression(c), k, emitSketch = false)
      .toAggregateExpression())

  /** Sketch form (replaces `udaf(new Kmv.KmvSketchAggregator(k))`). */
  def sketch(c: Column, k: Int): Column =
    GraftSql.column(KmvAgg(GraftSql.expression(c), k, emitSketch = true)
      .toAggregateExpression())
}

// --------------------------------------------------------- TopK family

/** Shared buffer for the (sortA, sortB, payload...) bounded top-k
  * aggregates: parallel growable arrays, compact = order-and-truncate
  * to k when past 4k. Ordering is injected by the owner. */
private[graft] final class PairsBuf(initial: Int) {
  var longs = new Array[Long](initial) // ids / payloads
  var doubles = new Array[Double](initial) // scores
  var strsA: Array[String] = null // lazily allocated for string aggs
  var strsB: Array[String] = null
  var len = 0
  private def grow(n: Int): Unit = {
    longs = java.util.Arrays.copyOf(longs, n)
    doubles = java.util.Arrays.copyOf(doubles, n)
    if (strsA != null) strsA = java.util.Arrays.copyOf(strsA, n)
    if (strsB != null) strsB = java.util.Arrays.copyOf(strsB, n)
  }
  def ensure(): Unit = if (len == longs.length) grow(longs.length * 2)
  def needStrsA(): Unit =
    if (strsA == null) strsA = new Array[String](longs.length)
  def needStrsB(): Unit =
    if (strsB == null) strsB = new Array[String](longs.length)

  /** Keep entries at `idx.take(n)` in that order. */
  def select(idx: Array[Integer], n: Int): Unit = {
    val nl = new Array[Long](longs.length)
    val nd = new Array[Double](doubles.length)
    val na = if (strsA != null) new Array[String](strsA.length) else null
    val nb = if (strsB != null) new Array[String](strsB.length) else null
    var i = 0
    while (i < n) {
      val j = idx(i)
      nl(i) = longs(j); nd(i) = doubles(j)
      if (na != null) na(i) = strsA(j)
      if (nb != null) nb(i) = strsB(j)
      i += 1
    }
    longs = nl; doubles = nd; strsA = na; strsB = nb; len = n
  }
}

private[graft] abstract class BoundedTopKLike
    extends TypedImperativeAggregate[PairsBuf] {
  def k: Int
  protected final val cap = 4 * k
  override def nullable: Boolean = true
  override def createAggregationBuffer(): PairsBuf =
    new PairsBuf(math.min(cap, 64))

  /** Entry-at-index comparator — MUST replicate the legacy
    * Aggregator's `Ordering` exactly. */
  protected def compare(b: PairsBuf, i: Int, j: Int): Int

  protected final def sortedIdx(b: PairsBuf): Array[Integer] = {
    val idx = new Array[Integer](b.len)
    var i = 0
    while (i < b.len) { idx(i) = i; i += 1 }
    java.util.Arrays.sort(idx,
      new java.util.Comparator[Integer] {
        override def compare(x: Integer, y: Integer): Int =
          BoundedTopKLike.this.compare(b, x, y)
      })
    idx
  }

  protected final def compact(b: PairsBuf): PairsBuf = {
    if (b.len > k) b.select(sortedIdx(b), k)
    b
  }

  override final def merge(a: PairsBuf, b: PairsBuf): PairsBuf = {
    var i = 0
    while (i < b.len) {
      a.ensure()
      a.longs(a.len) = b.longs(i)
      a.doubles(a.len) = b.doubles(i)
      if (b.strsA != null) { a.needStrsA(); a.strsA(a.len) = b.strsA(i) }
      if (b.strsB != null) { a.needStrsB(); a.strsB(a.len) = b.strsB(i) }
      a.len += 1
      i += 1
    }
    compact(a)
  }

  protected final def finishIdx(b: PairsBuf): (Array[Integer], Int) = {
    val idx = sortedIdx(b)
    (idx, math.min(k, b.len))
  }

  protected final def nullInput(what: String): Nothing =
    throw new NullPointerException(
      s"Null value appeared in non-nullable $what input of a bounded " +
        "top-k aggregate")
}

/** [[graft.functions.TopK.TopKAggregator]] native twin: bounded
  * per-group top-k of (neighbor_id LONG, score DOUBLE), ordered
  * score DESC then id ASC via the SAME negated-double comparator
  * (NaN scores order last, -0.0/0.0 kept distinct like
  * `Ordering.by(-score)`). Output array<struct<neighbor_id,score>>. */
case class TopKAgg(id: Expression, score: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends BoundedTopKLike {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(id, score)
  // containsNull = true: matches the ExpressionEncoder schema the udaf
  // reported, so downstream query schemas stay byte-identical
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = true)

  override protected def compare(b: PairsBuf, i: Int, j: Int): Int = {
    val c = java.lang.Double.compare(-b.doubles(i), -b.doubles(j))
    if (c != 0) c else java.lang.Long.compare(b.longs(i), b.longs(j))
  }

  override def update(b: PairsBuf, input: InternalRow): PairsBuf = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i == null) nullInput("neighbor_id")
    if (s == null) nullInput("score")
    b.ensure()
    b.longs(b.len) = i.asInstanceOf[Long]
    b.doubles(b.len) = s.asInstanceOf[Double]
    b.len += 1
    if (b.len >= cap) compact(b) else b
  }

  override def eval(b: PairsBuf): Any = {
    val (idx, n) = finishIdx(b)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val j = idx(i)
      out(i) = InternalRow(b.longs(j), b.doubles(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: PairsBuf): Array[Byte] = {
    compact(b)
    val bb = ByteBuffer.allocate(b.len * 16)
    var i = 0
    while (i < b.len) { bb.putLong(b.longs(i)); bb.putDouble(b.doubles(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new PairsBuf(math.max(bytes.length / 16, 8))
    while (bb.remaining() >= 16) {
      b.ensure()
      b.longs(b.len) = bb.getLong()
      b.doubles(b.len) = bb.getDouble()
      b.len += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(id = newChildren(0), score = newChildren(1))
}

object TopKAgg {
  def apply(id: Column, score: Column, k: Int): Column =
    GraftSql.column(TopKAgg(GraftSql.expression(id),
      GraftSql.expression(score), k).toAggregateExpression())
}

/** [[graft.functions.TopK.TopTermsAggregator]] native twin:
  * (term STRING, score DOUBLE), score DESC then term ASC —
  * java.lang.String ordering, exactly the legacy `Ordering.by`. */
case class TopTermsAgg(term: Expression, score: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends BoundedTopKLike {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(term, score)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false))),
    containsNull = true)

  override protected def compare(b: PairsBuf, i: Int, j: Int): Int = {
    val c = java.lang.Double.compare(-b.doubles(i), -b.doubles(j))
    if (c != 0) c else b.strsA(i).compareTo(b.strsA(j))
  }

  override def update(b: PairsBuf, input: InternalRow): PairsBuf = {
    val t = term.eval(input)
    val s = score.eval(input)
    if (t == null) nullInput("term")
    if (s == null) nullInput("score")
    b.ensure(); b.needStrsA()
    b.strsA(b.len) = t.asInstanceOf[UTF8String].toString
    b.doubles(b.len) = s.asInstanceOf[Double]
    b.len += 1
    if (b.len >= cap) compact(b) else b
  }

  override def eval(b: PairsBuf): Any = {
    val (idx, n) = finishIdx(b)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val j = idx(i)
      out(i) = InternalRow(UTF8String.fromString(b.strsA(j)), b.doubles(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: PairsBuf): Array[Byte] = {
    compact(b)
    val strs = new Array[Array[Byte]](b.len)
    var bytes = 0
    var i = 0
    while (i < b.len) {
      strs(i) = b.strsA(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      bytes += 12 + strs(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    i = 0
    while (i < b.len) {
      bb.putDouble(b.doubles(i))
      bb.putInt(strs(i).length)
      bb.put(strs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new PairsBuf(8)
    b.needStrsA()
    while (bb.remaining() >= 12) {
      b.ensure(); b.needStrsA()
      b.doubles(b.len) = bb.getDouble()
      val n = bb.getInt()
      val sb = new Array[Byte](n)
      bb.get(sb)
      b.strsA(b.len) = new String(sb, java.nio.charset.StandardCharsets.UTF_8)
      b.len += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopTermsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopTermsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopTermsAgg =
    copy(term = newChildren(0), score = newChildren(1))
}

object TopTermsAgg {
  def apply(term: Column, score: Column, k: Int): Column =
    GraftSql.column(TopTermsAgg(GraftSql.expression(term),
      GraftSql.expression(score), k).toAggregateExpression())
}

/** [[graft.functions.TopK.MinKAggregator]] native twin: the k SMALLEST
  * (sort_key, id) string pairs per group with a long payload —
  * lexicographic java.lang.String ordering, exactly the legacy
  * `Ordering.by((e.sort_key, e.id))`. */
case class MinKAgg(sortKey: Expression, id: Expression,
                   payload: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends BoundedTopKLike {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(sortKey, id, payload)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sort_key", StringType, nullable = true),
    StructField("id", StringType, nullable = true),
    StructField("payload", LongType, nullable = false))),
    containsNull = true)

  override protected def compare(b: PairsBuf, i: Int, j: Int): Int = {
    val c = b.strsA(i).compareTo(b.strsA(j))
    if (c != 0) c else b.strsB(i).compareTo(b.strsB(j))
  }

  override def update(b: PairsBuf, input: InternalRow): PairsBuf = {
    val s = sortKey.eval(input)
    val i = id.eval(input)
    val p = payload.eval(input)
    if (s == null) nullInput("sort_key")
    if (i == null) nullInput("id")
    if (p == null) nullInput("payload")
    b.ensure(); b.needStrsA(); b.needStrsB()
    b.strsA(b.len) = s.asInstanceOf[UTF8String].toString
    b.strsB(b.len) = i.asInstanceOf[UTF8String].toString
    b.longs(b.len) = p.asInstanceOf[Long]
    b.len += 1
    if (b.len >= cap) compact(b) else b
  }

  override def eval(b: PairsBuf): Any = {
    val (idx, n) = finishIdx(b)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val j = idx(i)
      out(i) = InternalRow(UTF8String.fromString(b.strsA(j)),
        UTF8String.fromString(b.strsB(j)), b.longs(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: PairsBuf): Array[Byte] = {
    compact(b)
    val utf = java.nio.charset.StandardCharsets.UTF_8
    val sa = new Array[Array[Byte]](b.len)
    val sb2 = new Array[Array[Byte]](b.len)
    var bytes = 0
    var i = 0
    while (i < b.len) {
      sa(i) = b.strsA(i).getBytes(utf)
      sb2(i) = b.strsB(i).getBytes(utf)
      bytes += 16 + sa(i).length + sb2(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    i = 0
    while (i < b.len) {
      bb.putLong(b.longs(i))
      bb.putInt(sa(i).length); bb.put(sa(i))
      bb.putInt(sb2(i).length); bb.put(sb2(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PairsBuf = {
    val utf = java.nio.charset.StandardCharsets.UTF_8
    val bb = ByteBuffer.wrap(bytes)
    val b = new PairsBuf(8)
    while (bb.remaining() >= 16) {
      b.ensure(); b.needStrsA(); b.needStrsB()
      b.longs(b.len) = bb.getLong()
      val n1 = bb.getInt(); val a = new Array[Byte](n1); bb.get(a)
      val n2 = bb.getInt(); val c = new Array[Byte](n2); bb.get(c)
      b.strsA(b.len) = new String(a, utf)
      b.strsB(b.len) = new String(c, utf)
      b.len += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKAgg =
    copy(sortKey = newChildren(0), id = newChildren(1),
      payload = newChildren(2))
}

object MinKAgg {
  def apply(sortKey: Column, id: Column, payload: Column, k: Int): Column =
    GraftSql.column(MinKAgg(GraftSql.expression(sortKey),
      GraftSql.expression(id), GraftSql.expression(payload), k)
      .toAggregateExpression())
}
