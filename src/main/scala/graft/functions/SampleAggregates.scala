package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state sampling aggregates (extension ladder step (b): a
  * custom Catalyst AGGREGATE where the built-ins can't bound the
  * exchange).
  *
  * The window formulation of a per-group bottom-k
  * (`row_number().over(partitionBy(grp).orderBy(h)) <= k`) only gets its
  * map-side partial pass when Spark's `InferWindowGroupLimit` rule
  * fires, and that rule is threshold-gated (default
  * `spark.sql.optimizer.windowGroupLimitThreshold` = 1000) — at sketch
  * sizes above it the ENTIRE data stream shuffles to the window. A
  * TypedImperativeAggregate has the partial pass by construction:
  * partial mode folds each input partition into a ≤ s-entry heap,
  * the exchange carries one serialized heap per (group × partition),
  * and final mode merges heaps — O(groups × partitions × s) bytes
  * however large the input, at any s.
  */
object SampleAggregates {

  /** max-heap of (h, v) pairs capped at s — head is the LARGEST kept
    * pair, evicted first when a smaller one arrives. */
  type Buf = scala.collection.mutable.PriorityQueue[(Long, Double)]

  /** Per-group bottom-s multiset of (h, v) pairs under lexicographic
    * (h, v) order, as a sorted-ascending `array<struct<h, v>>` —
    * exactly the rows the window formulation keeps, so the two
    * formulations interchange and share the DuckDB oracle. */
  final case class BottomKSampleAgg(
      hChild: Expression, vChild: Expression, s: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] {

    require(s >= 1, "s must be >= 1")

    override def children: Seq[Expression] = Seq(hChild, vChild)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))), containsNull = false)
    override def prettyName: String = "bottom_k_sample"

    override def createAggregationBuffer(): Buf =
      scala.collection.mutable.PriorityQueue.empty[(Long, Double)]

    override def update(buf: Buf, input: InternalRow): Buf = {
      val h = hChild.eval(input)
      val v = vChild.eval(input)
      if (h != null && v != null)
        add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      other.foreach { case (h, v) => add(buf, h, v) }
      buf
    }

    private def add(buf: Buf, h: Long, v: Double): Unit = {
      if (buf.size < s) buf.enqueue((h, v))
      else if (Ordering.Tuple2[Long, Double].lt((h, v), buf.head)) {
        buf.dequeue(); buf.enqueue((h, v))
      }
    }

    override def eval(buf: Buf): Any = {
      val arr = buf.toArray.sorted
      new GenericArrayData(arr.map { case (h, v) =>
        new GenericInternalRow(Array[Any](h, v)): Any })
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.enqueue((bb.getLong, bb.getDouble)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BottomKSampleAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKSampleAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BottomKSampleAgg =
      copy(hChild = newChildren(0), vChild = newChildren(1))
  }

  /** `bottom_k_sample(h, v, s)` as a Column aggregate. */
  def bottom_k_sample(h: Column, v: Column, s: Int): Column =
    GraftSqlBridge.column(
      BottomKSampleAgg(GraftSqlBridge.toCatalyst(h),
        GraftSqlBridge.toCatalyst(v), s).toAggregateExpression())

  /** Deterministic HyperLogLog distinct estimate as ONE aggregate call
    * — `SELECT grp, graft_hll(key, 64) ... GROUP BY grp` — producing
    * BIT-IDENTICAL estimates to the register-frame formulation
    * ([[graft.ops.Sketches.hllDistinct]]): same salted md5, same
    * 60-bit index / 32-bit rank slices, same exact-integer harmonic
    * sum and linear-counting branch, same HALF_UP rounding. The
    * register-frame form stays the choice when registers themselves
    * are the artifact (streaming partials, cross-batch merges); this
    * form bounds the exchange at m bytes per (group × partition) with
    * no intermediate frame — COUNT DISTINCT at 100 TB as a drop-in
    * SQL aggregate.
    *
    * The buffer is the register array itself (m bytes, rank ≤ 33
    * fits a byte); merge is element-wise max — the HLL monoid. */
  final case class HllSketchAgg(
      child: Expression, m: Int, salt: String = "hll",
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = DoubleType
    override def prettyName: String = "hll_sketch"

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val k = child.eval(input)
      if (k != null) {
        // per-thread digest (the MinhashExpressions convention):
        // MessageDigest is stateful and instances of this aggregate may
        // be shared wherever the plan is
        val md5 = MinhashExpressions.threadMd5.get()
        md5.reset()
        val digest = md5.digest(
          (salt + k.toString).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex chars = high 60 bits of bytes 0..7
        var h64 = 0L
        var i = 0
        while (i < 8) { h64 = (h64 << 8) | (digest(i) & 0xffL); i += 1 }
        val idx = ((h64 >>> 4) % m).toInt
        // hex chars 17..24 = bytes 8..11
        var v32 = 0L
        i = 8
        while (i < 12) { v32 = (v32 << 8) | (digest(i) & 0xffL); i += 1 }
        val rank =
          if (v32 == 0L) 33
          else 33 - (64 - java.lang.Long.numberOfLeadingZeros(v32))
        if (rank > buf(idx)) buf(idx) = rank.toByte
      }
      buf
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) {
        if (other(i) > buf(i)) buf(i) = other(i)
        i += 1
      }
      buf
    }

    override def eval(buf: Array[Byte]): Any = {
      var z = 0L
      var vZero = 0
      var i = 0
      while (i < m) {
        val r = buf(i) & 0xff
        if (r == 0) { vZero += 1; z += 8589934592L }
        else z += 1L << (33 - r)
        i += 1
      }
      val numer = graft.ops.Sketches.hllAlpha(m) * m * m * 8589934592.0d
      val raw = numer / z
      val est =
        if (raw <= 2.5 * m && vZero > 0)
          m.toDouble * math.log(m.toDouble / vZero)
        else raw
      // valueOf (string repr), not the exact-binary constructor — the
      // same choice Spark's Round makes, so boundary halves agree
      java.math.BigDecimal.valueOf(est)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    }

    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): HllSketchAgg =
      copy(child = newChildren(0))
  }

  /** `hll_sketch(key, m)` as a Column aggregate. */
  def hll_sketch(key: Column, m: Int, salt: String = "hll"): Column =
    GraftSqlBridge.column(
      HllSketchAgg(GraftSqlBridge.toCatalyst(key), m, salt)
        .toAggregateExpression())
}
