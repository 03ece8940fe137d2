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
}
