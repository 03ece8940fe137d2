package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for scan
  * pruning at 100 TB: interleaving the bits of two or more bucketed
  * dimensions into one sort key makes rows close in EVERY dimension
  * land in the same files, so per-file min/max ranges (parquet
  * row-group/file statistics, the data-skipping index every lakehouse
  * format builds on) stay tight in all dimensions at once. A linear
  * sort prunes only its leading column; a z-order layout prunes box
  * queries on any clustered dimension.
  *
  * Everything here is closed-form integer arithmetic (shift/mask/or),
  * so the key is engine-portable and exactly oracle-checkable, and the
  * whole computation stays inside whole-stage codegen.
  */
object ZOrder {

  /** Map a value in [lo, hi] to a `bits`-bit bucket (0 .. 2^bits - 1),
    * linear in the value; out-of-range values clamp. Closed-form, so an
    * external engine reproduces the bucket exactly. */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 31 && hi > lo, "need 0 < bits <= 31, hi > lo")
    val n = 1L << bits
    val span = hi - lo + 1
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi))
    // integral divide (`div`), not Column./ — double division rounds
    // near bucket edges and would disagree with an integer-arithmetic
    // oracle on exact boundaries
    call_function("div", (clamped - lo) * lit(n), lit(span))
  }

  /** The Morton interleave of `dims` bucketed dimensions, `bits` bits
    * each: bit j of dimension i lands at position j·d + i (dimension 0
    * owns the least-significant slot of each group). Inputs must be
    * non-negative and < 2^bits — use [[rangeBucket]]. The expression is
    * a fixed fan-in of shift/mask/or terms (d·bits of them), fully
    * codegen'd. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 62,
      "need dims, and dims*bits <= 62")
    val d = dims.size
    val terms = for {
      (dim, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(dim.cast("long"), j).bitwiseAND(lit(1L)),
      j * d + i).cast("long")
    terms.reduce(_ + _) // disjoint bit positions: sum == or
  }

  /** The identical interleave as SQL text over pre-bucketed columns —
    * the oracle-side mirror of [[zValue]] (DuckDB `&`, `<<`, `>>`). */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val d = dims.size
    val terms = for {
      (dim, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield s"((($dim >> $j) & 1) << ${j * d + i})"
    terms.mkString(" + ")
  }

  /** Cluster `df` for writing: range-partition on the z-value into
    * `numFiles` output partitions and sort within each — every output
    * file then covers one contiguous z-range, which is the tight
    * min/max box the scan-side pruning reads. (`partitionBy` would
    * create one DIRECTORY per value; range partitioning keeps the file
    * count fixed and the files balanced.) */
  def cluster(df: DataFrame, dims: Seq[Column], bits: Int,
              numFiles: Int): DataFrame = {
    val z = zValue(dims, bits).as("zval")
    df.withColumn("zval", z)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
