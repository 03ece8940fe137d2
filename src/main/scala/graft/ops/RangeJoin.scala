package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — the scale-right form of `point BETWEEN lo AND hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop (or a
  * cartesian when neither side fits in memory): every point compared
  * against every interval per key. The bucketed form turns it into a
  * plain shuffle EQUI-join: time is cut into fixed-width buckets, each
  * interval explodes into the buckets it covers, each point maps to its
  * single bucket, and the join key becomes (key, bucket) with the exact
  * containment check as a cheap post-filter. Cost is
  * |intervals| × (span/bucketWidth) exploded rows instead of
  * |points| × |intervals| comparisons — at 100 TB that is the
  * difference between a shuffle join and an impossible nested loop.
  * (The same strategy Databricks ships as its range-join optimization;
  * here it is an explicit operator any Spark cluster runs.)
  *
  * A point lands in exactly ONE bucket, so no post-join dedup is ever
  * needed — each (point, containing interval) pair appears once.
  *
  * Pick `bucketWidth` near the median interval length: much smaller
  * multiplies the interval explosion; much larger makes every bucket a
  * mini nested loop. Degenerate long intervals (span ≫ bucketWidth)
  * multiply rows linearly — cap or split them upstream if unbounded.
  */
object RangeJoin {

  /** Exact floor division of the named LONG column by a positive
    * constant, in pure integer arithmetic: `long / long` in Spark SQL is
    * DOUBLE division, which misassigns buckets for |t| > 2^53
    * (epoch-nanos territory) and would silently drop matching pairs.
    * `t - pmod(t, w)` is the floor multiple (pmod is non-negative), so
    * the integral `div` is exact at any magnitude. */
  private def floorDiv(colName: String, w: Long) =
    expr(s"(`$colName` - pmod(`$colName`, ${w}L)) div ${w}L")

  /** Inner-join `points` (columns: `key`, `t`, + payload) against
    * `intervals` (columns: `key`, `lo`, `hi`, + payload) on key equality
    * and `lo <= t <= hi` (both ends inclusive). Times are LONGs in any
    * consistent unit (epoch days/ms/ns — bucket math is exact integer
    * floor division, no 2^53 double limit); column names must not
    * collide beyond `key`.
    *
    * The join strategy is pinned to sort-merge unless
    * `broadcastIntervals` opts in: Catalyst sizes the interval side
    * BEFORE the bucket explode, so a fact-sized interval set routinely
    * slips under the broadcast threshold and Spark builds a
    * millions-of-rows hashed relation on the driver — measured 3×
    * slower than the shuffle join at sf0.1, and a straight driver OOM
    * at cluster scale. Sort-merge shuffles both sides on
    * (key, bucket) and spills gracefully under skew. Set
    * `broadcastIntervals = true` only when the interval side is a
    * genuine dimension (fits comfortably in executor memory AFTER
    * exploding). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      bucketWidth: Long,
                      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__b", floorDiv("t", bucketWidth))
    val i = intervals.withColumn("__b",
      explode(sequence(floorDiv("lo", bucketWidth),
        floorDiv("hi", bucketWidth))))
    val ih = if (broadcastIntervals) broadcast(i) else i.hint("merge")
    p.join(ih, Seq("key", "__b"))
      .where(col("t") >= col("lo") && col("t") <= col("hi"))
      .drop("__b")
  }

  /** Interval×interval overlap join (the genomics/temporal "overlap"
    * shape): inner-join `left` (columns: `key`, `lo`, `hi`, + payload)
    * against `right` (columns: `key`, `rlo`, `rhi`, + payload) on key
    * equality and interval overlap `lo <= rhi && rlo <= hi` (closed
    * ends). Each overlapping pair is emitted EXACTLY once.
    *
    * Same scale shape as [[pointInInterval]]: both sides explode to
    * their covered bucket range, the overlap inequality runs as a
    * (key, bucket) EQUI-join with a post-filter, and a pair that shares
    * several buckets is kept only in the bucket of `greatest(lo, rlo)`
    * — the first bucket both intervals cover, so the dedup is a
    * stateless filter, never a `distinct` shuffle. Pick `bucketWidth`
    * near the typical interval length: explode factor is
    * ~(len/width + 1) per row, candidate pairs per bucket shrink as
    * width drops. Sort-merge pinned for the same pre-explode
    * misestimate reason as [[pointInInterval]]; `broadcastRight` is the
    * explicit dim-side opt-in. */
  def intervalOverlap(left: DataFrame, right: DataFrame, bucketWidth: Long,
                      broadcastRight: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__b",
      explode(sequence(floorDiv("lo", bucketWidth), floorDiv("hi", bucketWidth))))
    val r0 = right.withColumn("__b",
      explode(sequence(floorDiv("rlo", bucketWidth), floorDiv("rhi", bucketWidth))))
    val r = if (broadcastRight) broadcast(r0) else r0.hint("merge")
    l.join(r, Seq("key", "__b"))
      .where(col("lo") <= col("rhi") && col("rlo") <= col("hi"))
      .where(col("__b") === expr(
        s"(greatest(`lo`, `rlo`) - pmod(greatest(`lo`, `rlo`), ${bucketWidth}L)) div ${bucketWidth}L"))
      .drop("__b")
  }
}
