package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("zValue interleaves bits; rangeBucket clamps and is integral") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 8))
    val zs = df.orderBy("x", "y").collect().map(_.getLong(2))
    // hand-computed mortons: (0,0)=0, (0,1)=2, (1,0)=1, (3,5)=
    // x bits 11, y bits 101 -> interleaved y2 x2 y1 x1 y0 x0 = 100111 = 39
    assert(zs.toSeq == Seq(0L, 2L, 1L, 39L, 65535L))
    // rangeBucket: linear, clamped, exact at edges
    val b = Seq(-5L, 0L, 127L, 255L, 999L).toDF("v")
      .select(ZOrder.rangeBucket(col("v"), 0L, 255L, 8).as("b"))
      .orderBy("b").collect().map(_.getLong(0))
    assert(b.toSeq == Seq(0L, 0L, 127L, 255L, 255L))
  }

  test("z-order layout prunes box queries on BOTH dimensions; linear on one") {
    // 64×64 uniform grid of (u, t) points — the adversarial case for a
    // linear sort (every u value spans every t value)
    val pts = (for (u <- 0 until 64; t <- 0 until 64)
      yield (u.toLong, t.toLong)).toDF("u", "t")
    val files = 16

    // carve a layout into `files` equal chunks in its sort order and
    // keep each chunk's (min,max) box — exactly the file statistics a
    // scan's data-skipping consults
    def boxes(ordered: Seq[(Long, Long)]): Seq[((Long, Long), (Long, Long))] =
      ordered.grouped(ordered.size / files).map { chunk =>
        ((chunk.map(_._1).min, chunk.map(_._1).max),
          (chunk.map(_._2).min, chunk.map(_._2).max))
      }.toSeq

    val zOrdered = ZOrder.cluster(pts, Seq(col("u"), col("t")), bits = 6, files)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val zBoxes = boxes(zOrdered)
    val linBoxes = boxes(pts.orderBy("u", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

    def candidates(bs: Seq[((Long, Long), (Long, Long))],
                   uLo: Long, uHi: Long, tLo: Long, tHi: Long): Int =
      bs.count { case ((uMin, uMax), (tMin, tMax)) =>
        uMax >= uLo && uMin <= uHi && tMax >= tLo && tMin <= tHi
      }

    // an 8×8 box (1/64 of the area): the z layout touches a handful of
    // files; the linear layout prunes on u (leading) but NOT on t
    val zBox = candidates(zBoxes, 8, 15, 8, 15)
    assert(zBox <= 4, s"z-order box query hit $zBox of $files files")
    // filter on t alone: linear layout reads EVERY file
    val linT = candidates(linBoxes, 0, 63, 8, 15)
    assert(linT == files, s"linear layout should not prune on t, got $linT")
    val zT = candidates(zBoxes, 0, 63, 8, 15)
    assert(zT <= files / 2, s"z-order t-slice hit $zT of $files files")
    // filter on u alone: both layouts prune (z a bit coarser)
    assert(candidates(linBoxes, 8, 15, 0, 63) <= 3)
    assert(candidates(zBoxes, 8, 15, 0, 63) <= files / 2)
  }

  test("cluster writes contiguous z-ranges per output partition") {
    val pts = (for (u <- 0 until 32; t <- 0 until 32)
      yield (u.toLong, t.toLong)).toDF("u", "t")
    val clustered = ZOrder.cluster(pts, Seq(col("u"), col("t")), bits = 5, 8)
    // partitions cover disjoint, sorted z-ranges (range partitioning +
    // in-partition sort) — each output file is one tight z interval
    val ranges = clustered.select(col("zval"))
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((pid, zs.head, zs.last, zs == zs.sorted))
      }.collect().sortBy(_._1)
    assert(ranges.forall(_._4), "each partition must be z-sorted")
    ranges.sliding(2).foreach {
      case Array((_, _, aMax, _), (_, bMin, _, _)) => assert(aMax <= bMin)
      case _ => ()
    }
  }
}
