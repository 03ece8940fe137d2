package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The persistent temporal-dedup index store: batch-partitioned
  * appends, the distinct-fold view, compaction through the shared
  * monoid protocol (view unchanged, marker recorded, file count
  * bounded), and replay inertness after folding. */
class TemporalIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def rows(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("id", "dh")
  }

  private def viewSet(path: String): Set[(Long, Long)] =
    Multimodal.temporalIndexView(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("append + view ≡ distinct union; compaction preserves the view") {
    val dir = Files.createTempDirectory("graft-tidx").toString + "/idx"
    val a = Seq((1L, 100L), (1L, 101L), (2L, 200L))
    val b = Seq((2L, 200L), (3L, 300L)) // overlap with batch 0
    Multimodal.temporalIndexAppend(rows(a: _*), dir, 0L)
    Multimodal.temporalIndexAppend(rows(b: _*), dir, 1L)
    val expect = (a ++ b).toSet
    assert(viewSet(dir) == expect)

    // replaying an UNFOLDED batch is idempotent (Overwrite per dir)
    Multimodal.temporalIndexAppend(rows(b: _*), dir, 1L)
    assert(viewSet(dir) == expect)

    Multimodal.compactTemporalIndex(spark, dir, targetFiles = 2)
    assert(viewSet(dir) == expect, "compaction changed the view")
    // the store is now the fold plus the marker: batch=-1 only
    val dirs = graft.tsdb.BlockIO.listDirNames(dir)
      .filter(_.startsWith("batch="))
    assert(dirs == Seq("batch=-1"))
    // file count bounded by targetFiles (+ parquet bookkeeping)
    val parts = graft.tsdb.BlockIO.listNames(dir + "/batch=-1")
      .count(_.endsWith(".parquet"))
    assert(parts <= 2, s"$parts part files after targetFiles=2 compaction")

    // a batch REPLAYED after its rows were folded is inert, not doubled
    Multimodal.temporalIndexAppend(rows(b: _*), dir, 1L)
    assert(viewSet(dir) == expect, "folded-batch replay leaked back in")

    // fresh batches after compaction join the view
    Multimodal.temporalIndexAppend(rows((4L, 400L)), dir, 2L)
    assert(viewSet(dir) == expect + ((4L, 400L)))

    // a second compaction folds the tail too
    Multimodal.compactTemporalIndex(spark, dir, targetFiles = 2)
    assert(viewSet(dir) == expect + ((4L, 400L)))
  }

  test("the compacted store drives temporalNearDupAgainst unchanged") {
    val dir = Files.createTempDirectory("graft-tidx2").toString + "/idx"
    // corpus clip 7 carries sub-hashes {0x0F, 0xF0}
    Multimodal.temporalIndexAppend(rows((7L, 0x0fL), (7L, 0xf0L)), dir, 0L)
    Multimodal.compactTemporalIndex(spark, dir)
    val fresh = rows((99L, 0x0eL)) // hamming 1 from 0x0f
    val hits = Multimodal.temporalNearDupAgainst(
        fresh, Multimodal.temporalIndexView(spark, dir), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((99L, 7L, 1L)))
  }
}
