package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet layout knobs for point-lookup-heavy corpus tables.
  *
  * At 100 TB the difference between "scan the partition" and "skip the
  * row group" is the parquet metadata written at CURATION time: split
  *-block bloom filters let a `doc_id IN (...)` or `url = ...` probe
  * skip row groups whose filter rejects the key without reading a data
  * page (Spark's parquet reader consults them through
  * `spark.sql.parquet.filterPushdown` — on by default), and min/max
  * stats do the same for range predicates IF the writer sorted by the
  * probe column first. Both are free to WRITE and paid back on every
  * probe; neither is retrofittable without rewriting the files — which
  * is why the writer helper, not the reader, owns them. */
object ParquetLayout {

  /** Write `df` with split-block bloom filters on `bloomCols`
    * (per-column `parquet.bloom.filter.enabled#col` writer options —
    * the public parquet-mr knobs, no Spark config mutation). Size the
    * filters with `expectedNdv` per row group: parquet derives the
    * filter bytes from it for ~1% false-positive rate. */
  def writeWithBloom(df: DataFrame, dir: String, bloomCols: Seq[String],
                     expectedNdv: Long = 100000L,
                     mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bloomCols.nonEmpty, "no bloom columns given")
    val w = bloomCols.foldLeft(df.write.mode(mode)) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }
    w.parquet(dir)
  }

  /** Write sorted-by-`sortCols` so row-group min/max stats prune range
    * and equality predicates (the poor man's index; compose with
    * [[writeWithBloom]]'s options via `alsoBloom`). A range
    * repartition precedes the sort so each output file covers a
    * DISJOINT key range — without it every file spans the whole
    * domain and min/max stats prune nothing. */
  def writeSorted(df: DataFrame, dir: String, sortCols: Seq[String],
                  numFiles: Int = 0,
                  alsoBloom: Seq[String] = Nil,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortCols.nonEmpty, "no sort columns given")
    import org.apache.spark.sql.functions.col
    val keys = sortCols.map(col)
    // explicit numFiles pins the range-partition count — without it AQE
    // is free to coalesce a small shuffle to ONE partition and the
    // "disjoint per-file ranges" property silently degrades to one file
    val parted =
      if (numFiles > 0) df.repartitionByRange(numFiles, keys: _*)
      else df.repartitionByRange(keys: _*)
    val sorted = parted.sortWithinPartitions(keys: _*)
    val w0 = sorted.write.mode(mode)
    val w = alsoBloom.foldLeft(w0) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    w.parquet(dir)
  }
}
