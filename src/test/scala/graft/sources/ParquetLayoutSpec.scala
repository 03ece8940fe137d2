package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Parquet layout knobs: bloom filters actually land in the footer and
  * answer membership; sorted writes give disjoint per-file stats. */
class ParquetLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("writeWithBloom: filters present in footers, membership answers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom").resolve("t").toString
    val df = spark.range(0, 5000).select(
      (col("id") * 7919L).as("doc_id"), col("id").cast("string").as("s"))
    ParquetLayout.writeWithBloom(df.repartition(1), dir,
      bloomCols = Seq("doc_id"), expectedNdv = 5000L)
    val conf = spark.sparkContext.hadoopConfiguration
    var sawFilter = false
    parquetFiles(dir).foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getRowGroups.forEach { rg =>
          rg.getColumns.forEach { cc =>
            if (cc.getPath.toDotString == "doc_id") {
              assert(cc.getBloomFilterOffset > 0, "no bloom filter written")
              val bloom = reader.readBloomFilter(cc)
              assert(bloom != null)
              sawFilter = true
              // every present key answers yes; absent keys mostly no
              (0L until 200L).foreach { i =>
                assert(bloom.findHash(bloom.hash(i * 7919L))) }
              val falsePos = (1L to 500L)
                .count(i => bloom.findHash(bloom.hash(i * 7919L + 1L)))
              assert(falsePos < 50, s"bloom useless: $falsePos/500 false hits")
            }
          }
        }
      } finally reader.close()
    }
    assert(sawFilter)
    // reads stay exact through the layout
    assert(spark.read.parquet(dir).where(col("doc_id") === 7919L * 42L)
      .count() == 1L)
  }

  test("writeSorted: per-file min/max ranges are disjoint and prune") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sorted").resolve("t").toString
    val df = spark.range(0, 40000).select(
      pmod(col("id") * 2654435761L, lit(40000L)).as("k"),
      col("id").as("payload"))
    ParquetLayout.writeSorted(df.repartition(8), dir, sortCols = Seq("k"), numFiles = 6)
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = parquetFiles(dir).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        var lo = Long.MaxValue; var hi = Long.MinValue
        reader.getRowGroups.forEach { rg =>
          rg.getColumns.forEach { cc =>
            if (cc.getPath.toDotString == "k") {
              val st = cc.getStatistics
              lo = math.min(lo,
                st.genericGetMin.asInstanceOf[java.lang.Long].longValue())
              hi = math.max(hi,
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
            }
          }
        }
        if (lo <= hi) Some((lo, hi)) else None
      } finally reader.close()
    }.sortBy(_._1)
    assert(ranges.length > 1)
    // disjoint: each file's min exceeds the previous file's max — this
    // is exactly what lets a point predicate skip all files but one
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(lo2 > hi1)
      case _ => ()
    }
    assert(spark.read.parquet(dir).where(col("k") === 123L).count() ==
      df.where(col("k") === 123L).count())
  }
}
