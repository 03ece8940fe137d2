package graft.tsdb

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native block path over the Hadoop `FileSystem` abstraction
  * ([[BlockIO]]): every test here drives an explicit `file://` URI, so
  * block IO goes through Hadoop's `LocalFileSystem` — the same code path
  * an `s3a://`/`hdfs://` deployment takes (the reference's defining
  * deployment: blocks in a bucket, `db.go:93-102`, `shipper.go:252-325`)
  * — rather than `java.nio` local files. */
class TsdbHadoopFsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def corpus(t0: Long): Seq[(Seq[Label], Seq[Sample])] =
    for {
      job <- Seq("api", "web"); inst <- (0 to 2).map("i-" + _)
    } yield (
      Seq(Label("__name__", "up"), Label("job", job), Label("instance", inst)),
      (0 until 250).map(i => Sample(t0 + i * 15000L, (i % 13).toDouble)))

  private def fileUri(p: java.nio.file.Path): String = "file://" + p.toString

  test("block write + DSv2 read through a file:// URI") {
    val dir = Files.createTempDirectory("hfsblocks")
    val t0 = 1700000000000L
    TsdbBlock.write(fileUri(dir) + "/b1", corpus(t0), TsdbBlock.syntheticUlid(61))
    TsdbBlock.write(fileUri(dir) + "/b2", corpus(t0 + 10000000L), TsdbBlock.syntheticUlid(62))

    val ds = spark.read.format("graft-tsdb").load(fileUri(dir))
    assert(ds.count() == 2L * 6 * 250)
    // postings pushdown still applies through the URI path
    assert(ds.where(col("job") === "api").count() == 2L * 3 * 250)
    // identical rows via the plain local path
    val plain = spark.read.format("graft-tsdb").load(dir.toString)
      .select("t", "v", "job", "instance").orderBy("t", "job", "instance", "v")
    val viaUri = spark.read.format("graft-tsdb").load(fileUri(dir))
      .select("t", "v", "job", "instance").orderBy("t", "job", "instance", "v")
    assert(viaUri.collect().toSeq == plain.collect().toSeq)
  }

  test("distributed write to a file:// URI is byte-identical to the local writer") {
    import spark.implicits._
    val t0 = 1700000000000L
    val long = corpus(t0).flatMap { case (ls, ss) =>
      ss.map(s => (ls.map(l => (l.name, l.value)), s.t, s.v))
    }
    val canonical = long.toDF("pairs", "t", "v")
      .select(expr("transform(pairs, p -> struct(p._1 as name, p._2 as value))").as("labels"),
        TsSchema.fingerprintCol(col("labels")).as("fingerprint"), col("t"), col("v"))
    val d1 = Files.createTempDirectory("hfsdist")
    val d2 = Files.createTempDirectory("hfslocal")
    // executors write segment files through the broadcast Hadoop conf
    val m1 = TsdbBlock.writeDistributed(canonical, fileUri(d1) + "/b",
      TsdbBlock.syntheticUlid(63))
    val m2 = TsdbBlock.write(d2.resolve("b"), corpus(t0), TsdbBlock.syntheticUlid(63))
    assert(m1 == m2)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(d1.resolve("b/index")), Files.readAllBytes(d2.resolve("b/index"))))
    assert(java.util.Arrays.equals(
      Files.readAllBytes(d1.resolve("b/chunks/000001")),
      Files.readAllBytes(d2.resolve("b/chunks/000001"))))
  }

  test("tombstones round-trip and are honored through a file:// URI") {
    val dir = Files.createTempDirectory("hfsstones")
    val t0 = 1700000000000L
    TsdbBlock.write(fileUri(dir) + "/b", corpus(t0), TsdbBlock.syntheticUlid(64))
    val before = spark.read.format("graft-tsdb").load(fileUri(dir) + "/b").count()
    val idx = new TsdbIndex.IndexReader(
      BlockIO.readAllBytes(fileUri(dir) + "/b/index"))
    val ref = idx.allPostings.head
    val iv = (t0, t0 + 49 * 15000L) // first 50 samples of one series
    Tombstones.write(fileUri(dir) + "/b", Map(ref -> Seq(iv)))
    assert(Tombstones.read(fileUri(dir) + "/b") == Map(ref -> Seq(iv)))
    spark.catalog.refreshByPath(fileUri(dir) + "/b")
    val after = spark.read.format("graft-tsdb").load(fileUri(dir) + "/b").count()
    assert(after == before - 50)
  }

  test("coalesced chunk range reads work against a file:// URI") {
    val dir = Files.createTempDirectory("hfsranges")
    TsdbBlock.write(fileUri(dir) + "/b", corpus(1700000000000L),
      TsdbBlock.syntheticUlid(65))
    val idx = new TsdbIndex.IndexReader(
      BlockIO.readAllBytes(fileUri(dir) + "/b/index"))
    val refs = idx.allPostings.take(2).flatMap(r => idx.series(r).chunks.map(_.ref))
    val recs = ChunkFile.readRefs(fileUri(dir) + "/b/chunks", refs)
    assert(recs.keySet == refs.toSet)
    recs.values.foreach(r => assert(XorChunk.decode(r.data).nonEmpty))
  }

  test("syncDir ingests from a file:// blocks root and is idempotent") {
    val blocks = Files.createTempDirectory("hfssync")
    val store = Files.createTempDirectory("hfsstore").toString
    (0 until 2).foreach { i =>
      val ulid = TsdbBlock.syntheticUlid(660 + i)
      TsdbBlock.write(fileUri(blocks) + "/" + ulid,
        corpus(1700000000000L + i * 10000000L), ulid)
    }
    val first = TsdbBlock.syncDir(spark, fileUri(blocks), store)
    assert(first.size == 2)
    assert(TsdbBlock.syncDir(spark, fileUri(blocks), store).isEmpty)
    assert(spark.read.parquet(store).count() == 2L * 6 * 250)
  }

  test("hidden checksum sidecars never surface in block listings") {
    val dir = Files.createTempDirectory("hfscrc")
    TsdbBlock.write(fileUri(dir) + "/b", corpus(1700000000000L),
      TsdbBlock.syntheticUlid(67))
    // LocalFileSystem writes .crc sidecars next to each file — they must
    // be invisible to the format's own listings
    assert(Files.list(dir.resolve("b")).iterator().asScala.exists(
      _.getFileName.toString.startsWith(".")),
      "expected LocalFileSystem checksum sidecars on disk")
    assert(BlockIO.listNames(fileUri(dir) + "/b").forall(!_.startsWith(".")))
    assert(graft.tsdb.datasource.TsdbBlockTable.blockDirs(fileUri(dir))
      .map(d => new org.apache.hadoop.fs.Path(d).getName) == Seq("b"))
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
