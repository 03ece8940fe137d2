package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tsdb.datasource.TsdbScan

/** DSv2 block reader: schema inference from the index, postings-backed
  * filter pushdown, block/chunk/sample time pruning, column pruning. */
class TsdbDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def corpus(t0: Long): Seq[(Seq[Label], Seq[Sample])] =
    for {
      job <- Seq("api", "api-canary", "web"); inst <- (0 to 2).map("i-" + _)
    } yield (
      Seq(Label("__name__", "up"), Label("job", job), Label("instance", inst)),
      (0 until 300).map(i => Sample(t0 + i * 15000L, (i % 17).toDouble)))

  /** Two time-disjoint blocks under one root. */
  private lazy val root: String = {
    val dir = Files.createTempDirectory("dsv2blocks")
    TsdbBlock.write(dir.resolve("b1"), corpus(1700000000000L), TsdbBlock.syntheticUlid(1))
    TsdbBlock.write(dir.resolve("b2"), corpus(1700010000000L), TsdbBlock.syntheticUlid(2))
    dir.toString
  }

  private def ds = spark.read.format("graft-tsdb").load(root)

  private def scanOf(df: org.apache.spark.sql.DataFrame): TsdbScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[TsdbScan]
    }.get

  test("schema: fixed columns + one column per label name") {
    assert(ds.schema.fieldNames.toSeq ==
      Seq("labels", "t", "v", "__name__", "instance", "job"))
  }

  test("full read matches the RDD block reader") {
    val viaRdd = TsdbBlock.read(spark, root + "/b1").count() +
      TsdbBlock.read(spark, root + "/b2").count()
    assert(ds.count() == viaRdd)
    assert(ds.count() == 2L * 9 * 300)
  }

  test("label equality is pushed to postings and rows match") {
    val q = ds.where(col("job") === "api").select("instance", "t", "v")
    val scan = scanOf(q)
    assert(scan.description().contains("eq=(job,Set(api))"))
    assert(q.count() == 2L * 3 * 300) // 3 instances x 2 blocks
    // flattened column values agree with the labels map
    val both = ds.where(col("job") === "api")
      .select(col("labels")("job").as("m"), col("job").as("c"))
    assert(both.where(col("m") =!= col("c")).count() == 0)
  }

  test("prefix matcher expands via label values (api matches api-canary too)") {
    val q = ds.where(col("job").startsWith("api"))
    assert(scanOf(q).description().contains("prefix=(job,api)"))
    assert(q.select("job").distinct().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("api", "api-canary"))
  }

  test("IN pushes as a postings union") {
    val q = ds.where(col("instance").isin("i-0", "i-2"))
    assert(scanOf(q).description().contains("(instance,"))
    assert(q.count() == 2L * 3 * 2 * 300)
  }

  test("time bounds prune blocks and clamp samples exactly") {
    // range covering only block 1 (b2 starts at t0+10^7)
    val q = ds.where(col("t").between(1700000000000L, 1700004499000L))
    val scan = scanOf(q)
    assert(scan.description().contains("time=[1700000000000,1700004499000]"))
    assert(scan.planInputPartitions().length > 0)
    assert(q.count() == 9L * 300) // all of b1, none of b2
    // sub-chunk clamp: first 10 samples only
    assert(ds.where(col("t") < 1700000150000L).count() == 9L * 10)
  }

  test("unsupported filters stay post-scan and still apply") {
    val q = ds.where(col("v") > 10.0 && col("job") === "web")
    assert(scanOf(q).description().contains("eq=(job,Set(web))"))
    assert(q.count() ==
      ds.where(col("job") === "web").where(col("v") > 10.0).count())
  }

  test("column pruning: projecting (t,v) still works, no label cells") {
    val q = ds.where(col("job") === "api").select(sum(col("v")).as("s"))
    assert(q.head().getDouble(0) == 2 * 3 * (0 until 300).map(_ % 17).sum.toDouble)
  }

  test("distributed block write matches the local writer byte-for-byte") {
    import spark.implicits._
    val long = corpus(1700000000000L).flatMap { case (ls, ss) =>
      ss.map(s => (ls.map(l => (l.name, l.value)), s.t, s.v))
    }
    val canonical = long.toDF("pairs", "t", "v")
      .select(expr("transform(pairs, p -> struct(p._1 as name, p._2 as value))").as("labels"),
        TsSchema.fingerprintCol(col("labels")).as("fingerprint"), col("t"), col("v"))
    val d1 = Files.createTempDirectory("distblk")
    val d2 = Files.createTempDirectory("localblk")
    val m1 = TsdbBlock.writeDistributed(canonical, d1.resolve("b"), TsdbBlock.syntheticUlid(7))
    val m2 = TsdbBlock.write(d2.resolve("b"), corpus(1700000000000L), TsdbBlock.syntheticUlid(7))
    assert(m1 == m2)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(d1.resolve("b/index")), Files.readAllBytes(d2.resolve("b/index"))))
    assert(java.util.Arrays.equals(
      Files.readAllBytes(d1.resolve("b/chunks/000001")),
      Files.readAllBytes(d2.resolve("b/chunks/000001"))))
  }

  test("distributed multi-segment write is byte-identical to the local writer") {
    import spark.implicits._
    val long = corpus(1700000000000L).flatMap { case (ls, ss) =>
      ss.map(s => (ls.map(l => (l.name, l.value)), s.t, s.v))
    }
    val canonical = long.toDF("pairs", "t", "v")
      .select(expr("transform(pairs, p -> struct(p._1 as name, p._2 as value))").as("labels"),
        TsSchema.fingerprintCol(col("labels")).as("fingerprint"), col("t"), col("v"))
    val d1 = Files.createTempDirectory("distseg")
    val d2 = Files.createTempDirectory("localseg")
    val m1 = TsdbBlock.writeDistributed(canonical, d1.resolve("b"),
      TsdbBlock.syntheticUlid(8), maxSegmentBytes = 2048)
    val m2 = TsdbBlock.write(d2.resolve("b"), corpus(1700000000000L),
      TsdbBlock.syntheticUlid(8), maxSegmentBytes = 2048)
    assert(m1 == m2)
    val segs = Files.list(d1.resolve("b/chunks")).toArray.map(_.toString).sorted
    assert(segs.length > 1, s"expected multiple segments, got ${segs.length}")
    segs.foreach { s =>
      val rel = d1.resolve("b").relativize(java.nio.file.Paths.get(s))
      assert(java.util.Arrays.equals(
        Files.readAllBytes(java.nio.file.Paths.get(s)),
        Files.readAllBytes(d2.resolve("b").resolve(rel))), s"segment $rel differs")
    }
    assert(java.util.Arrays.equals(
      Files.readAllBytes(d1.resolve("b/index")), Files.readAllBytes(d2.resolve("b/index"))))
  }

  test("multi-segment blocks: chunks spill across files, both readers stitch refs") {
    val dir = Files.createTempDirectory("multiseg")
    val t0 = 1700000000000L
    // tiny cap → many segment files (each chunk is ~100-200 bytes)
    TsdbBlock.write(dir.resolve("b"), corpus(t0), TsdbBlock.syntheticUlid(4),
      maxSegmentBytes = 2048)
    val segs = Files.list(dir.resolve("b/chunks")).count()
    assert(segs > 1, s"expected multiple segment files, got $segs")
    // contents identical to a single-segment write
    val ref = Files.createTempDirectory("singleseg")
    TsdbBlock.write(ref.resolve("b"), corpus(t0), TsdbBlock.syntheticUlid(4))
    val a = TsdbBlock.read(spark, dir.resolve("b").toString)
      .orderBy("t", "v").collect().toSeq
    val b = TsdbBlock.read(spark, ref.resolve("b").toString)
      .orderBy("t", "v").collect().toSeq
    assert(a == b)
    val viaDs = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
    assert(viaDs.count() == 9L * 300)
    assert(viaDs.where(col("job") === "web").count() == 3L * 300)
  }

  test("tombstones: round-trip, sample masking, whole-chunk drop in both readers") {
    // format round-trip
    val tmp = Files.createTempDirectory("tomb")
    val stones: Tombstones.Stones = Map(3L -> Seq((100L, 200L), (500L, 600L)), 9L -> Seq((0L, 50L)))
    Tombstones.write(tmp, stones)
    assert(Tombstones.read(tmp) == stones)
    assert(Tombstones.read(Files.createTempDirectory("empty")) == Map.empty)

    // block with a deleted range on ONE series: find job=api/i-0's ref,
    // delete its first chunk entirely plus a partial range of the second
    val dir = Files.createTempDirectory("tombblk")
    val t0 = 1700000000000L
    TsdbBlock.write(dir.resolve("b"), corpus(t0), TsdbBlock.syntheticUlid(3))
    val idx = new TsdbIndex.IndexReader(Files.readAllBytes(dir.resolve("b/index")))
    val ref = idx.postings("job", "api").filter(r =>
      idx.series(r).labels.contains(Label("instance", "i-0"))).head
    val chunks = idx.series(ref).chunks
    // interval covering all of chunk 0 and the first 10 samples of chunk 1
    val iv = (chunks(0).minTime, chunks(1).minTime + 9 * 15000L)
    Tombstones.write(dir.resolve("b"), Map(ref -> Seq(iv)))

    val expectedDeleted = 120 + 10
    // DSv2 path
    val ds2 = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
    assert(ds2.count() == 9L * 300 - expectedDeleted)
    assert(ds2.where(col("job") === "api" && col("instance") === "i-0").count() ==
      300L - expectedDeleted)
    // RDD block-read path agrees
    assert(TsdbBlock.read(spark, dir.resolve("b").toString).count() ==
      9L * 300 - expectedDeleted)
  }

  test("compaction merges blocks, materializes deletes, bumps the level") {
    val dir = Files.createTempDirectory("compact")
    val t0 = 1700000000000L
    val t1 = 1700010000000L
    val m1 = TsdbBlock.write(dir.resolve("b1"), corpus(t0), TsdbBlock.syntheticUlid(11))
    TsdbBlock.write(dir.resolve("b2"), corpus(t1), TsdbBlock.syntheticUlid(12))
    // delete one series' first 50 samples in b1
    val idx = new TsdbIndex.IndexReader(Files.readAllBytes(dir.resolve("b1/index")))
    val ref = idx.allPostings.head
    Tombstones.write(dir.resolve("b1"), Map(ref -> Seq((t0, t0 + 49 * 15000L))))

    val out = TsdbBlock.compact(spark,
      Seq(dir.resolve("b1").toString, dir.resolve("b2").toString),
      dir.resolve("c"), TsdbBlock.syntheticUlid(13))
    assert(out.level == 2)
    assert(out.stats.numSeries == 9)
    assert(out.stats.numSamples == 2L * 9 * 300 - 50) // deletes materialized
    assert(out.minTime == t0 + 50 * 15000L || out.minTime == t0) // dropped range may shift min of that series only
    // output block reads correctly and carries no tombstones
    assert(Tombstones.read(dir.resolve("c")) == Map.empty)
    val ds2 = spark.read.format("graft-tsdb").load(dir.resolve("c").toString)
    assert(ds2.count() == 2L * 9 * 300 - 50)
    // the merged series' samples are time-sorted and span both inputs
    val one = TsdbBlock.read(spark, dir.resolve("c").toString)
      .where(col("labels")("job") === "api" && col("labels")("instance") === "i-1")
      .select("t").collect().map(_.getLong(0)).toSeq
    assert(one.size == 600 && one == one.sorted)
    assert(m1.minTime == t0)
  }

  test("regex matcher rewrites to a pushed postings union (P7)") {
    val q = ds.where(col("job").rlike("^api"))
    // TsdbRegexRewrite turned the rlike into In(matching values), which
    // pushed as a postings union — nothing regex-shaped survives the plan
    val d = scanOf(q).description()
    assert(d.contains("eq=(job,Set(api, api-canary))"), d)
    assert(!q.queryExecution.executedPlan.toString.toLowerCase.contains("rlike"))
    assert(q.count() == 2L * 2 * 3 * 300)
  }

  test("negated regex pushes the Not(In) complement with null semantics") {
    val q = ds.where(!col("job").rlike("^api$")) // find(): matches exactly "api"
    assert(scanOf(q).description().contains("neq=(job,Set(api))"),
      scanOf(q).description())
    assert(q.select("job").distinct().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("api-canary", "web"))
  }

  test("!= matcher pushes as complement-of-values (P3 via P7)") {
    val q = ds.where(col("job") =!= "api")
    val d = scanOf(q).description()
    assert(d.contains("neq=(job,Set(api))"), d)
    assert(q.count() == 2L * 2 * 3 * 300)
  }

  test("IsNull/IsNotNull push as absent/present-label postings (P5)") {
    val dir = Files.createTempDirectory("mixedlabels")
    val t0 = 1700000000000L
    val mk = (i: Int) => (0 until 60).map(k => Sample(t0 + k * 15000L, i.toDouble))
    TsdbBlock.write(dir.resolve("b"), Seq(
      (Seq(Label("__name__", "up"), Label("job", "a")), mk(1)),
      (Seq(Label("__name__", "up"), Label("job", "b"), Label("canary", "1")), mk(2)),
      (Seq(Label("__name__", "up"), Label("job", "c"), Label("canary", "2")), mk(3))),
      TsdbBlock.syntheticUlid(21))
    val mixed = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
    val absent = mixed.where(col("canary").isNull)
    assert(scanOf(absent).description().contains("absent=canary"))
    assert(absent.select("job").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    val present = mixed.where(col("canary").isNotNull)
    assert(scanOf(present).description().contains("present=canary"))
    assert(present.count() == 2L * 60)
  }

  test("selective read fetches a small fraction of the segment (coalesced ranges)") {
    // 400-series block: a 1-series select must range-read its few chunks,
    // not the whole segment file (the scan-amplification guard at 100 TB)
    val dir = Files.createTempDirectory("rangeread")
    val t0 = 1700000000000L
    val many = (0 until 400).map { i =>
      (Seq(Label("__name__", "up"), Label("instance", f"i-$i%03d")),
        (0 until 300).map(k => Sample(t0 + k * 15000L, ((i * 31 + k) % 97).toDouble)))
    }
    TsdbBlock.write(dir.resolve("b"), many, TsdbBlock.syntheticUlid(22))
    val segSize = Files.size(dir.resolve("b/chunks/000001"))
    val one = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
      .where(col("instance") === "i-007")
    assert(one.collect().length == 300)
    // the scan's own runtime counters report the amplification (no JVM
    // globals needed): a 1/400-series select fetches KiB, not the segment
    val m = one.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get.metrics
    val fetched = m("bytesFetched").value
    assert(m("rangeReads").value > 0)
    assert(fetched > 0)
    assert(fetched < segSize / 10,
      s"fetched $fetched of $segSize-byte segment for a 1/400-series select")
  }

  test("repeated selection serves from the record cache: zero file reads") {
    // S7 (caching chunk reader): the second identical selection must hit
    // the per-JVM RecordCache for every chunk — no range reads, no bytes
    val dir = Files.createTempDirectory("recordcache")
    TsdbBlock.write(dir.resolve("b"), corpus(1700000000000L), TsdbBlock.syntheticUlid(23))
    def sel = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
      .where(col("job") === "web")
    assert(sel.collect().length == 3 * 300) // first pass fills the cache
    val second = sel
    ChunkFile.bytesFetched.set(0)
    assert(second.collect().length == 3 * 300)
    val m = second.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get.metrics
    assert(m("chunkCacheHits").value > 0)
    assert(m("rangeReads").value == 0)
    assert(m("bytesFetched").value == 0)
    assert(ChunkFile.bytesFetched.get() == 0, "second pass must not touch the file")
  }

  test("scan populates runtime IO counters (index cache + chunk IO)") {
    val q = ds.where(col("job") === "api")
    assert(q.collect().length == 2 * 3 * 300)
    val m = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get.metrics
    // every partition resolved its block index through the cache…
    assert(m("indexCacheHits").value + m("indexCacheMisses").value > 0)
    // …and every chunk came from a range read or the record cache
    assert(m("rangeReads").value + m("chunkCacheHits").value > 0)
    assert(m("chunkCacheHits").value + m("chunkCacheMisses").value > 0)
  }

  test("COUNT(*) is answered from block metadata with zero chunk IO") {
    import graft.tsdb.datasource.TsdbMetaStatsScan
    val agg = ds.groupBy().agg(count(lit(1)).as("n"),
      min(col("t")).as("mn"), max(col("t")).as("mx"))
    // sparkPlan (pre-AQE): the adaptive wrapper hides children pre-execution
    val scan = agg.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.isInstanceOf[TsdbMetaStatsScan], scan.getClass.getName)
    ChunkFile.bytesFetched.set(0)
    val row = agg.head()
    assert(row.getLong(0) == 2L * 9 * 300)
    assert(row.getLong(1) == 1700000000000L)
    assert(row.getLong(2) == 1700010000000L + 299 * 15000L)
    assert(ChunkFile.bytesFetched.get() == 0, "metadata stats must not read chunks")
    // restricted counts fall back to the decoding scan and stay correct
    assert(ds.where(col("job") === "api").count() == 2L * 3 * 300)
    assert(ds.where(col("t") < 1700000150000L).count() == 9L * 10)
    // a tombstoned block makes meta stale → pushdown refused, count exact
    val dir = Files.createTempDirectory("cnttomb")
    TsdbBlock.write(dir.resolve("b"), corpus(1700000000000L), TsdbBlock.syntheticUlid(31))
    val idx = new TsdbIndex.IndexReader(Files.readAllBytes(dir.resolve("b/index")))
    val ref = idx.allPostings.head
    Tombstones.write(dir.resolve("b"), Map(ref -> Seq((1700000000000L, 1700000000000L + 9 * 15000L))))
    val tds = spark.read.format("graft-tsdb").load(dir.resolve("b").toString)
    val tagg = tds.groupBy().count()
    val tscan = tagg.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(!tscan.isInstanceOf[TsdbMetaStatsScan])
    assert(tagg.head().getLong(0) == 9L * 300 - 10)
  }

  test("conjunction of matchers intersects postings") {
    val q = ds.where(col("job") === "api" && col("instance") === "i-1")
    assert(q.count() == 2L * 300)
    assert(q.select("labels").head().getMap[String, String](0).size == 3)
  }

  test("flat projections read through the columnar fast path") {
    import graft.tsdb.datasource.{TsdbInputPartition, TsdbReaderFactory}
    val factory = TsdbReaderFactory(spark.sparkContext.broadcast(
      new BlockIO.SerConf(spark.sparkContext.hadoopConfiguration)))
    val flatQ = ds.select("job", "instance", "t", "v").where(col("job") === "api")
    val flatParts = scanOf(flatQ).planInputPartitions()
    assert(flatParts.forall(factory.supportColumnarReads))
    // keeping the labels map falls back to the row reader
    val mapParts = scanOf(ds.select("labels", "t", "v")).planInputPartitions()
    assert(mapParts.forall(pt => !factory.supportColumnarReads(pt)))
    // the two readers produce identical data for the same partition
    val part = flatParts.head.asInstanceOf[TsdbInputPartition]
    val fi = part.fields.zipWithIndex.toMap
    val (ti, vi, ji) = (fi("t"), fi("v"), fi("job"))
    val colReader = factory.createColumnarReader(part)
    var colRows = 0L; var colSumV = 0.0; var colSumT = 0L; var nulls = 0
    while (colReader.next()) {
      val b = colReader.get()
      colRows += b.numRows()
      (0 until b.numRows()).foreach { r =>
        colSumT += b.column(ti).getLong(r)
        colSumV += b.column(vi).getDouble(r)
        if (b.column(ji).isNullAt(r)) nulls += 1
        else assert(b.column(ji).getUTF8String(r).toString.startsWith("api"))
      }
    }
    colReader.close()
    val rowReader = factory.createReader(part)
    var rowRows = 0L; var rowSumV = 0.0; var rowSumT = 0L
    while (rowReader.next()) {
      val r = rowReader.get()
      rowSumT += r.getLong(ti); rowSumV += r.getDouble(vi); rowRows += 1
    }
    assert(nulls == 0 && colRows == rowRows && colRows > 0)
    assert(colSumT == rowSumT && colSumV == rowSumV)
    // end-to-end through Spark: same aggregate either path
    assert(flatQ.count() == 2L * 3 * 300)
    val viaCol = flatQ.agg(sum("v").as("s")).head().getDouble(0)
    val viaRow = ds.where(col("job") === "api")
      .select(map_values(col("labels")).as("mv"), col("v"))
      .agg(sum("v").as("s")).head().getDouble(0)
    assert(viaCol == viaRow)
  }

  test("runtime filters prune postings at execution (V2 dynamic pruning)") {
    import org.apache.spark.sql.sources.{EqualTo, Filter, In}
    // the attributes Spark may runtime-filter on: the label columns
    val scan = scanOf(ds.select("job", "instance", "t", "v"))
    assert(scan.filterAttributes().map(_.fieldNames.mkString).toSet ==
      Set("job", "instance"))
    // simulate the join build side delivering its key set
    val before = scan.planInputPartitions().map(
      _.asInstanceOf[graft.tsdb.datasource.TsdbInputPartition].refs.length).sum
    scan.filter(Array[Filter](In("job", Array[Any]("api", "web"))))
    val after = scan.planInputPartitions().map(
      _.asInstanceOf[graft.tsdb.datasource.TsdbInputPartition].refs.length).sum
    assert(before == 2 * 9 && after == 2 * 6) // api-canary series dropped
    scan.filter(Array[Filter](EqualTo("instance", "i-1")))
    val narrowed = scan.planInputPartitions().map(
      _.asInstanceOf[graft.tsdb.datasource.TsdbInputPartition].refs.length).sum
    assert(narrowed == 2 * 2)
    // statistics follow the narrowed postings (AQE re-optimizes on them)
    assert(scan.estimateStatistics().numRows().getAsLong == 2L * 2 * 300)
    // end-to-end: a dim join over the label column stays correct
    val dim = spark.createDataFrame(Seq(("api", "prod"))).toDF("job", "tier")
    val joined = ds.join(dim, "job")
    assert(joined.count() == 2L * 3 * 300)
    assert(joined.select("tier").distinct().head().getString(0) == "prod")
  }

  test("scan reports postings-aware statistics (join sizing at scale)") {
    def stats(df: org.apache.spark.sql.DataFrame) =
      scanOf(df).estimateStatistics()
    val full = stats(ds)
    assert(full.numRows().getAsLong == 2L * 9 * 300)
    // one series of eighteen → 1/9 of the rows (both blocks keep 1 of 9)
    val one = stats(ds.where(col("job") === "web" && col("instance") === "i-0"))
    assert(one.numRows().getAsLong == 2L * 300)
    assert(one.sizeInBytes().getAsLong < full.sizeInBytes().getAsLong / 8)
    // time clamp scales the estimate by block overlap: half of b1, none
    // of b2 (b2 starts at 1700010000000L > the bound)
    val mid = 1700000000000L + 150 * 15000L
    val half = stats(ds.where(col("t") < mid))
    assert(half.numRows().getAsLong > 0)
    assert(half.numRows().getAsLong < full.numRows().getAsLong / 2 + 9 * 2)
    // the optimizer SEES these stats through the V2 relation
    val rel = ds.where(col("job") === "api").queryExecution.optimizedPlan
    assert(rel.stats.sizeInBytes < full.sizeInBytes().getAsLong)
  }

  test("RecordCache exposes hit/miss/eviction counters (groupcache parity)") {
    import ChunkFile.RecordCache
    // the reference exports these for its caching chunk reader
    // (pkg/chunkr/groupcache.go:17-27); the DSv2 scan has per-query
    // CustomMetrics, these cover every non-scan consumer of the cache
    val old = RecordCache.setMaxBytes(4096)
    try {
      val h0 = RecordCache.hits
      val m0 = RecordCache.misses
      val e0 = RecordCache.evictions
      val rec = ChunkFile.ChunkRecord(0L, XorChunk.Encoding, new Array[Byte](1500))
      assert(RecordCache.get("rc-spec", 0).isEmpty)
      assert(RecordCache.misses == m0 + 1)
      RecordCache.put("rc-spec", 0, rec)
      assert(RecordCache.get("rc-spec", 0).isDefined)
      assert(RecordCache.hits == h0 + 1)
      // cap 4096, cost 1564/entry: the third insert must evict the LRU
      RecordCache.put("rc-spec", 1, rec)
      RecordCache.put("rc-spec", 2, rec)
      assert(RecordCache.evictions > e0)
      assert(RecordCache.currentBytes <= 4096)
      assert(RecordCache.entryCount > 0)
      // evicted entry misses; the survivor still hits
      assert(RecordCache.get("rc-spec", 0).isEmpty)
      assert(RecordCache.get("rc-spec", 2).isDefined)
    } finally RecordCache.setMaxBytes(old)
  }
}
