package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tsdb._

/** Scale sanity harness (not part of the driver contract): builds a
  * multi-day synthetic series corpus through the WRITTEN-store path and
  * reports select/aggregate latencies + partition layout, to validate the
  * design holds beyond the sf corpora. Usage: runMain graft.ScaleCheck
  * [nSeries] [nSamplesPerSeries] */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val nSeries = if (args.nonEmpty) args(0).toInt else 2000
    val nSamples = if (args.length > 1) args(1).toInt else 5760 // 2 days @30s
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_SCALE_SECTION=curate runs just the end-to-end
    // curation rehearsal (iteration on one section shouldn't cost the
    // ~25-minute full sweep)
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("curate")) {
      curateAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("dsir")) {
      dsirAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("shuffle")) {
      shuffleAtScale(spark)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("govern")) {
      governAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("expo")) {
      expoAtScale(spark)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("nhist")) {
      nativeHistAtScale(spark)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("qsketch")) {
      qsketchAtScale(spark)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("web")) {
      webIngestAtScale(spark)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("media")) {
      mediaDedupAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("mixed")) {
      mixedMediaAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("wds")) {
      webdatasetAtScale(spark)
      graft.ops.Dedup.clearSharedPersists()
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_SCALE_SECTION").contains("rangejoin")) {
      rangeJoinAtScale(spark)
      spark.stop()
      return
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-scale").resolve("store").toString

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // generate long form distributed (never collected on the driver)
    val t0ms = 1700000000000L
    val base = spark.range(nSeries.toLong * nSamples)
      .select(
        (col("id") / nSamples).cast("long").as("series"),
        pmod(col("id"), lit(nSamples)).as("k"))
      .select(col("series"),
        (lit(t0ms) + col("k") * 30000L).as("t"),
        (col("series") + col("k")).cast("double").as("v"))
    // codegen'd static-label canonicalization (no per-row lambda chain)
    val canonical = TsSchema.canonicalizeStatic(base, Seq(
        "__name__" -> concat(lit("metric_"), pmod(col("series"), lit(20))),
        "job" -> concat(lit("job-"), pmod(col("series"), lit(50))),
        "instance" -> concat(lit("i-"), col("series"))))
      .select(col("labels"), col("fingerprint"), col("t"), col("v"), col("block_start"),
        col("l___name__"), col("l_job"), col("l_instance"))

    time(s"write store ($nSeries series x $nSamples samples = ${nSeries.toLong * nSamples} rows)") {
      canonical.write.partitionBy("block_start").mode("overwrite").parquet(dir)
    }
    val q = TsStore.read(spark, dir)
    val blocks = spark.read.parquet(dir).select(col("block_start")).distinct().count()
    println(s"SCALE partitions=$blocks (2h blocks)")
    time("select 1 series, 2h window") {
      q.selectStreams(t0ms, t0ms + 7200000L, Seq(
        LabelMatcher.eq("__name__", "metric_1"), LabelMatcher.eq("instance", "i-1"))).collect().length
    }
    time("select job regex, 6h window, long form count") {
      q.selectLong(t0ms, t0ms + 6 * 3600000L, Seq(LabelMatcher.re("job", "job-1[0-9]"))).count()
    }
    time("series assembly: 1 metric all series, full range") {
      q.select(t0ms, Long.MaxValue / 2, Seq(LabelMatcher.eq("__name__", "metric_7"))).count()
    }
    time("labelValues(job)") { q.labelValues("job").count() }
    time("promql rate over 1 metric, full range") {
      graft.ops.PromOps.rate(q.selectLong(t0ms, Long.MaxValue / 2,
        Seq(LabelMatcher.eq("__name__", "metric_3")))).count()
    }

    // --- round 2: DSv2 block source at scale ---
    // write a native TSDB block per 2h window for ONE metric's series
    // (driver assembles only this slice), then matcher-pushdown reads
    val blockRoot = java.nio.file.Files.createTempDirectory("graft-scale-blocks")
    time("write native TSDB block (1 metric slice, distributed encode)") {
      val meta = TsdbBlock.writeDistributed(
        q.selectLong(t0ms, t0ms + 7200000L,
          Seq(LabelMatcher.eq("__name__", "metric_5"))),
        blockRoot.resolve("b1"), TsdbBlock.syntheticUlid(99L))
      println(s"SCALE block series=${meta.stats.numSeries}")
    }
    val ds = spark.read.format("graft-tsdb").load(blockRoot.toString)
    time("dsv2: full block scan") { ds.count() }
    time("dsv2: one-instance postings lookup") {
      ds.where(col("instance") === s"i-${5 + 20}").count()
    }
    time("dsv2: prefix + time clamp") {
      ds.where(col("job").startsWith("job-1") &&
        col("t") < t0ms + 3600000L).count()
    }
    time("dsv2: regex matcher (rewritten to postings In-list)") {
      ds.where(col("instance").rlike("^i-1[0-9]$")).count()
    }
    time("dsv2: != matcher (complement-of-values postings)") {
      ds.where(col("job") =!= "job-1").count()
    }

    // --- round 2: connected components on a synthetic pair graph ---
    // 100k-node graph of 10-node chains (worst-ish diameter per cluster)
    val ccPairs = spark.range(100000)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
      .where(pmod(col("id1"), lit(10)) =!= 9)
    time("connected components: 100k nodes, 90k edges") {
      val cc = graft.ops.Dedup.connectedComponents(ccPairs)
      println(s"SCALE cc clusters=" +
        cc.select(col("component")).distinct().count())
    }

    // --- round 3: PromQL front-end at scale ---
    // full parser + step evaluator over the store: every sample serves
    // ≤ window/step + 1 steps, so the explode stays bounded however
    // long the range is
    time("promql front-end: sum by (job) (rate(metric_3[5m])) @ 5m step, full range") {
      graft.promql.PromQL.rangeQuery(q,
        "sum by (job) (rate(metric_3[5m]))",
        t0ms, t0ms + nSamples.toLong * 30000L, 300000L).count()
    }

    // --- round 4: downsampling at scale ---
    // materialize the 1h ladder rung for the whole store (one window
    // pass + one agg, both on the series key), then serve a long-range
    // aggregation from it — the rows read drop by ~samples-per-hour×
    val resMs = 3600000L
    time("downsample materialize 1h, full store") {
      graft.tsdb.TsDownsample.materialize(spark, dir, resMs, lagMs = 0L)
    }
    val down = graft.tsdb.TsDownsample.readMaterialized(spark, dir, resMs)
    println(s"SCALE downsampled rows=${down.count()} " +
      s"(raw ${nSeries.toLong * nSamples})")
    val m0 = t0ms - t0ms % 86400000L
    time("sum/min/max_over_time 1d windows @1d step, ALL series, from 1h downsample") {
      graft.tsdb.TsDownsample.overTime(down, resMs,
        m0, m0 + 3 * 86400000L, 86400000L, 86400000L).count()
    }
    time("same aggregation from raw samples (comparison)") {
      spark.read.parquet(dir)
        .where(col("t") >= m0 && col("t") < m0 + 3 * 86400000L)
        .groupBy(col("fingerprint"), col("labels"),
          (col("t") - pmod(col("t"), lit(86400000L))).as("w"))
        .agg(count(lit(1)), sum(col("v")), min(col("v")), max(col("v"))).count()
    }

    // --- round 5: downsample-ROUTED PromQL at scale ---
    // the evaluator picks the 1h rung for an aligned day-window
    // sum_over_time — same parsed query, resolution²-fewer rows read
    val gridLo = m0 + 86400000L
    val gridHi = m0 + 86400000L // grid must sit inside the materialized span
    time("promql sum_over_time(metric_3[1d]) ROUTED via 1h downsample") {
      graft.promql.PromQL.rangeQuery(q, "sum_over_time(metric_3[1d])",
        gridLo, gridHi, 86400000L,
        downsamples = Seq((resMs, down))).count()
    }
    time("promql sum_over_time(metric_3[1d]) raw path (comparison)") {
      graft.promql.PromQL.rangeQuery(q, "sum_over_time(metric_3[1d])",
        gridLo, gridHi, 86400000L).count()
    }

    // --- round 5: series-bucketed store ---
    // bucketBy(fingerprint) at write time removes the per-series
    // exchange from every downstream series-keyed stage
    spark.sql("DROP TABLE IF EXISTS scale_b_ts")
    time("write bucketed store (64 buckets on fingerprint)") {
      // same canonical rows, routed through TsStore.writeBucketed's
      // bucket-key pre-shuffle (one file per partition × bucket)
      canonical
        .repartition(64, col("fingerprint"))
        .write.partitionBy("block_start")
        .bucketBy(64, "fingerprint").sortBy("fingerprint", "t")
        .mode("overwrite").saveAsTable("scale_b_ts")
    }
    val bq = TsStore.readBucketed(spark, "scale_b_ts")
    time("bucketed: series assembly, 1 metric, full range (no exchange)") {
      bq.select(t0ms, Long.MaxValue / 2, Seq(LabelMatcher.eq("__name__", "metric_7"))).count()
    }
    spark.sql("DROP TABLE IF EXISTS scale_b_ts")

    // --- round 5: corpus-scale pipeline dedup ---
    // 200k synthetic docs (generated distributed, never collected):
    // ~50 tokens each, with a repeated boilerplate line in half of them
    // and exact-duplicate pairs every 100 ids — exercises line dedup,
    // span indexing and SRP-LSH end-to-end at 400× the sf0.01 corpus
    val nDocs = 200000L
    val corpus = spark.range(nDocs).select(col("id").as("doc_id"),
      concat(
        when(pmod(col("id"), lit(2)) === 0,
          lit("shared boilerplate header line\n")).otherwise(lit("")),
        lit("alpha doc "), (col("id") % 100).cast("string"),
        lit(" body token stream "),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit(s"w$j-"), pmod(col("id") + j, lit(997)).cast("string"))): _*),
        lit("\ntrailing line "), (col("id") % 100).cast("string")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count() // materialize outside the timers
    time("line dedup: 200k docs (3 lines each, 100k-way shared line)") {
      println(s"SCALE lineDedup rows=" +
        graft.ops.Dedup.lineDedup(corpus, "doc_id", "text").count())
    }
    time("span index: 200k docs, 5-token windows") {
      println(s"SCALE spanIndex dup spans=" +
        graft.ops.Dedup.spanIndex(corpus, "doc_id", "text", 5).count())
    }
    time("exact dedup digest: 200k docs") {
      graft.ops.Dedup.exact(corpus, "doc_id", Seq("text")).count()
    }
    corpus.unpersist(false)
    // SRP-LSH embedding near-dup on 100k hash-random 64-dim vectors
    // (near-orthogonal in expectation) with 100 PLANTED duplicate pairs
    // (ids k·1000 and k·1000+1 share a vector) — the pair count the scan
    // must recover is known, and the bucket histogram stays uniform
    val dupKey = when(pmod(col("id"), lit(1000)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val vecs = spark.range(100000).select(col("id"),
      transform(sequence(lit(0), lit(63)), d =>
        hash(dupKey, d).cast("double") / lit(Int.MaxValue.toDouble)).as("v"))
    time("SRP-LSH near-dup: 100k × 64-dim vectors (16 planes × 2 tables)") {
      println(s"SCALE srpLsh pairs=" + graft.ops.Dedup.embeddingNearDupLsh(
        vecs, "id", "v", dim = 64, planesPerTable = 16, tables = 2,
        threshold = 0.9).count())
    }
    // --- round 9: SemDeDup cluster-blocked semantic dedup at scale ---
    // 100k base vectors + 1,000 planted exact copies (ids 200000+k copy
    // id 100·k) over 512 cells: hash-random vectors are near-orthogonal
    // (|cos| ≪ 0.9), so at tau=0.9 the dup set is EXACTLY the planted
    // copies — and each copy shares its original's cell, ties on
    // centroid cosine, and loses the id tie-break. Asserts both the
    // removal count and that cluster blocking kept the pairwise search
    // sub-quadratic (cluster size ~200 → ~10^7 candidate cosines, not
    // the 5×10^9 of all-pairs).
    // NB: the copy must hash the SOURCE ordinal — rename it first, or the
    // transform lambda's col("id") resolves against the aliased output
    val sdCopies = spark.range(1000).select(col("id").as("k"))
      .select((col("k") + 200000).as("id"),
        transform(sequence(lit(0), lit(63)), d =>
          hash(col("k") * 100, d).cast("double") / lit(Int.MaxValue.toDouble)).as("v"))
    val sdVecs = spark.range(100000).select(col("id"),
      transform(sequence(lit(0), lit(63)), d =>
        hash(col("id"), d).cast("double") / lit(Int.MaxValue.toDouble)).as("v"))
      .union(sdCopies)
    val sdCents = spark.range(512).select(col("id").as("cell"),
      transform(sequence(lit(0), lit(63)), d =>
        hash(col("id") + 555000, d).cast("double") / lit(Int.MaxValue.toDouble))
        .as("centv"))
    time("SemDeDup: 101k × 64-dim vectors over 512 cells (tau=0.9)") {
      val sd = graft.ops.Dedup.semanticDedup(sdVecs, "id", "v",
        sdCents, "cell", "centv", tau = 0.9)
      val removed = sd.where(!col("keep")).select(col("id")).collect()
        .map(_.getLong(0)).sorted
      require(removed.length == 1000 && removed.forall(_ >= 200000L),
        s"SemDeDup removed ${removed.length} (${removed.take(5).mkString(",")}…), " +
          "expected exactly the 1000 planted copies")
      println(s"SCALE semanticDedup removed=${removed.length} planted copies")
    }

    // --- round 5: bucketed range join + KMV sketch at scale ---
    // 5M points × 500k intervals over 1000 keys: the containment join
    // runs as a (key, bucket) equi-join — a nested loop here would be
    // 2.5 × 10^9 comparisons per key-pair batch
    val rjPoints = spark.range(5000000).select(
      pmod(col("id"), lit(1000)).as("key"), pmod(col("id") * 31, lit(100000)).as("t"),
      col("id").as("pid"))
    val rjIntervals = spark.range(500000).select(
      pmod(col("id"), lit(1000)).as("key"),
      pmod(col("id") * 17, lit(100000)).as("lo"))
      .withColumn("hi", col("lo") + pmod(col("lo"), lit(24)) + 8)
    time("range join: 5M points × 500k intervals, 1000 keys, width-16 buckets") {
      println(s"SCALE rangeJoin pairs=" + graft.ops.RangeJoin
        .pointInInterval(rjPoints, rjIntervals, bucketWidth = 16L).count())
    }
    // KMV over 10M rows / 1M distinct keys in 10 groups: the shuffle
    // carries at most groups × k × partitions rows (partial group limit)
    val kmvRows = spark.range(10000000).select(
      pmod(col("id"), lit(10)).as("g"), pmod(col("id"), lit(1000000)).as("u"))
    time("KMV distinct sketch: 10M rows, 100k distinct/group, 10 groups, k=256") {
      val ests = graft.ops.Sketches.kmvDistinct(kmvRows, col("g"), col("u"), k = 256)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      println(s"SCALE kmv g0 est=${ests(0L)} (true 100000)")
    }
    // HLL over the same rows: registers shuffle O(groups × m × parts)
    // vs KMV's O(groups × k × parts) — both never the distinct stream
    time("HLL register sketch: 10M rows, 100k distinct/group, m=64") {
      val ests = graft.ops.Sketches.hllDistinct(kmvRows, col("g"), col("u"), m = 64)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      println(s"SCALE hll g0 est=${ests(0L)} (true 100000)")
    }

    // --- round 6: 10M-line line dedup + span scoring at scale ---
    // 2M docs × 5 lines = 10M lines; 2 lines shared corpus-wide (the
    // worst skew a boilerplate line produces), 2 unique per doc, 1
    // shared by id%1000 — the digest-keyed shuffle must absorb a key
    // carried by 2M rows without the line text ever being the key
    val bigDocs = spark.range(2000000).select(col("id").as("doc_id"),
      concat(
        lit("shared boilerplate header line\n"),
        lit("doc body "), col("id").cast("string"), lit(" first line\n"),
        lit("middle unique "), (col("id") * 7).cast("string"), lit("\n"),
        lit("shared boilerplate footer line\n"),
        lit("tail group "), pmod(col("id"), lit(1000)).cast("string")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bigDocs.count() // materialize outside the timers
    time("line dedup: 2M docs x 5 lines = 10M lines") {
      println(s"SCALE lineDedup10M rows=" +
        graft.ops.Dedup.lineDedup(bigDocs, "doc_id", "text").count())
    }
    // full Lee-et-al score path (span explode -> dup tail -> semi-join
    // -> per-doc fraction): ~22M 4-token windows
    time("span dup score: 2M docs, 4-token windows") {
      println(s"SCALE spanDupScore kept=" + graft.ops.Dedup
        .spanDupScore(bigDocs, "doc_id", "text", 4).where(col("keep")).count())
    }
    // count-min + bloom over the 10M-row frame: counters/bitmap are
    // bounded (depth x width cells / width/62 words) however large the
    // input — pure map-side + one tiny-keyed combine
    time("count-min: 10M rows, depth 4 x width 4096, 10 probes") {
      val probes = spark.range(10).select(col("id").as("key"))
      println(s"SCALE cm probes=" + graft.ops.Sketches
        .cmFrequency(kmvRows, col("u"), probes, depth = 4, width = 4096).count())
    }
    time("bloom: 10M rows into a 1M-bit filter, 20 probes") {
      val probes = spark.range(20).select(col("id").cast("string").as("key"))
      println(s"SCALE bloom present=" + graft.ops.Sketches
        .bloomMembership(kmvRows.select(col("u").cast("string").as("u")),
          col("u"), probes, widthBits = 1048576, numHashes = 5)
        .where(col("present")).count())
    }

    // surgical span masking over the same corpus: positional window
    // walk (~30M windows), dup-tail join, covered-token filter
    time("span mask: 2M docs, 4-token windows") {
      println(s"SCALE spanMask removedTokens=" + graft.ops.Dedup
        .maskDuplicatedSpans(bigDocs, "doc_id", "text", 4)
        .agg(sum(col("n_removed"))).head().getLong(0))
    }
    bigDocs.unpersist(false)

    // --- round 7: many-block pruning flatness ---
    // The reference's core deployment is "query years of 2h blocks in
    // S3" (db.go:62-122, querier.go:31-43): what matters at that scale
    // is that a selective query's cost tracks the blocks its TIME RANGE
    // selects, not the store's total block count. 240 blocks = 20 days;
    // every path below goes through the Hadoop-FS BlockIO abstraction
    // (the same code that serves s3a:// roots).
    val nBlocks = 240
    val mbRoot = java.nio.file.Files
      .createTempDirectory("graft-scale-manyblocks").toString
    time(s"write $nBlocks native 2h blocks (20 series x 240 samples each)") {
      (0 until nBlocks).foreach { b =>
        val bt0 = t0ms + b.toLong * 7200000L
        val corpus = for (s <- 0 until 20) yield (
          Seq(Label("__name__", "up"), Label("job", "job-" + (s % 5)),
            Label("instance", "i-" + s)),
          (0 until 240).map(i => Sample(bt0 + i * 30000L, (s + i).toDouble)))
        TsdbBlock.write(BlockIO.child(mbRoot, f"b$b%04d"), corpus,
          TsdbBlock.syntheticUlid(1000L + b))
      }
    }
    val mb = spark.read.format("graft-tsdb").load(mbRoot)
    def plannedBlocks(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.tsdb.datasource.TsdbScan]
            .planInputPartitions()
            .map(_.asInstanceOf[graft.tsdb.datasource.TsdbInputPartition].blockDir)
            .distinct.length
      }.getOrElse(0)
    def blockWindow(first: Int, n: Int): org.apache.spark.sql.DataFrame =
      mb.where(col("t").between(t0ms + first.toLong * 7200000L,
          t0ms + (first + n).toLong * 7200000L - 1) &&
        col("instance") === "i-3")
    val w1 = blockWindow(100, 1)
    val w4 = blockWindow(100, 4)
    require(plannedBlocks(w1) == 1, s"1-block window planned ${plannedBlocks(w1)} blocks")
    require(plannedBlocks(w4) == 4, s"4-block window planned ${plannedBlocks(w4)} blocks")
    time("dsv2 240 blocks: 1-series select, 2h window (1 block, cold)") {
      w1.count()
    }
    // min-of-3: the STRUCTURAL pruning property is the plannedBlocks
    // asserts above; the timing ratio below is a sanity bound, and a
    // single warm iteration can double under JIT/GC noise (observed
    // 0.13 s → 0.53 s run-over-run) — the min is the stable statistic
    def best3(f: => Unit): Double = (0 until 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
    val t1 = best3(w1.count())
    val t4 = best3(w4.count())
    println(f"SCALE pruning: 1-block $t1%.2f s, 4-block $t4%.2f s (warm, best of 3)")
    val tAll = time("dsv2 240 blocks: full-store scan (contrast)") { best3(mb.count()) }
    // flatness: a 4-block window must cost a small fraction of the full
    // 240-block scan — driver planning reads per-block METADATA only,
    // so cost tracks selected blocks
    require(t4 < math.max(0.5, 0.35 * tAll),
      f"pruning not flat: 4-block $t4%.2f s vs full $tAll%.2f s")
    time("dsv2 240 blocks: selective matcher across ALL blocks (postings x240)") {
      mb.where(col("instance") === "i-3").count()
    }

    // --- round 7: multi-segment block at real size ---
    // writeDistributed's segment split at the production 512 MiB cap:
    // 7200 series x 10k incompressible samples ≈ 700 MiB of chunk bytes
    // -> the writer must split chunks across >= 2 segment files and both
    // readers must stitch refs across them. Chunk bytes never touch the
    // driver (executor-side encode + segment assembly); the driver holds
    // per-chunk METADATA only.
    val segRoot = java.nio.file.Files
      .createTempDirectory("graft-scale-multiseg").toString
    val segDir = BlockIO.child(segRoot, "big")
    time("writeDistributed: 72M incompressible samples (multi-segment)") {
      val rows = spark.range(7200L * 10000)
        .select((col("id") / 10000).cast("long").as("series"),
          pmod(col("id"), lit(10000)).as("k"))
        .select(col("series"), (lit(t0ms) + col("k") * 1000L).as("t"),
          // int-hash-valued doubles defeat XOR compression -> real bytes
          (hash(col("series"), col("k")).cast("double") / 1000.0).as("v"))
      val cano = TsSchema.canonicalizeStatic(rows, Seq(
          "__name__" -> lit("big_metric"),
          "series" -> col("series").cast("string")),
          promoted = Seq(Labels.MetricName, "series"))
        .select(col("labels"), col("fingerprint"), col("t"), col("v"))
      val meta = TsdbBlock.writeDistributed(cano, segDir,
        TsdbBlock.syntheticUlid(424242L))
      println(s"SCALE multiseg samples=${meta.stats.numSamples} " +
        s"series=${meta.stats.numSeries}")
    }
    val segFiles = BlockIO.listNames(BlockIO.child(segDir, "chunks"))
    val segBytes = segFiles.map(f =>
      BlockIO.fileSize(BlockIO.child(BlockIO.child(segDir, "chunks"), f))).sum
    println(s"SCALE multiseg segments=${segFiles.size} " +
      f"chunkBytes=${segBytes / 1048576.0}%.0f MiB")
    require(segFiles.size >= 2,
      s"expected >=2 segment files over 512 MiB, got ${segFiles.size}")
    val segDs = spark.read.format("graft-tsdb").load(segDir)
    time("multiseg: 1-series select (coalesced ranges across segments)") {
      ChunkFile.bytesFetched.set(0)
      val n = segDs.where(col("series") === "4242").count()
      println(s"SCALE multiseg rows=$n " +
        f"bytesFetched=${ChunkFile.bytesFetched.get() / 1024.0}%.0f KiB " +
        f"of ${segBytes / 1048576.0}%.0f MiB")
      require(ChunkFile.bytesFetched.get() < segBytes / 100,
        "selective read must fetch a small fraction of the segments")
    }

    // --- round 7: exact heavy hitters over 10M rows ---
    // 1M distinct keys (far beyond what a whole groupBy should carry at
    // 100 TB) but only ~100 heavy ones: the MG candidate pass bounds
    // memory at m per partition and the recount is a semi-joined
    // aggregation — assert the result equals the direct top-10
    val hhRows = spark.range(10000000).select(
      lit("g").as("g"),
      // ~90% of rows concentrate on 100 heavy keys, rest on 1M tail
      when(pmod(col("id"), lit(10)) < 9,
        concat(lit("hot"), pmod(col("id"), lit(100))))
        .otherwise(concat(lit("cold"), pmod(col("id"), lit(1000000))))
        .as("u"))
    time("heavy hitters: 10M rows, 1M distinct, m=4096, k=10") {
      val got = graft.ops.Sketches.heavyHitters(hhRows, col("g"), col("u"),
        k = 10, m = 4096).orderBy(col("rnk"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      val direct = hhRows.groupBy(col("u")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("u")).limit(10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      require(got == direct, s"heavy hitters diverged: $got vs $direct")
      println(s"SCALE heavyHitters top1=${got.head}")
    }

    // --- round 7: ANN probe pruning at 1024 cells ---
    // the static-partition-filter claim at production cell counts:
    // 200k vectors over 1024 cells, nprobe=8 -> the scan plans 8 cell
    // dirs out of 1024, and driver-side probe resolution stays bounded
    // (8 query vectors x 1024 centroid rows).
    val annDim = 16
    def synthVec(seed: org.apache.spark.sql.Column) = transform(
      sequence(lit(0), lit(annDim - 1)),
      d => hash(seed, d).cast("double") / lit(Int.MaxValue.toDouble))
    val annCents = spark.range(1024)
      .select(col("id").as("cell"), synthVec(col("id") + 900000).as("centv"))
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft-scale-ann").resolve("corpus").toString
    time("ivf: assign 200k vectors to 1024 cells + write partitionBy(cell)") {
      // repartition on the partition column first: each cell dir is
      // written by ONE task (1024 files total), not by every task that
      // happens to hold rows of that cell (up to tasks×cells files —
      // the small-files antipattern object stores punish)
      graft.ops.Similarity.ivfAssign(
          spark.range(200000).select(col("id"), synthVec(col("id")).as("v")),
          "id", "v", annCents, "cell", "centv")
        .repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(annRoot)
    }
    val annStored = spark.read.parquet(annRoot)
    val annQueries = spark.range(8)
      .select(col("id").as("qid"), synthVec(col("id") + 777).as("qv"))
    val probed = graft.ops.Similarity.probedCellSet(
      annQueries, "qid", "qv", annCents, "cell", "centv", nprobe = 8)
    println(s"SCALE ann probedCells=${probed.size} of 1024")
    require(probed.size <= 8 * 8, s"probe set not bounded: ${probed.size}")
    val annPruned = annStored.where(col("cell").isin(probed: _*))
    val annScan = annPruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val annPlanned = annScan.relation.location.listFiles(
      annScan.partitionFilters, annScan.dataFilters)
      .map(_.values.toString).distinct.length
    require(annPlanned == probed.size,
      s"planned $annPlanned cell dirs, probed ${probed.size}")
    println(s"SCALE ann plannedCellDirs=$annPlanned (of 1024)")
    time("ivf stored: top-10 for 8 queries, nprobe=8 over 1024 cells") {
      graft.ops.Similarity.ivfTopKStored(annQueries, annStored,
        "qid", "qv", annCents, "cell", "centv", k = 10, nprobe = 8).count()
    }
    val tProbe0 = System.nanoTime()
    graft.ops.Similarity.ivfTopKStored(annQueries, annStored,
      "qid", "qv", annCents, "cell", "centv", k = 10, nprobe = 8).count()
    println(f"SCALE ann warmQuery=${(System.nanoTime() - tProbe0) / 1e9}%.2f s" +
      f" (${(System.nanoTime() - tProbe0) / 1e9 / 8}%.3f s/query, 8 probes each)")

    dsirAtScale(spark)

    nativeHistAtScale(spark)

    qsketchAtScale(spark)

    webIngestAtScale(spark)

    mediaDedupAtScale(spark)

    mixedMediaAtScale(spark)

    webdatasetAtScale(spark)

    curateAtScale(spark)

    graft.ops.Dedup.clearSharedPersists()
    spark.stop()
  }

  /** Round-9 DSIR rehearsal at 1M raw docs: a 2,000-doc planted subset
    * shares the 10k-doc target corpus's vocabulary; the importance
    * weights must separate it completely, so hard top-k selection
    * returns EXACTLY the planted set. The gram explode never shuffles
    * (map-side into the broadcast ratio join), both model fits collapse
    * to ≤ buckets rows before their exchanges, and selection is a
    * k-bounded TakeOrdered — the shapes that keep DSIR one cheap pass
    * over a 100 TB pool. Standalone: SPARK_GRAFT_SCALE_SECTION=dsir. */
  /** Exposition round-trip at 20M samples: 100k series × 200 samples
    * render to wire lines and parse back; count, value mass, and the
    * per-row fingerprint xor must all survive EXACTLY (xor is
    * order-free and overflow-free, so the equality is content
    * equality under the unique (series, t) construction). Both
    * directions are map-side — the printed walls ARE the per-core
    * scrape-archive throughput. Standalone:
    * SPARK_GRAFT_SCALE_SECTION=expo. */
  private def expoAtScale(spark: SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    import graft.tsdb.{Exposition, TsSchema}
    val n = 20000000L
    val canon = TsSchema.canonicalizeStatic(
      spark.range(n).select(
        concat(lit("metric_"), pmod(col("id"), lit(1000))).as("name"),
        concat(lit("job-"), pmod(col("id"), lit(100))).as("job"),
        concat(lit("i-"), col("id") % 100000L).as("instance"),
        (lit(1700000000000L) + (col("id") / 100000L).cast("long") * 15000L).as("t"),
        (col("id") % 997L).cast("double").as("v")),
      pairs = Seq("__name__" -> col("name"), "job" -> col("job"),
        "instance" -> col("instance")))
      .drop("name")
    def digest(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(count(lit(1)), sum(col("v")),
        expr("bit_xor(xxhash64(fingerprint, t, v))")).head()
      (r.getLong(0), r.getDouble(1), r.getLong(2))
    }
    val before = time(s"exposition digest of $n canonical samples")(digest(canon))
    val lines = Exposition.render(canon)
    val back = TsSchema.canonicalize(
      Exposition.parse(lines, col("line"), lit(-1L)))
    val after = time(s"exposition render -> parse -> canonicalize $n samples")(
      digest(back))
    require(before == after,
      s"round-trip digest drifted: $before != $after")
  }

  /** Native histograms at 50M observations: the observe() aggregation
    * must shuffle only (group × occupied-bucket) count rows — never
    * observations — and the result must be EXACT: total count
    * conservation, exact sum (integer-valued doubles), and the
    * sum-monoid law (observe(half1) ⊎ observe(half2) == observe(all),
    * the property that makes the streaming form bit-identical to
    * batch). Then the classic view + PromQL histogram_quantile runs
    * end-to-end over the same frame — the full native-hist query path
    * at a group count (7200 series-days) the sf fixtures never reach.
    * Standalone: SPARK_GRAFT_SCALE_SECTION=nhist. */
  private def nativeHistAtScale(spark: SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    import graft.ops.NativeHistogram
    val n = 50000000L
    val t0ms = 1704844800000L
    // 240 event types × 30 days = 7200 histogram groups; values span
    // ~6 decades so schema-2 occupancy is realistic (~80 buckets);
    // integer-valued doubles keep the sums order-independent-exact
    def obs(lo: Long, hi: Long) = spark.range(lo, hi).select(
      concat(lit("et_"), pmod(col("id"), lit(240))).as("event_type"),
      // day from id/240 so the two keys are independent (30 | 240
      // would otherwise collapse the cross product to 240 groups)
      (lit(t0ms) + pmod(expr("id div 240"), lit(30)) * 86400000L).as("day_t"),
      (pmod(col("id") * 2654435761L, lit(1000000L)) + 1L)
        .cast("double").as("value"))
    val groups = Seq("event_type", "day_t")

    shuffleBytes.set(0L)
    val full = time(s"native-hist observe: $n obs -> 7200 groups") {
      val f = NativeHistogram.observe(obs(0, n), col("value"), 2, groups)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val obsShuffle = shuffleBytes.get()
    println(f"SCALE native-hist observe shuffle ${obsShuffle / 1024.0 / 1024.0}%.1f MiB")
    // partial-aggregate shuffle: bounded by partitions x occupied
    // (group, bucket) cells (~32 x 267k rows, measured ~114 MiB), NOT
    // by the 50M observations (~1.5 GiB at this row width) — the term
    // that stays flat when observations grow 100x
    require(obsShuffle < 256L * 1024 * 1024,
      f"observe shuffled ${obsShuffle / 1024.0 / 1024.0}%.1f MiB — observation-sized, not bucket-sized")

    // exactness: count conservation + exact integer-valued sum
    val tot = full.agg(sum(col("count")), sum(col("sum")),
      sum(size(col("buckets"))), count(lit(1))).head()
    require(tot.getLong(0) == n, s"count drifted: ${tot.getLong(0)} != $n")
    val expectSum = spark.range(0, n)
      .select((pmod(col("id") * 2654435761L, lit(1000000L)) + 1L).as("v"))
      .agg(sum(col("v"))).head().getLong(0)
    require(tot.getDouble(1) == expectSum.toDouble,
      s"sum drifted: ${tot.getDouble(1)} != $expectSum")
    require(tot.getLong(3) == 7200L, s"groups: ${tot.getLong(3)} != 7200")
    println(s"SCALE native-hist occupied buckets total ${tot.getLong(2)} " +
      s"(${tot.getLong(2) / 7200} per group)")

    // monoid law at scale: halves merged == whole (bit-identical)
    val merged = time("native-hist merge(half1, half2) == whole") {
      val m = NativeHistogram.merge(
        NativeHistogram.observe(obs(0, n / 2), col("value"), 2, groups)
          .unionByName(
            NativeHistogram.observe(obs(n / 2, n), col("value"), 2, groups)),
        groups)
      m.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    val diff = merged.as("m").join(full.as("f"), groups)
      .where(col("m.count") =!= col("f.count") or
        (col("m.sum") =!= col("f.sum")) or
        (col("m.zero_count") =!= col("f.zero_count")) or
        (expr("m.buckets") =!= expr("f.buckets")))
      .count()
    require(diff == 0, s"$diff groups differ between merged halves and whole")
    merged.unpersist(false)

    // the full query path: classic view -> TsQuerier -> PromQL
    val classic = time("classic view of 7200 native groups") {
      val c = TsSchema.canonicalize(NativeHistogram.toClassicSeries(
        full, "latency", Seq("event_type"), "day_t", countSumSeries = true))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val q = new TsQuerier(classic)
    val steps = time("promql histogram_quantile(0.9, latency) @1d over 30d") {
      graft.promql.PromQL.rangeQuery(q,
        "histogram_quantile(0.9, latency)",
        t0ms, t0ms + 29L * 86400000L, 86400000L).count()
    }
    require(steps == 7200L, s"quantile steps: $steps != 7200")
    val cnt = time("promql histogram_count(latency) (le=+Inf pushdown)") {
      graft.promql.PromQL.rangeQuery(q,
        "histogram_count(latency)",
        t0ms, t0ms + 29L * 86400000L, 86400000L)
        .agg(sum(col("v"))).head().getDouble(0)
    }
    require(cnt == n.toDouble, s"histogram_count total: $cnt != $n")
    classic.unpersist(false); full.unpersist(false)
  }

  /** Corpus shuffle + shard planning at 20M rows: the two-pass prefix
    * sum must produce a valid permutation (dense ordinals, conserved
    * token mass) with only the one range exchange plus per-partition
    * streams — the shapes that make a deterministic global training
    * order writable at 100 TB without a single-partition sort.
    * Standalone: SPARK_GRAFT_SCALE_SECTION=shuffle. */
  private def shuffleAtScale(spark: SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val n = 20000000L
    // synthetic token counts 1..512, arithmetic total known in closed form
    val docs = spark.range(n).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(512L)) + 1L).as("n_tokens"))
    val totalTokens = docs.agg(sum(col("n_tokens"))).head.getLong(0)
    val shards = time(s"tokenShards over ${n / 1000000}M docs (budget 1M tokens)") {
      val out = graft.ops.CorpusShuffle.tokenShards(
        docs, "id", col("n_tokens"), seed = "scale", budget = 1000000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    }
    val agg = time("permutation + conservation invariants") {
      shards.agg(
        count(lit(1)).as("rows"),
        countDistinct(col("ord")).as("dord"),
        max(col("ord")).as("mord"),
        sum(col("n_tokens")).as("toks"),
        countDistinct(col("shard_id")).as("nshards"),
        max(col("shard_id")).as("mshard")).head()
    }
    require(agg.getLong(0) == n && agg.getLong(1) == n &&
      agg.getLong(2) == n - 1,
      s"ordinals must be a dense permutation: $agg")
    require(agg.getLong(3) == totalTokens, "token mass conserved")
    // start-offset cut rule ⇒ shard ids are exactly 0..floor((T-1)/B)
    val expectShards = (totalTokens - 1) / 1000000L + 1
    require(agg.getLong(4) == expectShards &&
      agg.getLong(5) == expectShards - 1,
      s"dense shard ids 0..${expectShards - 1}, got $agg")
    println(s"SCALE shuffle ${n} docs -> ${agg.getLong(4)} shards, " +
      s"$totalTokens tokens, invariants hold")
    shards.unpersist(false)
  }

  /** Range-join strategy rehearsal (round-13 verdict item #4): the
    * bucketed point-in-interval join's SMJ pin vs shuffled-hash, on a
    * synthetic corpus with a PLANTED hot key (one key owns ~10% of both
    * sides — the skew profile that makes SHJ's in-memory build risky at
    * 100 TB). Results must agree exactly across strategies; wall + CPU
    * printed per variant. Standalone:
    * SPARK_GRAFT_SCALE_SECTION=rangejoin. */
  private def rangeJoinAtScale(spark: SparkSession): Unit = {
    def cpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = cpuS(); val r = f
      println(f"SCALE $name wall=${(System.nanoTime() - t0) / 1e9}%8.2f s cpu=${cpuS() - c0}%8.2f s")
      r
    }
    val n = 20000000L
    val width = 16L
    // ~10% of rows on key 0 (the hot tenant); the rest spread over 100k
    // keys; times uniform over ~90 "days", interval lengths 1..30
    def side(df: org.apache.spark.sql.DataFrame) = df.select(
      when(pmod(col("id"), lit(10L)) === 0L, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(100000L))).as("key"),
      pmod(col("id") * 40503L, lit(1440L)).as("d"))
    val points = side(spark.range(n).toDF())
      .select(col("key"), col("d").as("t"), col("d").as("payload"))
    val intervals = side(spark.range(n).toDF())
      .select(col("key"), col("d").as("lo"),
        (col("d") + pmod(col("d") * 7L, lit(30L)) + 1L).as("hi"))
    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("payload"))).head()
      (r.getLong(0), r.getLong(1))
    }
    def bucketed(hintOn: String) = {
      val p = points.withColumn("__b",
        expr(s"(`t` - pmod(`t`, ${width}L)) div ${width}L"))
      val i = intervals.withColumn("__b",
        explode(sequence(expr(s"(`lo` - pmod(`lo`, ${width}L)) div ${width}L"),
          expr(s"(`hi` - pmod(`hi`, ${width}L)) div ${width}L"))))
      val joined = hintOn match {
        case "merge"    => p.join(i.hint("merge"), Seq("key", "__b"))
        case "shj_i"    => p.join(i.hint("shuffle_hash"), Seq("key", "__b"))
        case "shj_p"    => p.hint("shuffle_hash").join(i, Seq("key", "__b"))
        case _          => p.join(i, Seq("key", "__b"))
      }
      joined.where(col("t") >= col("lo") && col("t") <= col("hi")).drop("__b")
    }
    // warm codegen/scan once, then run each strategy twice (2nd = steady)
    val variants = Seq("merge", "shj_i", "shj_p")
    var expect: Option[(Long, Long)] = None
    for (v <- variants; rep <- 1 to 2) {
      val got = time(s"rangejoin $v rep$rep over ${n / 1000000}M x ${n / 1000000}M (hot key 10%)") {
        agg(bucketed(v))
      }
      expect match {
        case None => expect = Some(got)
        case Some(e) => require(e == got, s"strategy $v changed results: $e vs $got")
      }
    }
    println(s"SCALE rangejoin agree: ${expect.get}")
  }

  /** Governance-family rehearsal: funnel + retention over 12M events
    * with PLANTED structure (expected counts computed independently,
    * asserted exactly), the validation suite + profiler over the same
    * frame (12M-row exact tuple distinct, 24M-row melt), and the NB
    * classifier scoring 1M docs against disjoint planted vocabularies
    * (AUC must be exactly 1.0, zero confusion errors). Standalone:
    * SPARK_GRAFT_SCALE_SECTION=govern. */
  private def governAtScale(spark: SparkSession): Unit = {
    import graft.ops.{Behavior, Checks, Classifier, Eval, Profile}
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val nUsers = 3000000L
    // per user: view@u*1000, click@+10; every 10th user purchases @+20
    // (completes); every 5th-but-not-10th user purchases @-5 — BEFORE
    // its view, so it must NOT count toward the funnel
    val ev = spark.range(nUsers).select(col("id").as("u"),
        explode(array(
          struct(lit("view").as("et"), (col("id") * 1000L).as("t")),
          struct(lit("click").as("et"), (col("id") * 1000L + 10L).as("t")),
          struct(when(pmod(col("id"), lit(10)) === 0, "purchase")
            .otherwise("noise").as("et"), (col("id") * 1000L + 20L).as("t")),
          struct(when(pmod(col("id"), lit(5)) === 0 && pmod(col("id"), lit(10)) =!= 0,
              "purchase").otherwise("noise2").as("et"),
            (col("id") * 1000L - 5L).as("t")))).as("e"))
      .select(col("u"), col("e.et").as("et"), col("e.t").as("t"))

    time(s"funnel over ${nUsers * 4} events (planted completion classes)") {
      val rows = Behavior.funnel(ev, col("u"), col("et"), col("t"),
        Seq("view", "click", "purchase"), windowMs = 50L)
        .orderBy("step").collect()
      val got = rows.map(r => (r.getInt(0), r.getLong(2))).toSeq
      require(got == Seq((1, nUsers), (2, nUsers), (3, nUsers / 10)),
        s"funnel counts $got != planted (pre-view purchases must not count)")
    }

    // retention: signup at day u%10, purchase at day u%10 + u%3 —
    // gcd(10,3)=1 so every (cohort, offset) cell is exactly N/30 users
    val rev = spark.range(nUsers).select(col("id").as("u"),
        explode(array(
          struct(lit("signup").as("et"), pmod(col("id"), lit(10)).as("t")),
          struct(lit("purchase").as("et"),
            (pmod(col("id"), lit(10)) + pmod(col("id"), lit(3))).as("t")))).as("e"))
      .select(col("u"), col("e.et").as("et"), col("e.t").as("t"))
    time(s"retention triangle over ${nUsers * 2} events (30 exact cells)") {
      val cells = Behavior.retention(rev, col("u"), col("et"), col("t"),
        "signup", "purchase", periodMs = 1L, epochMs = 0L, maxOffset = 2)
        .collect()
      require(cells.length == 30, s"expected 30 cells, got ${cells.length}")
      cells.foreach { r =>
        require(r.getAs[Long]("n_cohort") == nUsers / 10 &&
          r.getAs[Long]("n_active") == nUsers / 30 &&
          r.getAs[Double]("retention") == 0.333333,
          s"cell ${r.toSeq} != planted N/30")
      }
    }

    time(s"validation suite over ${nUsers * 4} rows (incl. exact tuple distinct)") {
      val rep = Checks.run(ev,
        rowChecks = Seq(Checks.completeness("et"),
          Checks.inSet("et", Seq("view", "click", "purchase", "noise", "noise2"))),
        uniques = Seq(Checks.UniqueCheck(Seq("u", "t")))).collect()
      require(rep.length == 3 && rep.forall(_.getAs[Boolean]("pass")),
        s"all planted constraints must pass: ${rep.mkString("; ")}")
    }

    time(s"profile over ${nUsers * 4} rows x 2 columns (melted cardinality)") {
      val p = Profile.profile(ev, Seq("et", "u")).orderBy("column").collect()
      val et = p(0); val u = p(1)
      require(et.getAs[Long]("n_distinct") == 5 &&
        et.getAs[String]("top_v") == "view" &&
        et.getAs[Long]("top_n") == nUsers,
        s"et profile ${et.toSeq} != planted (view/click tie -> larger string)")
      require(u.getAs[Long]("n_distinct") == nUsers, s"u profile ${u.toSeq}")
    }

    // classifier: disjoint planted vocabularies → perfect separation
    val words = 30
    def synthDoc(seed: org.apache.spark.sql.Column, vocab: String, vocabSize: Int) =
      concat_ws(" ", transform(sequence(lit(1), lit(words)),
        i => concat(lit(vocab), pmod(hash(seed, i), lit(vocabSize)))))
    val pos = spark.range(10000).select(col("id"), synthDoc(col("id"), "p", 300).as("text"))
    val neg = spark.range(10000).select((col("id") + 10000000L).as("id"),
      synthDoc(col("id") + 10000000L, "q", 300).as("text"))
    val corpus = spark.range(1000000).select(col("id"),
      (pmod(col("id"), lit(2)) === 0).as("label"),
      when(pmod(col("id"), lit(2)) === 0, synthDoc(col("id"), "p", 300))
        .otherwise(synthDoc(col("id"), "q", 300)).as("text"))
    time("NB classifier: train on 20k seeds, score 1M docs, exact AUC") {
      val scored = Classifier.trainScore(pos, neg, corpus, "id", "text")
        .join(corpus.select(col("id"), col("label")), Seq("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val auc = Eval.rocAuc(scored, col("label"), col("logodds"))
          .head().getAs[Double]("auc")
        require(auc == 1.0, s"disjoint vocabularies must separate perfectly, auc=$auc")
        val c = Eval.confusion(scored, col("label"), col("logodds"), 0.0).head()
        require(c.getAs[Long]("fp") == 0 && c.getAs[Long]("fn") == 0,
          s"confusion ${c.toSeq}")
      } finally { scored.unpersist(false); () }
    }

    // sessionization: 1M users × 50 events, every 10th step jumps 2h
    // past the 1h gap → EXACTLY 5 sessions/user of 10 events spanning
    // 9 ten-minute steps each — count, composition, and duration all
    // closed-form
    val sev = spark.range(1000000L * 50)
      .select((col("id") / 50).cast("long").as("u"),
        pmod(col("id"), lit(50)).as("k"))
      .select(col("u"), lit("e").as("et"),
        (col("k") * 600000L + (col("k") / 10).cast("long") * 7200000L).as("t"))
    time("sessionize 50M events / 1M users (planted 5M sessions)") {
      val st = Behavior.sessionStats(sev, col("u"), col("et"), col("t"),
        gapMs = 3600000L)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("n_events")).as("d_ev"),
          countDistinct(col("duration_ms")).as("d_dur"),
          max(col("n_events")).as("ev"), max(col("duration_ms")).as("dur"))
        .head()
      require(st.getLong(0) == 5000000L && st.getLong(1) == 1 &&
        st.getLong(2) == 1 && st.getLong(3) == 10L &&
        st.getLong(4) == 9L * 600000L,
        s"session stats ${st.toSeq} != planted (5M sessions of 10 events)")
    }

    // SCD2 over the same 50M-event frame with a planted alternating
    // state (flips every 10th step) → EXACTLY 5 versions/user; closed
    // versions all span the same closed-form 13.2M ms
    val scdEv = spark.range(1000000L * 50)
      .select((col("id") / 50).cast("long").as("u"),
        pmod(col("id"), lit(50)).as("k"))
      .select(col("u"),
        pmod((col("k") / 10).cast("long"), lit(2)).cast("string").as("state"),
        (col("k") * 600000L + (col("k") / 10).cast("long") * 7200000L).as("t"))
    time("scd2 history over 50M updates / 1M users (planted 5M versions)") {
      val eot = 4102444800000L
      val st = graft.ops.Scd.scd2(scdEv, Seq("u"), Seq("state"), "t", eot)
        .agg(count(lit(1)).as("n"),
          sum(when(col("valid_to") === eot, 1L).otherwise(0L)).as("open"),
          countDistinct(when(col("valid_to") =!= eot,
            col("valid_to") - col("valid_from"))).as("d_span"),
          max(when(col("valid_to") =!= eot,
            col("valid_to") - col("valid_from"))).as("span"))
        .head()
      require(st.getLong(0) == 5000000L && st.getLong(1) == 1000000L &&
        st.getLong(2) == 1 && st.getLong(3) == 13200000L,
        s"scd2 stats ${st.toSeq} != planted (5M versions, uniform closed span)")
    }

    // BM25: 2M synth docs + 5 planted needle docs; the needle query
    // must return exactly the planted set, and a common-term query
    // times the broadcast-semi-join retrieval path over 60M tokens
    val bmCorpus = spark.range(2000000).select(col("id"),
        synthDoc(col("id"), "p", 300).as("text"))
      .union(spark.range(5).select((col("id") + 9000000L).as("id"),
        concat(lit("needle needle "), synthDoc(col("id"), "p", 300)).as("text")))
    time("bm25 over 2M docs (planted needle set + common-term throughput)") {
      val hits = graft.ops.TextAnalysis.bm25TopK(bmCorpus, "id", "text",
        queries = Seq("qn" -> "needle", "qc" -> "p1 p2 p3"), k = 5)
        .collect()
      val needleIds = hits.filter(_.getString(0) == "qn").map(_.getLong(2)).toSet
      require(needleIds == (0L until 5L).map(_ + 9000000L).toSet,
        s"needle query returned $needleIds, not the planted set")
      require(hits.count(_.getString(0) == "qc") == 5,
        "common-term query must fill its top-5")
    }
  }

  private def dsirAtScale(spark: SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val words = 30
    def synthDoc(seed: org.apache.spark.sql.Column, vocab: String, vocabSize: Int) =
      concat_ws(" ", transform(sequence(lit(1), lit(words)),
        i => concat(lit(vocab), pmod(hash(seed, i), lit(vocabSize)))))
    // planted: every 500th raw doc speaks the target's 200-word
    // vocabulary; the rest draw from a disjoint 100k-word vocabulary
    val raw = spark.range(1000000).select(col("id"),
      when(pmod(col("id"), lit(500)) === 0, synthDoc(col("id"), "t", 200))
        .otherwise(synthDoc(col("id"), "w", 100000)).as("text"))
    val target = spark.range(10000).select((col("id") + 5000000L).as("id"),
      synthDoc(col("id") + 5000000L, "t", 200).as("text"))
    time("dsir: score 1M docs vs 10k-doc target, select top-2000") {
      val got = graft.ops.Dsir.resample(raw, target, "id", "text",
        k = 2000, buckets = 4096, alpha = 1.0, temperature = 0.0)
        .select("id").collect().map(_.getLong(0)).toSet
      require(got.size == 2000 && got.forall(_ % 500 == 0),
        s"selected set is not the planted set (n=${got.size}, " +
          s"offenders=${got.filter(_ % 500 != 0).take(5)})")
      println(s"SCALE dsir selected=${got.size}/2000 planted, 0 impostors")
    }
  }

  /** The round-8 END-TO-END curation rehearsal at 2M docs — the
    * pipeline_curate shape as ONE run: quality floor × near-dup gate
    * (vs the amortized signature index, keep-first) × span ceiling ×
    * decontamination — with wall time AND shuffle volume recorded
    * (PLANS.md cites these numbers). Stage outcomes are asserted
    * against independently-computed planted counts, so the run proves
    * each stage did its job at scale, not just that it finished.
    * Dedup gates run BEFORE span scoring (same order as curateStream:
    * a duplicate must never re-enter scoring). Standalone entry:
    * SPARK_GRAFT_SCALE_SECTION=curate runMain graft.ScaleCheck. */
  private def curateAtScale(spark: SparkSession): Unit = {
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val nCur = 2000000L
    val nPrior = 100000L
    // planted classes, in generator priority order:
    //  punct  (id%211=0): pure punctuation → quality floor
    //  boiler (id%97=0):  30-token corpus-wide boilerplate → span ceiling
    //  copy   (id%50=0):  exact text of a PRIOR-corpus doc → near-dup gate
    //  contam (id%9973=0, class unique): text planted in the benchmark
    // The gate is CROSS-corpus (new batch vs the amortized prior-corpus
    // signature index) — the production shape, and deliberately not
    // within-batch: within one batch, near-dup candidates ARE span-dup
    // candidates, so banding 20k boilerplate docs against each other
    // would form ~200M degenerate-bucket pairs that the span ceiling is
    // the right tool for. Ordering mirrors curateStream: gates before
    // scoring, so a duplicate never re-enters scoring.
    //
    // "Unique" tokens must be unique with FULL entropy — each token
    // carries `seed * odd + j` undiminished. A modular token space
    // (an earlier draft used mod 50021) silently breaks the planted
    // classes at this scale: 2M docs ⇒ ~40 docs share every token
    // sequence mod 50021, every 5-token window repeats corpus-wide,
    // and the span ceiling (correctly) drops the whole corpus.
    val uniqueText = (seed: org.apache.spark.sql.Column) => concat(
      lit("doc "), seed.cast("string"), lit(" "),
      concat_ws(" ", (0 until 36).map(j =>
        concat(lit(s"tok$j-"), (seed * (2 * j + 1) + j).cast("string"))): _*))
    val priorText = (seed: org.apache.spark.sql.Column) => concat(
      lit("prior "), seed.cast("string"), lit(" "),
      concat_ws(" ", (0 until 36).map(j =>
        concat(lit(s"ptok$j-"), pmod(seed * (2 * j + 3) + j, lit(50021)).cast("string"))): _*))
    val curDocs = spark.range(nCur).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(211)) === 0, lit("!!! ??? !!! ??? !!!"))
        .when(pmod(col("id"), lit(97)) === 0, concat(
          lit((0 until 30).map(j => s"boiler$j").mkString(" ")),
          lit(" doc "), col("id").cast("string")))
        .when(pmod(col("id"), lit(50)) === 0, priorText(pmod(col("id"), lit(nPrior))))
        .otherwise(uniqueText(col("id"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    curDocs.count() // materialize outside the timers
    val isPunct = (c: org.apache.spark.sql.Column) => pmod(c, lit(211)) === 0
    val isBoiler = (c: org.apache.spark.sql.Column) =>
      !isPunct(c) && pmod(c, lit(97)) === 0
    val isCopy = (c: org.apache.spark.sql.Column) =>
      !isPunct(c) && !isBoiler(c) && pmod(c, lit(50)) === 0
    // expected stage outcomes, computed from the class rules alone
    val ids = spark.range(nCur)
    val nPunct = ids.where(isPunct(col("id"))).count()
    val nCopyDropped = ids.where(isCopy(col("id"))).count()
    val nBoiler = ids.where(isBoiler(col("id"))).count()
    val nContam = ids.where(pmod(col("id"), lit(9973)) === 0 && col("id") > 0 &&
      !isPunct(col("id")) && !isBoiler(col("id")) && !isCopy(col("id"))).count()
    val bench = spark.range(1, nCur / 9973 + 1)
      .select((col("id") * 9973).as("doc_id"), uniqueText(col("id") * 9973).as("text"))
    // the amortized artifact: the PRIOR corpus's minhash-signature index
    // (at 100 TB a parquet table refreshed with the corpus, never
    // per-run work)
    val curIndex = time(s"curation index: minhash signatures, $nPrior prior docs") {
      val ix = graft.ops.Dedup.minhashSignatures(
        spark.range(nPrior).select(col("id").as("doc_id"),
          priorText(col("id")).as("text")),
        "doc_id", "text", numHashes = 16, shingleSize = 3, bands = 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ix.count(); ix
    }
    val shuffle0 = shuffleBytes.get()
    time("curate 2M docs end-to-end (quality × near-dup × span × decontam)") {
      // 1. quality floor — doc-local, codegen'd
      val afterQuality = curDocs
        .where(graft.ops.TextAnalysis.qualityScore(col("text")) >= 0.2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQ = afterQuality.count()
      // 2. near-dup gate: batch docs near-duplicating the prior corpus
      val gateDrops = graft.ops.Dedup.minhashLshAgainst(afterQuality,
          "doc_id", "text", curIndex, numHashes = 16, bands = 4,
          shingleSize = 3, threshold = 0.9)
        .select(col("new_id").as("doc_id")).distinct()
      val afterGate = afterQuality.join(gateDrops, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nG = afterGate.count()
      // 3. span ceiling over the gate survivors
      val spanKeep = graft.ops.Dedup.spanDupScore(afterGate, "doc_id", "text",
          spanTokens = 5, maxDupFrac = 0.5)
        .where(col("keep")).select(col("doc_id"))
      val afterSpan = afterGate.join(spanKeep, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nS = afterSpan.count()
      // 4. decontamination vs the planted benchmark
      val cleaned = graft.ops.Decontaminate.clean(afterSpan, bench,
        "doc_id", "text", shingleSize = 3, threshold = 0.8)
      val nFinal = cleaned.count()
      println(s"SCALE curate stages: 2M -> quality $nQ -> gate $nG " +
        s"-> span $nS -> decontam $nFinal")
      require(nCur - nQ == nPunct, s"quality dropped ${nCur - nQ}, expected $nPunct")
      require(nQ - nG == nCopyDropped, s"gate dropped ${nQ - nG}, expected $nCopyDropped")
      require(nG - nS == nBoiler, s"span dropped ${nG - nS}, expected $nBoiler")
      require(nS - nFinal == nContam, s"decontam dropped ${nS - nFinal}, expected $nContam")
      afterQuality.unpersist(false); afterGate.unpersist(false)
      afterSpan.unpersist(false)
    }
    val pipelineBytes = shuffleBytes.get() - shuffle0
    println(f"SCALE curate shuffleWrite=${pipelineBytes / 1073741824.0}%.2f GiB " +
      f"(indexBuild+pipeline total=${shuffleBytes.get() / 1073741824.0}%.2f GiB)")
    // The shape invariant the timings only imply: past the first
    // projection every shuffle in the composed pipeline is digest-only
    // (minhash signatures, span-window hashes, shingle digests, ids) —
    // the 36-token document text itself is never re-shuffled. Measured
    // ~5.3 KiB/doc on a quiet runner; asserted at ~1.5x headroom so a
    // regression that starts shuffling text (≳ +450 B/doc/stage across
    // four stages, plus join overhead) fails the run rather than just
    // reading slower in a table.
    val perDoc = pipelineBytes.toDouble / nCur
    println(f"SCALE curate shuffle/doc=${perDoc / 1024}%.2f KiB")
    require(perDoc <= 8 * 1024,
      f"curate pipeline shuffled ${perDoc / 1024}%.2f KiB/doc, budget 8 KiB/doc " +
        "— a stage is likely re-shuffling document text instead of digests")
    curIndex.unpersist(false)
    curDocs.unpersist(false)
  }

  /** Round-10 quantile-sketch rehearsal at 50M rows → 20 groups, s=4096:
    * the per-group sample shuffle must be WindowGroupLimit-bounded
    * (groups × s × partitions rows, never the data stream), every
    * estimate must sit within the DKW rank band (±3/(2√s) ≈ ±2.3%), and
    * the bottom-k merge law must hold bit-identically at scale — the
    * properties that price a 100 TB percentile dashboard at one bounded
    * exchange. Standalone: SPARK_GRAFT_SCALE_SECTION=qsketch. */
  private def qsketchAtScale(spark: SparkSession): Unit = {
    import graft.ops.Sketches
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    val n = 50000000L
    val s = 4096
    val qs = Seq(0.5, 0.9, 0.99)
    // group g holds values {g, g+20, g+40, ...}: the true rank of value
    // v within its group is (v-g)/20 + 1, so calibration is closed-form
    def rows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      concat(lit("g"), pmod(col("id"), lit(20))).as("g"),
      col("id").as("uid"), col("id").cast("double").as("v"))

    // the plan must bound the exchange BEFORE it happens: the bottom-s
    // heap aggregate runs in partial mode below the shuffle
    val plan = Sketches.qsampleBottomK(rows(0, n), col("g"), col("uid"),
      col("v"), s).queryExecution.executedPlan.toString
    require(plan.contains("partial_bottom_k_sample"),
      "sample stage lost its partial-mode heap aggregate below the exchange")

    shuffleBytes.set(0L)
    val est = time(s"qsketch: $n rows -> 20 groups x s=$s, 3 quantiles") {
      Sketches.qsampleQuantile(rows(0, n), col("g"), col("uid"), col("v"),
        s, qs).collect()
    }
    val sampleShuffle = shuffleBytes.get()
    println(f"SCALE qsketch shuffle ${sampleShuffle / 1024.0 / 1024.0}%.1f MiB")
    // 20 groups x 4096 x 32 partitions x ~30B ≈ 75 MiB worst case; the
    // 50M-row stream at this width would be ~1.6 GiB
    require(sampleShuffle < 512L * 1024 * 1024,
      f"sample shuffled ${sampleShuffle / 1024.0 / 1024.0}%.1f MiB — stream-sized, not sample-sized")

    require(est.length == 20 * qs.length, s"expected 60 estimates, got ${est.length}")
    val nPerGroup = n / 20
    est.foreach { r =>
      val g = r.getString(0).stripPrefix("g").toLong
      val q = r.getDouble(1); val v = r.getDouble(2)
      val rank = ((v - g) / 20.0 + 1.0) / nPerGroup
      require(math.abs(rank - q) < 3.0 / (2.0 * math.sqrt(s)),
        f"g$g q=$q rank=$rank%.4f outside the DKW band")
    }
    println("SCALE qsketch all 60 estimates inside the DKW rank band")

    // merge law at scale: bottom-s partials of an arbitrary split
    // re-take to the identical sketch
    time("qsketch merge(half1, half2) == whole") {
      val h1 = Sketches.qsampleBottomK(rows(0, n / 2), col("g"), col("uid"), col("v"), s)
      val h2 = Sketches.qsampleBottomK(rows(n / 2, n), col("g"), col("uid"), col("v"), s)
      val merged = Sketches.qsampleQuantiles(h1.union(h2), s, qs).collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val whole = est.map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      require(merged == whole, "merged sketch diverged from the one-shot sketch")
    }
  }

  /** Round-10 web-ingest rehearsal: 32 per-record-gzip WARC segments ×
    * 8k pages (the Common Crawl layout) are written DISTRIBUTED (one
    * file per task — the unit of parallelism a 100k-segment crawl
    * ships), then streamed back through records → htmlDocuments →
    * canonical-URL dedup → link-density boilerplate gate, with every
    * stage's drop count asserted against its planted class. Per-task
    * memory is O(maxPayload); nothing about the path holds a file in
    * memory. Standalone: SPARK_GRAFT_SCALE_SECTION=web. */
  /** Image near-dedup at 1M images: avalanche-mixed 16×16 BMPs (every
    * pair of distinct seeds is Hamming-far with overwhelming margin),
    * ids ≡ 0 (mod 5) planted as one-pixel-perturbed copies of id+1
    * (the perturbed pixel IS a grid sample, flipping ≤ 2 of the 56
    * bits). The decode+hash pass streams payloads map-side — ONLY
    * (id, hash) longs ever cross an exchange, the invariant that keeps
    * image dedup viable when the payload mass is petabytes. Asserted:
    * every planted pair found (banding recall at dist ≤ bands-1 is a
    * pigeonhole THEOREM, so a miss is a bug), false pairs ≤ 100 (at
    * random-hash density the expectation is ≪ 1), total shuffle write
    * ≪ payload mass. Standalone: SPARK_GRAFT_SCALE_SECTION=media. */
  private def mediaDedupAtScale(spark: SparkSession): Unit = {
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val n = 1000000L
    val planted = n / 5
    val payloadBytes = n * (54L + 16 * 48) // 822 B per image
    val media = spark.range(n).as[Long].map { id =>
      val seed = if (id % 5 == 0) id + 1 else id
      def mix(a: Long): Long = {
        var x = a; x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33; x
      }
      val out = new java.io.ByteArrayOutputStream(822)
      def le4(v: Int): Unit =
        (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write('B'); out.write('M'); le4(822); le4(0); le4(54)
      le4(40); le4(16); le4(16); le2(1); le2(24)
      (0 until 24).foreach(_ => out.write(0))
      for (fr <- 0 until 16; x <- 0 until 16) {
        val y = 15 - fr // bottom-up
        val m = mix(seed * 1048573L + x * 65537L + y)
        val bump = if (id % 5 == 0 && x == 3 && y == 3) 1 else 0
        out.write(((m & 0xff) + bump).toInt & 0xff) // B
        out.write(((m >>> 8) & 0xff).toInt)         // G
        out.write(((m >>> 16) & 0xff).toInt)        // R
      }
      (id, out.toByteArray)
    }.toDF("media_id", "payload")
    val pairs = time(s"dHash + banded pairs over $n images (decode map-side)") {
      graft.ops.Multimodal.imageNearDupPairs(media, "media_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    time("assert planted recall + false-pair bound + shuffle bound") {
      val total = pairs.count()
      val plantedFound = pairs
        .where(col("id2") === col("id1") + 1 && col("id1") % 5 === 0).count()
      require(plantedFound == planted,
        s"found $plantedFound of $planted planted near-dup pairs")
      require(total - planted <= 100,
        s"${total - planted} unplanted pairs — hash space degraded")
      val sw = shuffleWrite.get()
      require(sw < payloadBytes / 2,
        s"shuffled $sw bytes against ${payloadBytes}B of payload — " +
          "payloads are crossing an exchange")
      println(f"SCALE media dedup: $total pairs ($planted planted), " +
        f"shuffle ${sw / 1e6}%.1f MB vs payload ${payloadBytes / 1e6}%.1f MB")
    }
    pairs.unpersist(false)
    spark.sparkContext.removeSparkListener(listener)
  }

  /** CROSS-FORMAT image dedup + TEMPORAL video dedup at scale — the
    * round-11 surface under the same discipline as `media`:
    *
    * Images: 200k 64×64 flat-8×8-block scenes (avalanche-mixed block
    * values → every grid sample independent, near-uniform 56-bit
    * hashes), each landing in ONE of the four containers by id mod 4
    * (a real crawl's mix), plus 40k planted RE-UPLOADS of the id ≡ 0
    * (mod 5) scenes in a DIFFERENT container — flat blocks round-trip
    * bit-exactly through all four codecs (JPEG under the DC-8 table),
    * so every planted cross-format pair is hamming-0 BY CONSTRUCTION
    * and a miss is a banding/decoder bug, not noise. Payloads decode
    * map-side; only 8-byte hashes cross an exchange (asserted ≪
    * payload mass).
    *
    * Video: 100k 64×48 4-frame Y4M clips with avalanche per-pixel luma
    * (per-frame hashes independent), ids ≡ 0 (mod 5) re-uploaded
    * TRIMMED (leader frame dropped) under a shifted id — invisible to
    * the frame-0 hash, guaranteed hamming-0 for the temporal
    * any-to-any join (the trimmed clip's sampled frames are a subset
    * of the original's). Asserted: exact planted recovery, false-pair
    * bound, shuffle ≪ payload. Standalone:
    * SPARK_GRAFT_SCALE_SECTION=mixed. */
  private def mixedMediaAtScale(spark: SparkSession): Unit = {
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def mix(a: Long): Long = {
      var x = a; x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33; x
    }
    val containers = graft.ops.MediaScenes.Containers

    // ---- cross-format images -----------------------------------------
    val n = 200000L
    val imgOff = 10000000L
    val imgPlanted = n / 5
    val nContainers = containers.size // all six, lossy VP8 included
    val media = spark.range(n + imgPlanted).as[Long].map { row =>
      // originals cycle through every container; the planted twin of
      // scene id (id ≡ 0 mod 5) lands in the NEXT container under
      // id + imgOff — each planted pair crosses formats by construction
      val (id, cIdx) =
        if (row < n) (row, (row % nContainers).toInt)
        else { val base = (row - n) * 5
          (base, ((base + 1) % nContainers).toInt) }
      val gray = new Array[Byte](64 * 64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          val v = (mix(id * 1048573L + bx * 65537L + by) & 0xff).toByte
          var y = by * 8
          while (y < by * 8 + 8) {
            var x = bx * 8
            while (x < bx * 8 + 8) { gray(y * 64 + x) = v; x += 1 }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      val mediaId = if (row < n) id else id + imgOff
      (mediaId,
        graft.ops.MediaScenes.containerBytes(containers(cIdx), 64, 64, gray))
    }.toDF("media_id", "payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val imgPayload = time(s"synthesize ${n + imgPlanted} mixed-container images") {
      media.select(sum(length(col("payload")))).head().getLong(0)
    }
    val pairs = time("cross-format dHash + banded pairs (decode map-side)") {
      graft.ops.Multimodal.imageNearDupPairs(media, "media_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    time("assert cross-format planted recall + bounds") {
      val total = pairs.count()
      val plantedFound = pairs.where(col("id2") === col("id1") + imgOff &&
        col("id1") % 5 === 0 && col("hamming") === 0L).count()
      require(plantedFound == imgPlanted,
        s"found $plantedFound of $imgPlanted planted cross-format pairs")
      require(total - imgPlanted <= 100,
        s"${total - imgPlanted} unplanted pairs — hash space degraded")
      val sw = shuffleWrite.get()
      require(sw < imgPayload / 2,
        s"shuffled $sw bytes against ${imgPayload}B of payload")
      println(f"SCALE mixed-format dedup: $total pairs ($imgPlanted planted " +
        f"cross-format), shuffle ${sw / 1e6}%.1f MB vs payload ${imgPayload / 1e6}%.1f MB")
    }
    pairs.unpersist(false)
    media.unpersist(false)

    // ---- temporal video ----------------------------------------------
    shuffleWrite.set(0L)
    val vn = 100000L
    val vOff = 20000000L
    val vPlanted = vn / 5
    val (vw, vh) = (64, 48)
    val clips = spark.range(vn + vPlanted).as[Long].map { row =>
      val (id, trim) =
        if (row < vn) (row, 0)
        else ((row - vn) * 5, 1)
      val out = new java.io.ByteArrayOutputStream(
        64 + 4 * (vw * vh * 3 / 2 + 6))
      out.write(s"YUV4MPEG2 W$vw H$vh F25:1 Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII"))
      var t = trim
      while (t < 4) {
        out.write("FRAME\n".getBytes("US-ASCII"))
        var y = 0
        while (y < vh) {
          var x = 0
          while (x < vw) {
            out.write((mix(id * 2097169L + t * 524287L + y * vw + x) & 0xff).toInt)
            x += 1
          }
          y += 1
        }
        var c = 0
        while (c < 2 * (vw / 2) * (vh / 2)) { out.write(128); c += 1 }
        t += 1
      }
      val mediaId = if (row < vn) id else id + vOff
      (mediaId, out.toByteArray)
    }.toDF("media_id", "payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vidPayload = time(s"synthesize ${vn + vPlanted} Y4M clips (incl. trimmed re-uploads)") {
      clips.select(sum(length(col("payload")))).head().getLong(0)
    }
    val vPairs = time("temporal any-to-any banded join over sampled frame hashes") {
      graft.ops.Multimodal.videoNearDupPairsTemporal(clips, "media_id", "payload")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    time("assert trimmed-re-upload recovery + bounds") {
      val total = vPairs.count()
      val plantedFound = vPairs.where(col("id2") === col("id1") + vOff &&
        col("id1") % 5 === 0 && col("hamming") === 0L).count()
      require(plantedFound == vPlanted,
        s"found $plantedFound of $vPlanted planted trimmed re-uploads")
      require(total - vPlanted <= 100,
        s"${total - vPlanted} unplanted pairs — frame-hash space degraded")
      val sw = shuffleWrite.get()
      require(sw < vidPayload / 2,
        s"shuffled $sw bytes against ${vidPayload}B of clip payload")
      println(f"SCALE temporal video dedup: $total pairs ($vPlanted planted " +
        f"trims), shuffle ${sw / 1e6}%.1f MB vs payload ${vidPayload / 1e6}%.1f MB")
    }
    vPairs.unpersist(false)
    clips.unpersist(false)

    // ---- temporal audio ----------------------------------------------
    shuffleWrite.set(0L)
    val an = 100000L
    val aOff = 30000000L
    val aPlanted = an / 5
    val aSamples = 4096 // per clip; frame 32 → 128 frames, window 57
    val tones = spark.range(an + aPlanted).as[Long].map { row =>
      val (id, trim) =
        if (row < an) (row, 0)
        else ((row - an) * 5, 64) // one stride: 2 frames × 32 samples
      val n = aSamples - trim
      val out = new java.io.ByteArrayOutputStream(44 + 2 * n)
      def le4(v: Int): Unit =
        (0 until 4).foreach(b => out.write((v >> (8 * b)) & 0xff))
      def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("RIFF".getBytes("US-ASCII")); le4(2 * n + 36)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); le4(16)
      le2(1); le2(1); le4(16000); le4(32000); le2(2); le2(16)
      out.write("data".getBytes("US-ASCII")); le4(2 * n)
      var k = 0
      while (k < n) {
        val s = (mix(id * 8388617L + (k + trim)) & 0xffff).toInt - 32768
        out.write(s & 0xff); out.write((s >> 8) & 0xff)
        k += 1
      }
      val mediaId = if (row < an) id else id + aOff
      (mediaId, out.toByteArray)
    }.toDF("media_id", "payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val audPayload = time(s"synthesize ${an + aPlanted} PCM tones (incl. trimmed re-uploads)") {
      tones.select(sum(length(col("payload")))).head().getLong(0)
    }
    val aPairs = time("temporal any-to-any banded join over strided sub-fingerprints") {
      graft.ops.Multimodal.audioNearDupPairsTemporal(tones, "media_id",
          "payload", frame = 32, window = 57, stride = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    time("assert trimmed-audio recovery + bounds") {
      val total = aPairs.count()
      val plantedFound = aPairs.where(col("id2") === col("id1") + aOff &&
        col("id1") % 5 === 0 && col("hamming") === 0L).count()
      require(plantedFound == aPlanted,
        s"found $plantedFound of $aPlanted planted trimmed tones")
      // energy-ORDER bits are a Markov chain (adjacent bits share a
      // middle energy, corr −1/4), so the near-zero Hamming tail is
      // heavier than the iid estimate — observed ~170 accidental pairs
      // among 4.3M sub-hashes; bound at 1% of the planted mass
      require(total - aPlanted <= aPlanted / 100,
        s"${total - aPlanted} unplanted pairs — envelope space degraded")
      val sw = shuffleWrite.get()
      // the audio invariant is BYTES PER SUB-HASH, not payload ratio:
      // these fixture clips are an unrealistic 8 KB (real clips are
      // MBs for the same ~36 windows), so payload would mislead — what
      // must hold is that only hash-sized rows cross the exchanges
      val subHashes = (an + aPlanted) * 36L
      require(sw < subHashes * 256L,
        s"shuffled $sw bytes for $subHashes sub-hashes — " +
          "more than hash-sized rows are crossing the exchanges")
      println(f"SCALE temporal audio dedup: $total pairs ($aPlanted planted " +
        f"trims), shuffle ${sw / 1e6}%.1f MB for $subHashes sub-hashes " +
        f"(payload ${audPayload / 1e6}%.1f MB)")
    }
    aPairs.unpersist(false)
    tones.unpersist(false)
    spark.sparkContext.removeSparkListener(listener)
  }

  /** End-to-end WebDataset curation at 260k samples: avalanche-mixed
    * BMP payloads with three planted defect classes added as separate
    * id ranges (so every class count is exact BY CONSTRUCTION):
    * undecodable bytes, exact copies of base images (the re-upload
    * case), and over-bright frames. The pipeline is the production
    * shape: decode gate (null hash) → photometric gate (mean luma) →
    * cross-corpus near-dup against the base index → curated samples
    * leave as tar shards via TarWriter and re-read EXACTLY via
    * TarReader. Every stage's drop count asserted equal to its planted
    * class. Standalone: SPARK_GRAFT_SCALE_SECTION=wds. */
  private def webdatasetAtScale(spark: SparkSession): Unit = {
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val n = 200000L
    val c = 20000L
    def mix(a: Long): Long = {
      var x = a; x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33; x
    }
    def bmp(seed: Long, brighten: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(822)
      def le4(v: Int): Unit =
        (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
      def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write('B'); out.write('M'); le4(822); le4(0); le4(54)
      le4(40); le4(16); le4(16); le2(1); le2(24)
      (0 until 24).foreach(_ => out.write(0))
      for (fr <- 0 until 16; x <- 0 until 16) {
        val m = mix(seed * 1048573L + x * 65537L + (15 - fr))
        def ch(v: Long): Int =
          if (brighten) ((v & 0xff) | 0xc0L).toInt else (v & 0xff).toInt
        out.write(ch(m)); out.write(ch(m >>> 8)); out.write(ch(m >>> 16))
      }
      out.toByteArray
    }
    // base 0..n-1; corrupt n..n+c-1; dup 2n..2n+c-1 (copy of id-2n);
    // bright 3n..3n+c-1 — disjoint ranges, exact class accounting
    val media = spark.range(4L * n).as[Long].flatMap { id =>
      if (id < n) Iterator.single((id, bmp(id, brighten = false)))
      else if (id < n + c)
        Iterator.single((id, Array.tabulate(200)(i => (mix(id + i) & 0xff).toByte)))
      else if (id >= 2 * n && id < 2 * n + c)
        Iterator.single((id, bmp(id - 2 * n, brighten = false)))
      else if (id >= 3 * n && id < 3 * n + c)
        Iterator.single((id, bmp(id, brighten = true)))
      else Iterator.empty
    }.toDF("media_id", "payload")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = n + 3 * c
    require(media.count() == total)

    val decoded = time(s"decode gate over $total payloads (hash null = drop)") {
      val d = media.withColumn("dh",
          graft.ops.Multimodal.imageDHash(col("payload")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dropped = d.where(col("dh").isNull).count()
      require(dropped == c, s"decode gate dropped $dropped, planted $c corrupt")
      d.where(col("dh").isNotNull)
    }

    val lumaKept = time("photometric gate (mean luma window)") {
      val withLum = decoded.withColumn("f",
          graft.ops.Multimodal.decodeImagePixels(col("payload")))
        .withColumn("mean_lum",
          expr("(2126 * f.sum_r + 7152 * f.sum_g + 722 * f.sum_b) div f.n_pixels"))
      val kept = withLum.where(col("mean_lum") < 1700000L).drop("f", "mean_lum")
      val dropped = withLum.where(col("mean_lum") >= 1700000L).count()
      require(dropped == c, s"photometric gate dropped $dropped, planted $c bright")
      kept
    }

    val curated = time("cross-corpus near-dup vs the base index") {
      val index = lumaKept.where(col("media_id") < n)
        .select(col("media_id").as("id"), col("dh"))
      val incoming = lumaKept.where(col("media_id") >= n)
      val flagged = graft.ops.Multimodal.mediaNearDupAgainst(
          incoming, "media_id", col("dh"), index)
        .select(col("new_id")).distinct()
      val nFlagged = flagged.count()
      require(nFlagged == c, s"near-dup flagged $nFlagged, planted $c copies")
      lumaKept.join(flagged.withColumnRenamed("new_id", "media_id"),
        Seq("media_id"), "left_anti")
    }

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-scale-wds").toString
    time(s"write curated corpus as 16 tar shards (TarWriter)") {
      val samples = curated.select(
        pmod(col("media_id"), lit(16L)).cast("string").as("shard"),
        col("media_id").cast("string").as("key"),
        map(lit("bmp"), col("payload")).as("parts"))
      val shards = graft.sources.TarWriter.writeSamples(samples, outDir)
      require(shards == 16, s"wrote $shards shards, expected 16")
    }
    time("re-read the shards: every curated sample comes back exactly") {
      val back = graft.sources.TarReader.webdatasetSamples(
        graft.sources.TarReader.entries(spark, outDir))
      require(back.count() == n, s"re-read ${back.count()}, curated $n")
      // content fidelity: order-free xor of payload md5 prefixes
      def digest(df: org.apache.spark.sql.DataFrame, payload: org.apache.spark.sql.Column) =
        df.select(conv(substring(md5(payload), 1, 9), 16, 10).cast("long").as("h"))
          .agg(sum(col("h"))).head().getLong(0)
      val a = digest(curated, col("payload"))
      val b = digest(back, element_at(col("parts"), "bmp"))
      require(a == b, "payload mass changed through the tar round-trip")
    }
    media.unpersist(false)
    println(f"SCALE webdataset curation ok: $total in, $n curated, " +
      f"3 x $c planted drops exact")
  }

  private def webIngestAtScale(spark: SparkSession): Unit = {
    import graft.ops.WebText
    import graft.sources.WarcReader
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val nFiles = 32
    val docsPerFile = 8000
    val nDocs = nFiles.toLong * docsPerFile
    val root = java.nio.file.Files.createTempDirectory("graft-scale-warc")
    val dirStr = root.toString

    // write segments distributed through the real writer (one
    // gzip-multi-member segment per task). Plants: odd ids are
    // URL-variants of the preceding even id (same canonical),
    // ids % 16 == 0 are link-soup boilerplate.
    time(s"write $nFiles WARC segments x $docsPerFile pages (distributed)") {
      val id2 = expr("id div 2").cast("string")
      val pages = spark.range(nDocs).select(
        when(col("id") % 2 === 1,
          concat(lit("HTTPS://WWW.ex.com/p/"), id2, lit("?utm_source=x&b=2&a=1#f")))
          .otherwise(concat(lit("https://ex.com/p/"), id2, lit("?a=1&b=2")))
          .as("url"),
        when(col("id") % 16 === 0,
          lit("<body>" + (1 to 12).map(j =>
            s"""<a href="/nav$j">section $j link text</a>""").mkString(" ") +
            "</body>"))
          .otherwise(concat(lit("<html><title>doc "), col("id"),
            lit("</title><body><p>prose page number "), col("id"),
            lit(" with " + ("filler words " * 10) +
              "</p><a href=\"/next\">next</a></body></html>")))
          .as("payload"))
      val written = graft.sources.WarcWriter.write(
        pages.repartition(nFiles), dirStr)
      require(written == nFiles, s"wrote $written segments, expected $nFiles")
    }

    val docs = time(s"read+extract $nDocs pages (records -> htmlDocuments)") {
      val d = WarcReader.htmlDocuments(WarcReader.records(spark, dirStr))
        .select(col("url"), col("text"),
          WebText.linkDensity(col("html")).as("ld"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      require(d.count() == nDocs, "lost records in the parse")
      d
    }

    val deduped = time("canonical-URL dedup (odd ids collapse into even)") {
      // keep the variant already in canonical form (the even-id page —
      // lowercase sorts after the odd 'HTTPS://WWW.' twin, so desc)
      val d = docs.withColumn("curl", WebText.canonicalizeUrl(col("url")))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("curl"))
            .orderBy(col("url").desc)))
        .where(col("rnk") === 1).drop("rnk")
      val kept = d.count()
      require(kept == nDocs / 2,
        s"URL dedup kept $kept, planted ${nDocs / 2} canonical pages")
      d
    }

    time("link-density boilerplate gate (ids % 16 planted as soup)") {
      val kept = deduped.where(col("ld") < 0.5).count()
      // survivors of dedup are the even ids; soup ids (g % 16 == 0) are
      // all even, so exactly nDocs/16 of the nDocs/2 survivors drop
      val expect = nDocs / 2 - nDocs / 16
      require(kept == expect, s"boilerplate gate kept $kept, expected $expect")
    }
    docs.unpersist(false)
    println(f"SCALE web ingest end-to-end ok: $nDocs pages, " +
      f"${nDocs / 2 - nDocs / 16} curated")
  }
}
