package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.tsdb._

class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def writeBatch(dir: String, fromK: Int, untilK: Int): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = (for {
      job <- Seq("api", "web"); k <- fromK until untilK
    } yield Row(Map("__name__" -> "up", "job" -> job),
      1700000000000L + k * 15000L, k.toDouble)).asJava
    spark.createDataFrame(rows, StreamIngest.inputSchema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
  }

  test("file-stream ingest: exactly-once across restarts (shipper equivalent)") {
    val root = Files.createTempDirectory("graft-stream")
    val in = root.resolve("in").toString
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString

    writeBatch(in, 0, 100)
    StreamIngest.ingestStream(spark, in, store, ckpt).awaitTermination()
    assert(spark.read.parquet(store).count() == 200)

    // second batch arrives; restart processes ONLY the new file
    writeBatch(in, 100, 150)
    StreamIngest.ingestStream(spark, in, store, ckpt).awaitTermination()
    assert(spark.read.parquet(store).count() == 300)

    // re-run with nothing new: no duplicates (checkpoint = ULID-dedup role)
    StreamIngest.ingestStream(spark, in, store, ckpt).awaitTermination()
    assert(spark.read.parquet(store).count() == 300)

    // ingested store is queryable through the standard querier
    val q = TsStore.read(spark, store)
    val s = q.selectStreams(0, Long.MaxValue, Seq(LabelMatcher.eq("job", "api"))).collect()
    assert(s.length == 1 && s.head.samples.size == 150)
    assert(s.head.samples.map(_.t) == s.head.samples.map(_.t).sorted)
  }

  test("ivf index stream: micro-batches append to the stored layout, exactly once") {
    import graft.ops.Similarity
    val root = Files.createTempDirectory("graft-ivf-stream")
    val in = root.resolve("in").toString
    val index = root.resolve("index").toString
    val ckpt = root.resolve("ckpt").toString
    import spark.implicits._
    def vecs(from: Long, until: Long) = (from until until).map { i =>
      (i, (0 until 8).map(d => math.sin(i * 1.9 + d * 0.8)))
    }.toDF("vec_id", "embedding")
    val schema = vecs(0, 1).schema
    // frozen centroids from the first corpus slice
    val cents = Similarity.kmeansCentroids(vecs(0, 30), "vec_id", "embedding",
      k = 4, iters = 2).persist()
    cents.count()

    vecs(0, 30).coalesce(1).write.mode(SaveMode.Append).parquet(in)
    StreamIngest.ivfIndexStream(spark, in, schema, index, ckpt,
      "vec_id", "embedding", cents).awaitTermination()
    assert(spark.read.parquet(index).count() == 30)

    // a later embedding batch arrives; restart assigns + appends only it
    vecs(30, 40).coalesce(1).write.mode(SaveMode.Append).parquet(in)
    StreamIngest.ivfIndexStream(spark, in, schema, index, ckpt,
      "vec_id", "embedding", cents).awaitTermination()
    assert(spark.read.parquet(index).count() == 40)

    // nothing new: checkpoint prevents re-appends
    StreamIngest.ivfIndexStream(spark, in, schema, index, ckpt,
      "vec_id", "embedding", cents).awaitTermination()
    assert(spark.read.parquet(index).count() == 40)

    // the maintained index serves identically to a one-shot build
    val q = vecs(0, 2)
    val fromStore = Similarity.ivfTopKStored(q, spark.read.parquet(index),
        "vec_id", "embedding", cents, "cell", "centv", k = 3, nprobe = 2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val fromMem = Similarity.ivfTopK(q,
        Similarity.ivfAssign(vecs(0, 40), "vec_id", "embedding", cents, "cell", "centv"),
        "vec_id", "embedding", cents, "cell", "centv", k = 3, nprobe = 2)
      .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    assert(fromStore == fromMem)
    cents.unpersist()
  }

  test("downsample stream: closed windows materialize incrementally") {
    val root = Files.createTempDirectory("graft-downstream")
    val in = root.resolve("in").toString
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    val res = 5 * 60 * 1000L // 5m ladder rung

    // 100 samples @15s per series = 25 minutes; lag 1m → windows closed
    // through minute 24 → w_t ∈ {0,5,10,15}m relative to the aligned start
    writeBatch(in, 0, 100)
    StreamIngest.downsampleStream(spark, in, store, ckpt,
      resolutions = Seq(res), lagMs = 60 * 1000L).awaitTermination()
    val t0 = 1700000000000L
    val w0 = t0 - (t0 % res)
    val d1 = TsDownsample.readMaterialized(spark, store, res)
    val w1 = d1.select("w_t").distinct().collect().map(_.getLong(0)).sorted
    assert(w1.nonEmpty && w1.head == w0 && w1.last < t0 + 100 * 15000L - 60000L)

    // more data arrives: restart materializes ONLY the newly closed
    // windows (no duplicates for already-materialized ones)
    writeBatch(in, 100, 200)
    StreamIngest.downsampleStream(spark, in, store, ckpt,
      resolutions = Seq(res), lagMs = 60 * 1000L).awaitTermination()
    val d2 = TsDownsample.readMaterialized(spark, store, res)
    assert(d2.groupBy("fingerprint", "w_t").count().where(col("count") > 1).count() == 0)
    assert(d2.select("w_t").distinct().count() > w1.length)

    // materialized aggregates equal a batch downsample of the raw store
    // over the same closed windows
    val wMax = d2.agg(max("w_t")).head().getLong(0)
    val batch = TsDownsample.downsample(
      spark.read.parquet(store), res).where(col("w_t") <= wMax)
    val joined = d2.alias("m").join(batch.alias("b"), Seq("labels", "w_t"), "full")
      .where(col("m.n").isNull || col("b.n").isNull ||
        col("m.n") =!= col("b.n") || abs(col("m.sum_v") - col("b.sum_v")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("ingest+ship stream: closed windows become native blocks") {
    import spark.implicits._
    val t0 = 1700000000000L - (1700000000000L % TsSchema.BlockMs)
    val in = Files.createTempDirectory("shipstream-in").toString
    val store = Files.createTempDirectory("shipstream-store").resolve("s").toString
    val blocks = Files.createTempDirectory("shipstream-blocks").toString
    val ckpt = Files.createTempDirectory("shipstream-ckpt").toString
    def write(ts: Seq[Long]): Unit =
      ts.map(t => (Map("__name__" -> "up", "job" -> "a"), t, 1.0))
        .toDF("labels", "t", "v").coalesce(1).write.mode("append").parquet(in)
    // window 1 fully present + the first sample of window 2
    write((0 until 120).map(k => t0 + k * 60000L) :+ (t0 + TsSchema.BlockMs))
    val q1 = StreamIngest.ingestAndShipStream(spark, in, store, blocks, ckpt,
      lagMs = 10 * 60000L)
    q1.awaitTermination()
    // stream head is only 1 min into window 2 → nothing closed yet
    assert(BlockShipper.shipped(blocks).isEmpty)
    // advance 11 min past the window-1 boundary → window 1 ships
    write(Seq(t0 + TsSchema.BlockMs + 11 * 60000L))
    val q2 = StreamIngest.ingestAndShipStream(spark, in, store, blocks, ckpt,
      lagMs = 10 * 60000L)
    q2.awaitTermination()
    assert(BlockShipper.shipped(blocks) == Set(t0))
    val ds = spark.read.format("graft-tsdb").load(blocks)
    assert(ds.count() == 120)
    assert(ds.agg(org.apache.spark.sql.functions.min(col("t"))).head().getLong(0) == t0)
  }

  test("rules stream: incremental recording + alert materialization") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("rulestream")
    val in = root.resolve("in").toString
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    val t0 = 1700000000000L - (1700000000000L % 60000L) // minute-aligned
    def write(fromK: Int, untilK: Int): Unit = {
      val rows = (for {
        job <- Seq("api", "web"); k <- fromK until untilK
      } yield Row(Map("__name__" -> "up", "job" -> job),
        t0 + k * 15000L, k.toDouble)).asJava
      spark.createDataFrame(rows, StreamIngest.inputSchema)
        .coalesce(1).write.mode(SaveMode.Append).parquet(in)
    }
    def run(): Unit = StreamIngest.rulesStream(spark, in, store, ckpt,
      startMs = t0, stepMs = 60000L,
      rules = Seq("up:sum" -> "sum(up)"),
      alerts = Seq(("UpHigh", "sum(up) > 50", 120000L)),
      lagMs = 120000L).awaitTermination()

    write(0, 100) // ~25 min of 15s samples, values = k, two series
    run()
    def metric(name: String) = TsStore.read(spark, store)
      .selectLong(0L, Long.MaxValue / 2,
        Seq(LabelMatcher.eq(Labels.MetricName, name)))
    // sum(up) at minute m sees k=4m per series ⇒ 8m; m=0..22 closed
    // under the 2-minute lag
    val rec1 = metric("up:sum").select(col("t"), col("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(rec1.size == 23)
    assert(rec1.forall { case (t, v) => v == 8.0 * ((t - t0) / 60000L) })
    // alert: 8m > 50 holds from m=7; with for=2m it fires from m=9
    val al1 = metric("UpHigh").select(col("t")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(al1 == (9 to 22).map(m => t0 + m * 60000L))

    write(100, 140) // stream advances; markers resume, nothing recomputed
    run()
    val rec2 = metric("up:sum").select(col("t")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rec2 == (0 to 32).map(m => t0 + m * 60000L)) // no duplicates
    val al2 = metric("UpHigh").select(col("t")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(al2 == (9 to 32).map(m => t0 + m * 60000L))
  }

  test("windowed aggregation with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val longForm = mem.toDF()
      .select(map(lit("__name__"), lit("up")).as("labels"),
        col("_1").as("t"), col("_2").as("v"))
    val agg = StreamIngest.windowedAgg(longForm, "1 minute", "2 minutes")
    val query = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    // two complete minutes of data + events far enough ahead to close them
    mem.addData((0 until 8).map(i => (1699999980000L + i * 15000L, 1.0)): _*) // minute-aligned t0
    query.processAllAvailable()
    mem.addData((1699999980000L + 10 * 60000L, 5.0)) // advances watermark
    query.processAllAvailable()
    val out = spark.table("winagg").orderBy("window_start").collect()
    query.stop()
    assert(out.length == 2) // two closed 1-minute windows emitted
    assert(out.forall(_.getAs[Long]("n") == 4))
    assert(out.forall(_.getAs[Double]("sum_v") == 4.0))
  }

  test("session windows close after gap") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val longForm = mem.toDF()
      .select(map(lit("__name__"), lit("up")).as("labels"),
        col("_1").as("t"), col("_2").as("v"))
    val agg = StreamIngest.sessionAgg(longForm, "5 minutes", "10 minutes")
    val query = agg.writeStream.format("memory").queryName("sessagg")
      .outputMode("append").start()
    // burst of 3 samples, 6-minute silence, burst of 2, then a far event
    mem.addData((0 until 3).map(i => (1700000000000L + i * 60000L, 1.0)): _*)
    mem.addData((0 until 2).map(i => (1700000000000L + 9 * 60000L + i * 60000L, 1.0)): _*)
    query.processAllAvailable()
    mem.addData((1700000000000L + 60 * 60000L, 1.0))
    query.processAllAvailable()
    val out = spark.table("sessagg").orderBy("session_start").collect()
    query.stop()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(3L, 2L))
  }

  test("streaming rate: state carries the predecessor across batches, resets handled") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)] // (job, t, v)
    val longForm = mem.toDF()
      .select(map(lit("__name__"), lit("reqs"), lit("job"), col("_1")).as("labels"),
        col("_2").as("t"), col("_3").as("v"))
    val rate = StreamIngest.streamingRate(longForm)
    val query = rate.writeStream.format("memory").queryName("srate")
      .outputMode("append").start()
    val t0 = 1700000000000L
    // batch 1: api counter 0 → 10 (10s apart); web single sample
    mem.addData(("api", t0, 0.0), ("api", t0 + 10000, 10.0), ("web", t0, 5.0))
    query.processAllAvailable()
    // batch 2: api continues 10 → 4 (RESET) → 6; web continues from state
    mem.addData(("api", t0 + 20000, 4.0), ("api", t0 + 30000, 6.0),
      ("web", t0 + 20000, 9.0))
    query.processAllAvailable()
    val out = spark.table("srate").orderBy("fingerprint", "t").collect()
      .map(r => (r.getAs[Long]("t") - t0, r.getAs[Double]("increase"),
        r.getAs[Double]("rate")))
    query.stop()
    // api: +10 over 10s; reset→4 over 10s; +2 over 10s. web: +4 over 20s.
    // (fingerprints differ so group by offset set)
    assert(out.toSet == Set(
      (10000L, 10.0, 1.0), (20000L, 4.0, 0.4), (30000L, 2.0, 0.2),
      (20000L, 4.0, 0.2)))
  }

  test("streaming rate: a late sample neither emits nor regresses state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val longForm = mem.toDF()
      .select(map(lit("__name__"), lit("reqs"), lit("job"), col("_1")).as("labels"),
        col("_2").as("t"), col("_3").as("v"))
    val rate = StreamIngest.streamingRate(longForm)
    val query = rate.writeStream.format("memory").queryName("srate_late")
      .outputMode("append").start()
    val t0 = 1700000000000L
    mem.addData(("api", t0, 0.0), ("api", t0 + 20000, 10.0))
    query.processAllAvailable()
    // late sample INSIDE the 10m watermark: must not emit a point and
    // must not replace the stored (t0+20s, 10.0) predecessor
    mem.addData(("api", t0 + 10000, 4.0))
    query.processAllAvailable()
    // next in-order sample computes against 10.0 at t0+20s, NOT 4.0
    mem.addData(("api", t0 + 30000, 12.0))
    query.processAllAvailable()
    val out = spark.table("srate_late").orderBy("t").collect()
      .map(r => (r.getAs[Long]("t") - t0, r.getAs[Double]("increase"),
        r.getAs[Double]("rate")))
    query.stop()
    assert(out.toSeq == Seq((20000L, 10.0, 0.5), (30000L, 2.0, 0.2)))
  }

  test("streaming dedup suppresses repeated documents within the watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (t ms, text)
    val docsStream = mem.toDF()
      .select(timestamp_millis(col("_1")).as("ts"), col("_2").as("text"))
    val dd = StreamIngest.streamingDedup(docsStream, "ts", "text", "10 minutes")
    val query = dd.writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    val t0 = 1700000000000L
    // within-batch duplicate + distinct doc
    mem.addData((t0, "alpha doc"), (t0 + 1000L, "alpha doc"), (t0 + 2000L, "beta doc"))
    query.processAllAvailable()
    // cross-batch duplicate still inside the watermark horizon
    mem.addData((t0 + 60000L, "alpha doc"), (t0 + 61000L, "gamma doc"))
    query.processAllAvailable()
    val texts = spark.table("streamdedup").collect()
      .map(_.getAs[String]("text")).sorted.toSeq
    query.stop()
    assert(texts == Seq("alpha doc", "beta doc", "gamma doc"))
  }

  test("streaming span index: batch N+1 flags spans duplicated across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-spanidx")
    val idx = root.resolve("idx").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, String)] // (doc_id, text)
    val docsStream = mem.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"))
    val query = StreamIngest.spanIndexStream(docsStream, "doc_id", "text",
      spanTokens = 3, idx, ckpt, daemon = true)

    val b1 = Seq((1L, "alpha beta gamma delta unique tail"),
      (2L, "totally different words in here"))
    val b2 = Seq((3L, "prefix alpha beta gamma delta suffix"))
    mem.addData(b1: _*)
    query.processAllAvailable()
    // batch 1 alone: no span crosses minDocs — empty tail
    assert(StreamIngest.spanIndexView(spark, idx, minDocs = 2).count() == 0)

    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    // batch 2 shares "alpha beta gamma"/"beta gamma delta" with doc 1:
    // the incremental tail must equal the batch spanIndex on the UNION
    val union = (b1 ++ b2).toDF("doc_id", "text")
    def key(r: Row) = (r.getString(0), r.getLong(1), r.getLong(2))
    val streamed = StreamIngest.spanIndexView(spark, idx, minDocs = 2)
      .collect().map(key).toSet
    val batch = graft.ops.Dedup.spanIndex(union, "doc_id", "text",
      spanTokens = 3, minDocs = 2).collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch)

    // scoring against the incremental tail — including RE-scoring doc 1,
    // whose spans became duplicated only at batch 2 — matches the batch
    // spanDupScore on the union
    def skey(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getBoolean(4))
    val against = graft.ops.Dedup.spanDupScoreAgainst(union, "doc_id", "text",
      spanTokens = 3, StreamIngest.spanIndexView(spark, idx, minDocs = 2),
      maxDupFrac = 0.5).collect().map(skey).toSet
    val full = graft.ops.Dedup.spanDupScore(union, "doc_id", "text",
      spanTokens = 3, maxDupFrac = 0.5).collect().map(skey).toSet
    assert(against == full)
    assert(against.exists { case (id, _, nd, _, _) => id == 1L && nd > 0 })

    // compaction collapses the per-batch partials; the tail is unchanged
    StreamIngest.compactSpanIndex(spark, idx, targetFiles = 1)
    val compacted = StreamIngest.spanIndexView(spark, idx, minDocs = 2)
      .collect().map(key).toSet
    assert(compacted == batch)
    // singletons survive compaction (future batches may duplicate them)
    assert(spark.read.parquet(idx).where(col("n_docs") === 1).count() > 0)

    // a batch REPLAYED after compaction (crash between its parquet
    // write and the checkpoint commit) re-creates its batch dir; the
    // _compacted_through marker makes readers ignore the stale partials
    // instead of adding them on top of the already-folded rows
    assert(StreamIngest.compactedThrough(idx) == 1L)
    b2.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.shingles(col("text"), 3)).as("span"))
      .groupBy(org.apache.spark.sql.functions.md5(col("span")).as("span_digest"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.min(col("doc_id")).as("first_doc"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$idx/batch=1")
    spark.catalog.refreshByPath(idx)
    assert(StreamIngest.spanIndexView(spark, idx, minDocs = 2)
      .collect().map(key).toSet == batch)
    // a second compaction must not re-fold the stale dir either
    StreamIngest.compactSpanIndex(spark, idx, targetFiles = 1)
    assert(StreamIngest.spanIndexView(spark, idx, minDocs = 2)
      .collect().map(key).toSet == batch)
  }

  test("streaming native histogram: merged partials equal the batch observe") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-nhstream")
    val idx = root.resolve("hist").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, Double)] // (group, value)
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("v"))
    val query = StreamIngest.nativeHistStream(rows, "v", schema = 2,
      Seq("g"), idx, ckpt, daemon = true)

    val b1 = (1 to 300).map(i => ("a", (i % 53 + 1).toDouble)) :+ ("a", 0.0)
    val b2 = (1 to 200).map(i => ("a", (i % 91 + 1).toDouble)) :+ ("a", -3.0)
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(r.fieldIndex("g")), r.getLong(r.fieldIndex("count")),
        r.getLong(r.fieldIndex("zero_count")),
        math.round(r.getDouble(r.fieldIndex("sum")) * 1e6),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("buckets"))
          .map(b => (b.getLong(0), b.getLong(1))))
    }.toSet
    val streamed = StreamIngest.nativeHistView(spark, idx, Seq("g"))
    val batch = graft.ops.NativeHistogram.observe(
      (b1 ++ b2).toDF("g", "v"), col("v"), 2, Seq("g"))
    assert(key(streamed) == key(batch))
    // and the served quantile goes through the same classic route
    val qs = graft.ops.NativeHistogram.quantile(streamed, 0.9, Seq("g"))
      .head().getDouble(1)
    val qb = graft.ops.NativeHistogram.quantile(batch, 0.9, Seq("g"))
      .head().getDouble(1)
    assert(qs == qb)
  }

  test("streaming heavy hitters: candidate-union recount equals the batch operator") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-hhstream")
    val idx = root.resolve("cands").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, String)] // (group, key)
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("w"))
    val query = StreamIngest.heavyHittersStream(rows, "g", "w", m = 8,
      idx, ckpt, daemon = true)

    // heavies shift weight between batches; tails churn the m=8 summaries
    val b1 = Seq.fill(60)(("a", "h1")) ++ Seq.fill(40)(("a", "h2")) ++
      Seq.fill(25)(("a", "h3")) ++ (1 to 20).map(i => ("a", s"t$i"))
    val b2 = Seq.fill(35)(("a", "h1")) ++ Seq.fill(50)(("a", "h2")) ++
      Seq.fill(20)(("a", "h3")) ++ (15 to 34).map(i => ("a", s"t$i"))
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    // the view recounts the stored candidate union against the corpus
    // the ingest path accumulates — here, the batch union itself
    val union = (b1 ++ b2).toDF("g", "w")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(r.fieldIndex("grp")), r.getString(r.fieldIndex("key")),
        r.getLong(r.fieldIndex("cnt")), r.getInt(r.fieldIndex("rnk")))
    }.toSet
    val streamed = StreamIngest.heavyHittersView(spark, idx, union, "g", "w", k = 3)
    val batch = graft.ops.Sketches.heavyHitters(union, col("g"), col("w"), k = 3, m = 8)
    assert(key(streamed) == key(batch))
    // counts are EXACT (recount, not summary estimates), ranking is the
    // true top-3: k-th frequency 45 clears the N/m ≈ 34 contract line
    assert(key(streamed) == Set(("a", "h1", 95L, 1), ("a", "h2", 90L, 2),
      ("a", "h3", 45L, 3)))
  }

  test("streaming HLL: register max-merge equals the batch sketch on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-hllstream")
    val idx = root.resolve("regs").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, Long)] // (group, user)
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("u"))
    val query = StreamIngest.hllRegisterStream(rows, "g", "u", m = 64,
      idx, ckpt, daemon = true)

    val b1 = (1L to 400L).map(i => ("a", i)) ++ (1L to 9L).map(i => ("b", i))
    val b2 = (201L to 600L).map(i => ("a", i)) // 200 overlap + 200 new
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = StreamIngest.hllEstimateView(spark, idx, m = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = graft.ops.Sketches.hllDistinct(
      (b1 ++ b2).toDF("g", "u"), col("g"), col("u"), m = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // register max-merge is EXACTLY the union's registers — estimates
    // agree bit-for-bit, including the overlap (no double counting)
    assert(streamed == batch)
    assert(math.abs(streamed("a") - 600.0) / 600.0 < 0.4) // m=64 ≈ ±13% σ
  }

  test("streaming KMV: bottom-k merge equals the batch sketch on the union") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-kmvstream")
    val idx = root.resolve("hashes").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, Long)]
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("u"))
    val query = StreamIngest.kmvHashStream(rows, "g", "u", k = 32,
      idx, ckpt, daemon = true)

    mem.addData((1L to 300L).map(i => ("a", i)): _*)
    query.processAllAvailable()
    mem.addData((151L to 450L).map(i => ("a", i)) ++ Seq(("b", 1L), ("b", 2L)): _*)
    query.processAllAvailable()
    query.stop()

    val streamed = StreamIngest.kmvEstimateView(spark, idx, k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = graft.ops.Sketches.kmvDistinct(
      ((1L to 450L).map(i => ("a", i)) ++ Seq(("b", 1L), ("b", 2L))).toDF("g", "u"),
      col("g"), col("u"), k = 32)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the k smallest of the union are among the union of per-batch
    // bottom-ks → estimates agree exactly; overlap cannot double-count
    assert(streamed == batch)
    assert(streamed("b") == 2.0) // below k → exact count survives merge
  }

  test("warc ingest stream: each landing segment extracted exactly once") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-warcstream")
    val crawl = root.resolve("crawl").toString
    val docsP = root.resolve("docs").toString
    val ckpt = root.resolve("ckpt").toString
    new java.io.File(crawl).mkdirs()
    def segment(ids: Range): Unit = {
      val df = ids.map(i => (s"https://ex.com/s/$i",
        s"<html><title>s$i</title><body>segment doc $i</body></html>"))
        .toDF("url", "payload")
      graft.sources.WarcWriter.write(df.repartition(1), crawl)
      ()
    }
    segment(0 until 40)
    segment(40 until 80)
    val q = StreamIngest.warcIngestStream(spark, crawl, docsP, ckpt,
      daemon = true)
    q.processAllAvailable()
    assert(StreamIngest.warcDocsView(spark, docsP).count() == 80)
    // a segment LANDS mid-stream: next trigger picks up only the new file
    segment(80 until 100)
    q.processAllAvailable()
    q.stop()
    val docs = StreamIngest.warcDocsView(spark, docsP)
    assert(docs.count() == 100)
    // exactly once: every url distinct, extraction + canonical url real
    assert(docs.select(col("curl")).distinct().count() == 100)
    val d7 = docs.where(col("url") === "https://ex.com/s/7").head()
    assert(d7.getAs[String]("text") == "s7 segment doc 7")
    assert(d7.getAs[String]("title") == "s7")
    // restart on the same checkpoint: the seen-file log replays nothing
    segment(100 until 110)
    val q2 = StreamIngest.warcIngestStream(spark, crawl, docsP, ckpt,
      daemon = true)
    q2.processAllAvailable()
    q2.stop()
    assert(StreamIngest.warcDocsView(spark, docsP).count() == 110)
  }

  test("tar ingest stream: each landing WebDataset shard regrouped exactly once") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-tarstream")
    val inbox = root.resolve("inbox").toString
    val samplesP = root.resolve("samples").toString
    val ckpt = root.resolve("ckpt").toString
    new java.io.File(inbox).mkdirs()
    def shard(ids: Range): Unit = {
      val df = ids.map(i => (1, s"s$i",
          Map("txt" -> s"caption $i".getBytes("UTF-8"),
            "cls" -> s"${i % 3}".getBytes("UTF-8"))))
        .toDF("shard", "key", "parts")
      graft.sources.TarWriter.writeSamples(df, inbox,
        prefix = s"in${ids.start}")
      ()
    }
    shard(0 until 30)
    val q = StreamIngest.tarIngestStream(spark, inbox, samplesP, ckpt,
      daemon = true)
    q.processAllAvailable()
    assert(StreamIngest.tarSamplesView(spark, samplesP).count() == 30)
    // a shard LANDS mid-stream: next trigger picks up only the new file
    shard(30 until 50)
    q.processAllAvailable()
    q.stop()
    val samples = StreamIngest.tarSamplesView(spark, samplesP)
    assert(samples.count() == 50)
    assert(samples.select(col("key")).distinct().count() == 50)
    val s7 = samples.where(col("key") === "s7").head()
    assert(new String(s7.getAs[Map[String, Array[Byte]]]("parts")("txt"),
      "UTF-8") == "caption 7")
    assert(s7.getAs[Long]("n_parts") == 2L)
    // restart on the same checkpoint: the seen-file log replays nothing
    shard(50 until 60)
    val q2 = StreamIngest.tarIngestStream(spark, inbox, samplesP, ckpt,
      daemon = true)
    q2.processAllAvailable()
    q2.stop()
    assert(StreamIngest.tarSamplesView(spark, samplesP).count() == 60)
    // identity-fold compaction: per-batch small files bin-pack into the
    // batch=-1 partition, the view is unchanged, and a REPLAYED batch
    // directory is inert afterwards (marker-gated), not double-counted
    val before = StreamIngest.tarSamplesView(spark, samplesP)
      .select(col("key")).collect().map(_.getString(0)).sorted.toSeq
    StreamIngest.compactMonoidStore(spark, samplesP, targetFiles = 2)(identity)
    val after = StreamIngest.tarSamplesView(spark, samplesP)
    assert(after.select(col("key")).collect().map(_.getString(0)).sorted.toSeq
      == before)
    val batchDirs = new java.io.File(samplesP).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet
    assert(batchDirs == Set("batch=-1"))
    // simulate a stale replay of batch 0: its rows must not reappear
    StreamIngest.tarSamplesView(spark, samplesP).limit(5)
      .withColumn("batch", lit(0L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$samplesP/batch=0")
    spark.catalog.refreshByPath(samplesP)
    assert(StreamIngest.tarSamplesView(spark, samplesP).count() == 60)
  }

  test("tar ingest → media-dedup composition: arriving images checked vs corpus") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-targate")
    val inbox = root.resolve("inbox").toString
    val samplesP = root.resolve("samples").toString
    val ckpt = root.resolve("ckpt").toString
    new java.io.File(inbox).mkdirs()
    def bmpPayload(id: Long): Array[Byte] =
      graft.ops.Multimodal.synthesizeBitmap(
        Seq((id, "s")).toDF("doc_id", "source"), "doc_id", "source")
        .head().getAs[Array[Byte]]("payload")
    def shard(name: String, ids: Seq[Long], imageOf: Long => Long): Unit = {
      val df = ids.map(i => (1, s"k$i",
          Map("bmp" -> bmpPayload(imageOf(i)),
            "txt" -> s"caption $i".getBytes("UTF-8"))))
        .toDF("shard", "key", "parts")
      graft.sources.TarWriter.writeSamples(df, inbox, prefix = name)
      ()
    }
    // wave 1: the corpus
    shard("w1", Seq(10L, 11L, 12L), identity)
    val q = StreamIngest.tarIngestStream(spark, inbox, samplesP, ckpt,
      daemon = true)
    q.processAllAvailable()
    def imagesOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), element_at(col("parts"), "bmp").as("payload"))
    // the corpus-side artifact: hash index over everything ingested so far
    val index = graft.ops.Multimodal.mediaHashIndex(
      imagesOf(StreamIngest.tarSamplesView(spark, samplesP)), "key",
      graft.ops.Multimodal.imageDHash(col("payload")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("id", "dh")
    // wave 2 lands: one fresh image, one exact copy of corpus image 11
    shard("w2", Seq(20L, 21L), i => if (i == 21L) 11L else i)
    q.processAllAvailable()
    q.stop()
    val newKeys = Set("k20", "k21")
    val wave2 = imagesOf(StreamIngest.tarSamplesView(spark, samplesP))
      .where(col("key").isin(newKeys.toSeq: _*))
    val flagged = graft.ops.Multimodal.mediaNearDupAgainst(wave2, "key",
        graft.ops.Multimodal.imageDHash(col("payload")), index)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the copy names its corpus original at hamming 0
    assert(flagged.contains(("k21", "k11", 0L)))
    // flags are never spurious: every hamming-0 flag is a genuine hash
    // equality between the new sample and the named corpus member (the
    // gradient synth DOES produce natural collisions — those are real
    // near-dups at the hash's resolution, not false positives)
    val hashes = (graft.ops.Multimodal.mediaHashIndex(
        imagesOf(StreamIngest.tarSamplesView(spark, samplesP)), "key",
        graft.ops.Multimodal.imageDHash(col("payload")))
      .collect().map(r => r.getString(0) -> r.getLong(1))).toMap
    flagged.filter(_._3 == 0L).foreach { case (a, b, _) =>
      assert(hashes(a) == hashes(b), s"spurious hamming-0 flag ($a, $b)") }
  }

  test("crawl → curation composition: segments stream into a curated store") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("graft-crawlcurate")
    val crawl = root.resolve("crawl").toString
    val docsP = root.resolve("docs").toString
    val store = root.resolve("corpus").toString
    val lshIx = root.resolve("lshindex").toString
    val ck1 = root.resolve("ck1").toString
    val ck2 = root.resolve("ck2").toString
    new java.io.File(crawl).mkdirs()
    val leaked = "the benchmark question asks what is the capital of france exactly"
    val benchmark = Seq((900L, leaked)).toDF("doc_id", "text")
    def page(i: Long, text: String) = (s"https://ex.com/c/$i",
      s"<html><title>c$i</title><body><p>$text</p></body></html>")
    def writeSegment(rows: Seq[(String, String)]): Unit = {
      graft.sources.WarcWriter.write(rows.toDF("url", "payload").repartition(1), crawl)
      ()
    }
    def base(i: Long) =
      s"ordinary training document number $i with plenty of informative words"

    // wave 1: 10 good pages + a junk page + a benchmark-contaminated page
    writeSegment((0L until 10L).map(i => page(i, base(i))) ++
      Seq(page(90L, "!!! ??? !!!"), page(91L, leaked)))
    // stage 1: crawl dir → extracted docs store
    val ingest = StreamIngest.warcIngestStream(spark, crawl, docsP, ck1,
      daemon = true)
    ingest.processAllAvailable()
    // stage 2: docs store (as a file stream) → curated corpus, composing
    // the near-dup gate on top — the two stages share no code, only the
    // parquet contract
    val sch = spark.read.parquet(docsP).schema
    val docsStream = spark.readStream.schema(sch).parquet(docsP)
      .select(to_timestamp(col("date")).as("ts"),
        graft.ops.Dedup.hash60(col("curl")).as("doc_id"), col("text"))
    val curate = StreamIngest.curateToStore(docsStream, "ts", "doc_id",
      "text", benchmark, store, ck2, daemon = true,
      nearDupIndexPath = Some(lshIx))
    curate.processAllAvailable()
    assert(spark.read.parquet(store).count() == 10) // junk + leak dropped

    // wave 2: 3 novel pages + a near-duplicate of page 3's text
    writeSegment(Seq(page(100L, base(100L)), page(101L, base(101L)),
      page(102L, base(102L)),
      page(103L, base(3L) + " tail")))
    ingest.processAllAvailable()
    curate.processAllAvailable()
    ingest.stop(); curate.stop()

    val texts = spark.read.parquet(store).select(col("text")).collect()
      .map(_.getString(0)).toSet
    assert(texts.size == 13, s"got ${texts.size}") // 10 + 3 novel; near-dup dropped
    assert(!texts.exists(_.endsWith(" tail")))
    // extracted text carries the <title> prefix — part of the HTML rules
    assert(texts.contains(s"c100 ${base(100L)}") &&
      texts.contains(s"c3 ${base(3L)}"))
  }

  test("streaming quantile sketch: bottom-s partials equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-qskstream")
    val idx = root.resolve("sample").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, Long, Double)]
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("id"),
      col("_3").as("v"))
    val query = StreamIngest.qsampleStream(rows, "g", "id", "v", s = 64,
      idx, ckpt, daemon = true)

    mem.addData((1L to 500L).map(i => ("a", i, i.toDouble)): _*)
    query.processAllAvailable()
    mem.addData((501L to 1000L).map(i => ("a", i, i.toDouble))
      ++ Seq(("b", 1L, 10.0), ("b", 2L, 20.0)): _*)
    query.processAllAvailable()
    query.stop()

    val qs = Seq(0.5, 0.9)
    val streamed = StreamIngest.qsampleQuantileView(spark, idx, s = 64, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val batch = graft.ops.Sketches.qsampleQuantile(
      ((1L to 1000L).map(i => ("a", i, i.toDouble))
        ++ Seq(("b", 1L, 10.0), ("b", 2L, 20.0))).toDF("g", "id", "v"),
      col("g"), col("id"), col("v"), s = 64, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // the s smallest hashes of the union are among the union of each
    // batch's s smallest → the re-taken view IS the batch sketch
    assert(streamed == batch)
    assert(streamed(("b", 0.5)) == 10.0) // n <= s → exact type-1 quantile
  }

  test("streaming histogram: summed bin partials equal the batch quantiles") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-histstream")
    val idx = root.resolve("bins").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(String, Double)]
    val rows = mem.toDF().select(col("_1").as("g"), col("_2").as("v"))
    val query = StreamIngest.histCountStream(rows, "g", "v",
      lo = 0.0, hi = 1024.0, nBins = 128, idx, ckpt, daemon = true)

    val b1 = (1 to 500).map(i => ("a", i.toDouble))
    val b2 = (501 to 1000).map(i => ("a", i.toDouble))
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    val qs = Seq(0.5, 0.9, 0.99)
    val streamed = StreamIngest.histQuantileView(spark, idx,
        0.0, 1024.0, 128, qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val batch = graft.ops.Sketches.histQuantiles(
      (b1 ++ b2).toDF("g", "v"), col("g"), col("v"), 0.0, 1024.0, 128, qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // bin counts add across batches into exactly the union's histogram
    assert(streamed == batch)
    assert(math.abs(streamed(0.5) - 500.0) <= 8.0) // one-bin error bound
  }

  test("streaming DSIR pool model: accumulated counts give batch-identical weights") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-dsirstream")
    val idx = root.resolve("counts").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val query = StreamIngest.dsirCountStream(docs, "text", buckets = 512,
      idx, ckpt, daemon = true)

    val b1 = Seq(1L -> "solar wind power grid", 2L -> "cat dog bird fish")
    val b2 = Seq(3L -> "wind turbine solar energy", 4L -> "pizza pasta soup")
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    val pool = (b1 ++ b2).toDF("doc_id", "text")
    // the accumulated store equals the batch fit on the union
    val streamed = StreamIngest.dsirPoolCounts(spark, idx)
    val batchFit = graft.ops.Dsir.bucketCounts(pool, "text", 512)
    assert(streamed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchFit.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // replayed batch rewrites its directory — counts do NOT double
    // (refresh mirrors what dsirCountStream does after each batch write)
    graft.ops.Dsir.bucketCounts(b1.toDF("doc_id", "text"), "text", 512)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$idx/batch=0")
    spark.catalog.refreshByPath(idx)
    val replayed = StreamIngest.dsirPoolCounts(spark, idx)
    assert(replayed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchFit.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    // scoring against the streamed pool model equals the batch path
    val target = Seq(10L -> "solar wind turbine grid power",
      11L -> "wind power grid solar energy").toDF("doc_id", "text")
    val viaStream = graft.ops.Dsir.weightsAgainst(pool, "doc_id", "text",
        graft.ops.Dsir.bucketCounts(target, "text", 512), replayed,
        buckets = 512, alpha = 1.0)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("logw"))).toMap
    val direct = graft.ops.Dsir.importanceWeights(pool, target,
        "doc_id", "text", buckets = 512, alpha = 1.0)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Double]("logw"))).toMap
    assert(viaStream == direct)

    // generic monoid compaction: fold the sum store to batch=-1; the
    // view is unchanged, the store is one partition + marker, and a
    // batch replayed AFTER folding is inert (not double-counted)
    def counts() = StreamIngest.dsirPoolCounts(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = counts()
    StreamIngest.compactMonoidStore(spark, idx, targetFiles = 1)(
      _.groupBy("b").agg(sum(col("c")).as("c")))
    assert(counts() == before)
    assert(StreamIngest.compactedThrough(idx) == 1L)
    graft.ops.Dsir.bucketCounts(b2.toDF("doc_id", "text"), "text", 512)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$idx/batch=1")
    spark.catalog.refreshByPath(idx)
    assert(counts() == before, "stale replayed partials must be ignored")
  }

  test("streaming count-min: summed counter partials equal the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-cmstream")
    val idx = root.resolve("counters").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[String]
    val rows = mem.toDF().select(col("value").as("k"))
    val query = StreamIngest.cmCounterStream(rows, "k", depth = 4, width = 64,
      idx, ckpt, daemon = true)

    mem.addData(Seq.fill(60)("a") ++ Seq.fill(4)("b"): _*)
    query.processAllAvailable()
    mem.addData(Seq.fill(40)("a") ++ Seq.fill(6)("b") ++ Seq("c"): _*)
    query.processAllAvailable()
    query.stop()

    val probes = Seq("a", "b", "c").toDF("key")
    val streamed = StreamIngest.cmFrequencyView(spark, idx, probes, 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // counters sum across batches into exactly the union's sketch; at
    // this key/width ratio there are no collisions, so counts are exact
    assert(streamed == Map("a" -> 100L, "b" -> 10L, "c" -> 1L))
  }

  test("streaming bloom: OR-merged bit partials equal the batch filter") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-bloomstream")
    val idx = root.resolve("bits").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[String]
    val rows = mem.toDF().select(col("value").as("k"))
    val query = StreamIngest.bloomBitsStream(rows, "k", widthBits = 8192,
      numHashes = 5, idx, ckpt, daemon = true)

    val b1 = (1L to 100L).map(i => s"doc-$i")
    val b2 = (101L to 200L).map(i => s"doc-$i")
    mem.addData(b1: _*)
    query.processAllAvailable()
    mem.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    val probes = (Seq("doc-5", "doc-150", "absent")).toDF("key")
    val streamed = StreamIngest.bloomContainsView(spark, idx, probes, 8192, 5)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val batch = graft.ops.Sketches.bloomMembership(
      (b1 ++ b2).toDF("k"), col("k"), probes, 8192, 5)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(streamed == batch)
    // members from BOTH batches are present; the absentee is not
    assert(streamed("doc-5") && streamed("doc-150") && !streamed("absent"))
  }

  test("curateToStore: dedup, quality floor and decontamination end in the corpus") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-curatestore")
    val store = root.resolve("corpus").toString
    val ckpt = root.resolve("ckpt").toString
    val leaked = "the benchmark question asks what is the capital of france exactly"
    val benchmark = Seq((900L, leaked)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Long, String)] // (t ms, doc_id, text)
    val docsStream = mem.toDF().select(timestamp_millis(col("_1")).as("ts"),
      col("_2").as("doc_id"), col("_3").as("text"))
    val query = StreamIngest.curateToStore(docsStream, "ts", "doc_id", "text",
      benchmark, store, ckpt, daemon = true)

    val t0 = 1700000000000L
    val good = "a perfectly ordinary training document with many useful words inside"
    mem.addData((t0, 1L, good), (t0 + 1000L, 2L, good), // duplicate of 1
      (t0 + 2000L, 3L, "!!! ??? !!!"))                  // quality floor
    query.processAllAvailable()
    // batch 2: a benchmark-contaminated doc + a clean one
    mem.addData((t0 + 60000L, 4L, leaked), (t0 + 61000L, 5L,
      "another clean document about cooking pasta with fresh tomatoes"))
    query.processAllAvailable()
    query.stop()

    val out = spark.read.parquet(store).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    // 1 survives (first copy), 2 deduped, 3 below quality floor,
    // 4 decontaminated (verbatim benchmark hit), 5 clean
    assert(out == Seq(1L, 5L))
  }

  test("curateToStore near-dup gate: later batches drop near-dups of admitted docs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-curatelsh")
    val store = root.resolve("corpus").toString
    val lshIx = root.resolve("lshindex").toString
    val ckpt = root.resolve("ckpt").toString
    val benchmark = Seq((900L, "completely unrelated benchmark text payload"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, Long, String)]
    val docsStream = mem.toDF().select(timestamp_millis(col("_1")).as("ts"),
      col("_2").as("doc_id"), col("_3").as("text"))
    val query = StreamIngest.curateToStore(docsStream, "ts", "doc_id", "text",
      benchmark, store, ckpt, daemon = true,
      nearDupIndexPath = Some(lshIx), nearDupThreshold = 0.5)

    val t0 = 1700000000000L
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    mem.addData((t0, 1L, base))
    query.processAllAvailable()
    // batch 2: a NEAR-dup of doc 1 (one token changed — not an exact
    // dup, so the watermark dedup cannot catch it) + a fresh doc
    mem.addData(
      (t0 + 60000L, 2L, base.replace("omicron", "psi")),
      (t0 + 61000L, 3L, "a totally different document about growing basil " +
        "indoors with plenty of light and patience every single day"))
    query.processAllAvailable()
    query.stop()

    val out = spark.read.parquet(store).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L), s"got $out")
    // the index holds exactly the admitted docs' signatures
    val ix = spark.read.parquet(lshIx).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ix == Seq(1L, 3L), s"index $ix")
  }

  test("curateStreamGated: cross-batch near-dup flagged against the growing index") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-curategate")
    val lshIx = root.resolve("lshindex").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, Long, String)] // (t ms, doc_id, text)
    val docsStream = mem.toDF().select(timestamp_millis(col("_1")).as("ts"),
      col("_2").as("doc_id"), col("_3").as("text"))
    // the pipeline's own sink: collect (doc_id, near_dup_of) per batch —
    // flagged rows are DELIVERED (the sink routes rejects), not dropped
    val got = scala.collection.mutable.ArrayBuffer[(Long, Option[Long])]()
    val query = StreamIngest.curateStreamGated(docsStream, "ts", "doc_id",
      "text", lshIx, ckpt, minQuality = 0.0, nearDupThreshold = 0.5,
      daemon = true) { (batch, _) =>
      got ++= batch.select("doc_id", "near_dup_of").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      ()
    }

    val t0 = 1700000000000L
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    mem.addData((t0, 1L, base), (t0 + 1000L, 2L,
      "a totally different document about growing basil indoors with " +
        "plenty of light and patience every single day"))
    query.processAllAvailable()
    // batch 2: a NEAR-dup of doc 1 (one token changed — not an exact dup,
    // so the watermark dedup upstream cannot catch it) + a fresh doc
    mem.addData(
      (t0 + 60000L, 3L, base.replace("omicron", "psi")),
      (t0 + 61000L, 4L, "meanwhile an unrelated essay on tending a sour" +
        "dough starter through a cold winter week by week"))
    query.processAllAvailable()
    query.stop()

    val flags = got.toMap
    assert(flags.keySet == Set(1L, 2L, 3L, 4L), s"got $flags")
    assert(flags(1L).isEmpty && flags(2L).isEmpty && flags(4L).isEmpty)
    assert(flags(3L) == Some(1L),
      "cross-batch near-duplicate must be flagged with the indexed doc id")
    // only NOVEL docs' signatures joined the index
    val ix = spark.read.parquet(lshIx).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ix == Seq(1L, 2L, 4L), s"index $ix")
  }

  test("streaming curation: dedup + quality floor + langid in one stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (t ms, text)
    val s = mem.toDF()
      .select(timestamp_millis(col("_1")).as("ts"), col("_2").as("text"))
    val cur = StreamIngest.curateStream(s, "ts", "text", "10 minutes",
      minQuality = 0.2)
    val query = cur.writeStream.format("memory").queryName("streamcurate")
      .outputMode("append").start()
    val t0 = 1700000000000L
    val good = "the quick brown fox jumps over the lazy dog again and again"
    // duplicate good doc + an all-punctuation doc (quality 0 → dropped)
    mem.addData((t0, good), (t0 + 1000L, good), (t0 + 2000L, "!!! ??? !!!"))
    query.processAllAvailable()
    val rows = spark.table("streamcurate").collect()
    query.stop()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("text") == good)
    assert(r.getAs[String]("lang_pred") == "en")
    assert(r.getAs[Long]("n_tokens_est") >= 12L)
    assert(r.getAs[Double]("quality") >= 0.2)
  }

  test("validated stream: passing batches land, failing batches quarantine with report") {
    import spark.implicits._
    import graft.ops.Checks
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-vstream")
    val store = root.resolve("store").toString
    val quarantine = root.resolve("bad").toString
    val ckpt = root.resolve("ckpt").toString
    val mem = MemoryStream[(Long, java.lang.Double, String)]
    val s = mem.toDF().select(col("_1").as("id"), col("_2").as("v"),
      col("_3").as("cat"))
    val suite = Seq(Checks.completeness("v"), Checks.inRange("v", 0, 100))
    val uniq = Seq(Checks.UniqueCheck(Seq("id")))

    // batch 0: clean — admitted
    mem.addData((1L, 10.0, "a"), (2L, 20.0, "b"))
    StreamIngest.validatedStream(s, suite, uniq, store, quarantine, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(store).count() == 2)

    // batch 1: a null v AND a duplicate id — quarantined whole
    mem.addData((3L, 30.0, "a"), (3L, null, "c"))
    StreamIngest.validatedStream(s, suite, uniq, store, quarantine, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(store).count() == 2, "bad batch must not land")
    assert(spark.read.parquet(quarantine).count() == 2)
    val rep = spark.read.parquet(s"${quarantine}_reports")
      .where(!col("pass")).collect()
    assert(rep.map(_.getAs[String]("check")).toSet ==
      Set("completeness", "in_range", "unique"),
      "report must name the failing constraints (null v fails range too)")

    // batch 2: clean again — the gate reopens
    mem.addData((4L, java.lang.Double.valueOf(40.0), "d"))
    StreamIngest.validatedStream(s, suite, uniq, store, quarantine, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(store).count() == 3)
    assert(spark.read.parquet(quarantine).count() == 2)
  }

  test("drift monitor stream: stable batch quiet, shifted batch alerts") {
    import spark.implicits._
    import graft.ops.Drift
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-driftstream")
    val refPath = root.resolve("ref").toString
    val monitor = root.resolve("monitor").toString
    val ckpt = root.resolve("ckpt").toString
    // blessed mix: 2/3 "web", 1/3 "books"
    val blessed = (Seq.fill(40)("web") ++ Seq.fill(20)("books")).toDF("src")
    Drift.categoryCounts(blessed, col("src")).write.parquet(refPath)

    val mem = MemoryStream[String]
    val s = mem.toDF().select(col("value").as("src"))
    // batch 0: the same mix — quiet
    mem.addData(Seq.fill(20)("web") ++ Seq.fill(10)("books"): _*)
    StreamIngest.driftMonitorStream(s, "src", refPath, monitor, ckpt,
      psiAlert = 0.25).awaitTermination()
    // batch 1: all one novel source — loud
    mem.addData(Seq.fill(30)("spam"): _*)
    StreamIngest.driftMonitorStream(s, "src", refPath, monitor, ckpt,
      psiAlert = 0.25).awaitTermination()

    val rows = spark.read.parquet(monitor).orderBy("batch").collect()
    assert(rows.length == 2)
    assert(!rows(0).getAs[Boolean]("alert") &&
      rows(0).getAs[Double]("psi") < 0.05, s"stable batch: ${rows(0)}")
    assert(rows(1).getAs[Boolean]("alert") &&
      rows(1).getAs[Double]("psi") > 1.0, s"shifted batch: ${rows(1)}")
    // per-batch verdicts equal the batch operator on the same pair
    val direct = Drift.summaryFromCounts(
      spark.read.parquet(refPath),
      Drift.categoryCounts(Seq.fill(30)("spam").toDF("src"), col("src")))
      .head()
    assert(rows(1).getAs[Double]("psi") == direct.getAs[Double]("psi"))
  }

  test("classifier-gated stream: persisted model admits pos-vocab, rejects carry scores") {
    import spark.implicits._
    import graft.ops.Classifier
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft-cstream")
    val modelDir = root.resolve("model").toString
    val store = root.resolve("store").toString
    val rejects = root.resolve("rejects").toString
    val ckpt = root.resolve("ckpt").toString
    // train offline on disjoint vocabularies, persist the artifact
    val pos = (0L until 30L).map(i => (i, s"alpha beta gamma delta run$i"))
      .toDF("doc_id", "text")
    val neg = (100L until 130L).map(i => (i, s"omega sigma tau rho run$i"))
      .toDF("doc_id", "text")
    Classifier.trainNb(pos, neg, "text").save(modelDir)

    val mem = MemoryStream[(Long, String)]
    val s = mem.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    mem.addData((1L, "alpha beta gamma keep me"), (2L, "omega sigma tau drop me"),
      (3L, "beta delta alpha gamma alpha"))
    StreamIngest.classifierGatedStream(s, "doc_id", "text", modelDir,
      minP = 0.5, store, rejects, ckpt).awaitTermination()
    val kept = spark.read.parquet(store).collect()
    assert(kept.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 3L))
    // admitted rows carry their scores; rejects are delivered with theirs
    assert(kept.forall(_.getAs[Double]("p_pos") >= 0.5))
    val rej = spark.read.parquet(rejects).collect()
    assert(rej.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
    assert(rej.head.getAs[Double]("p_pos") < 0.5 &&
      !rej.head.getAs[Double]("logodds").isNaN)
  }
}
