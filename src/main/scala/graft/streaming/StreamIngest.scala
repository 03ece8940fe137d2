package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.tsdb.TsSchema

/** Structured-Streaming equivalents of the reference's continuous pieces
  * (SURVEY.md §3.2-§3.3) plus beyond-reference streaming aggregation.
  *
  * The reference's shipper is a file-watcher micro-stream (fsnotify + 5s
  * tick, `shipper.go:189-249`) and its server polls for new blocks every
  * minute (`db.go:58-122`). In Spark both collapse into a file-source
  * stream: new files are discovered by the source, exactly-once ingest
  * comes from the checkpoint (replacing the shipper's shipped-ULID
  * dedup), and readers see atomic appends — no custom sync loop.
  *
  * Scale notes: the ingest stream is pure map-side work (no shuffle —
  * canonicalize + partitioned append); windowed aggregation shuffles on
  * (window, series) with watermark-bounded state.
  */
object StreamIngest {

  /** Long-form input schema expected from upstream writers. */
  val inputSchema: StructType = StructType.fromDDL(
    "labels map<string,string>, t long, v double")

  /** Continuous ingest: watch `inputDir` for long-form parquet files,
    * canonicalize, append into the partitioned store. Trigger
    * AvailableNow = the batch-shipper mode (process everything pending,
    * then stop); ProcessingTime = the daemon mode. */
  def ingestStream(spark: SparkSession, inputDir: String, storePath: String,
                   checkpoint: String,
                   promoted: Seq[String] = TsSchema.DefaultPromoted,
                   daemon: Boolean = false): StreamingQuery = {
    val in = spark.readStream.schema(inputSchema).parquet(inputDir)
    val canonical = TsSchema.canonicalize(in, promoted)
    // foreachBatch + plain partitioned append, NOT the parquet sink: the
    // sink's _spark_metadata log would become the store's source of truth
    // and any external rewrite (compaction, retention) breaks reads. The
    // store stays an ordinary parquet table; the source checkpoint still
    // prevents re-reading input files, leaving the same
    // at-least-once-on-crash window as the reference shipper's
    // marker-after-upload (shipper.go:252-325).
    val w: DataStreamWriter[org.apache.spark.sql.Row] = canonical.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.partitionBy("block_start")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Continuous ingest from the Prometheus TEXT EXPOSITION format:
    * watch `inputDir` for scrape/federate text files, parse each line
    * with the codegen'd [[graft.tsdb.Exposition]] expression
    * (comment/malformed lines dropped, timestamp-less samples stamped
    * `defaultTsMs`), canonicalize, append — the same
    * at-least-once-on-crash contract as [[ingestStream]]. */
  def expositionIngestStream(spark: SparkSession, inputDir: String,
                             storePath: String, checkpoint: String,
                             defaultTsMs: Long,
                             promoted: Seq[String] = TsSchema.DefaultPromoted,
                             daemon: Boolean = false): StreamingQuery = {
    val in = spark.readStream.text(inputDir)
    val longForm = graft.tsdb.Exposition.parse(in, col("value"), lit(defaultTsMs))
    val canonical = TsSchema.canonicalize(longForm, promoted)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = canonical.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.partitionBy("block_start")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Streaming ANN index maintenance: watch `inputDir` for new
    * embedding parquet, assign each micro-batch against the index's
    * FROZEN centroids and append into the stored cell-partitioned IVF
    * layout ([[graft.ops.Similarity.ivfAppendStored]] — the FAISS
    * add-after-train contract). Serving reads (`ivfTopKStored`) see new
    * vectors at micro-batch granularity with the same static-partition
    * probe pruning; the at-least-once-on-crash window matches
    * [[ingestStream]] (a replayed batch re-appends; dedup by id is the
    * reader's keep-first if it cares). */
  def ivfIndexStream(spark: SparkSession, inputDir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     indexDir: String, checkpoint: String,
                     idCol: String, vecCol: String,
                     centroids: DataFrame,
                     daemon: Boolean = false): StreamingQuery = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = in.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.Similarity.ivfAppendStored(batch, indexDir,
          idCol, vecCol, centroids, "cell", "centv")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** The full shipper lifecycle as ONE checkpointed stream: each
    * micro-batch appends to the partitioned store, then ships every 2h
    * window that closed — `beforeMs` = (max event time seen so far) −
    * `lagMs`, so a window ships once the stream has moved `lagMs` past
    * its end (the streaming analog of the reference's "block is
    * finished" detection, `shipper.go:189-249`; late data inside the lag
    * stays shippable). Marker idempotency makes crash-replays safe: a
    * re-run batch re-appends (at-least-once, same as [[ingestStream]])
    * and re-shipping an already-marked window is a no-op. */
  def ingestAndShipStream(spark: SparkSession, inputDir: String, storePath: String,
                          blocksDir: String, checkpoint: String,
                          lagMs: Long = 10 * 60 * 1000L,
                          promoted: Seq[String] = TsSchema.DefaultPromoted,
                          daemon: Boolean = false): StreamingQuery = {
    val in = spark.readStream.schema(inputSchema).parquet(inputDir)
    val canonical = TsSchema.canonicalize(in, promoted)
    val maxSeen = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = canonical.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist()
        batch.write.partitionBy("block_start")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
        val mx = batch.agg(max(col("t"))).head()
        if (!mx.isNullAt(0)) maxSeen.getAndAccumulate(mx.getLong(0), math.max)
        batch.unpersist()
        if (maxSeen.get() != Long.MinValue)
          graft.tsdb.BlockShipper.shipClosed(batch.sparkSession, storePath,
            blocksDir, maxSeen.get() - lagMs)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Continuous rule evaluation: after each ingest batch, materialize
    * recording rules and alert rules over the grid steps that have
    * CLOSED (step ≤ max ingested t − lag) — the streaming analog of
    * the upstream rule manager's interval ticks, with backfill as the
    * same code path.
    *
    * A per-rule high-water marker under `<store>/_rules/<name>` (an
    * underscore dir, invisible to partition discovery) makes each
    * batch evaluate ONLY the new steps and makes restarts safe: a
    * replayed batch re-evaluates from the marker, and rule output for
    * an already-marked step is never recomputed. Alert firings append
    * as ALERTS-style series named by the alert (value = the condition
    * value at the firing step). Rule expressions must not select their
    * own output metric (no feedback).
    *
    * `rules` = (name, expr); `alerts` = (name, expr, forMs). */
  def rulesStream(spark: SparkSession, inputDir: String, storePath: String,
                  checkpoint: String, startMs: Long, stepMs: Long,
                  rules: Seq[(String, String)] = Seq.empty,
                  alerts: Seq[(String, String, Long)] = Seq.empty,
                  lagMs: Long = 10 * 60 * 1000L,
                  promoted: Seq[String] = TsSchema.DefaultPromoted,
                  daemon: Boolean = false,
                  ruleLabels: Map[String, Seq[(String, String)]] = Map.empty)
      : StreamingQuery = {
    import java.nio.file.{Files, Paths}
    val rulesDir = Paths.get(storePath, "_rules")
    def markerOf(name: String): Long = {
      val p = rulesDir.resolve(name)
      if (Files.exists(p)) Files.readString(p).trim.toLong
      else startMs - stepMs
    }
    def setMarker(name: String, t: Long): Unit = {
      Files.createDirectories(rulesDir)
      Files.writeString(rulesDir.resolve(name), t.toString)
    }
    val in = spark.readStream.schema(inputSchema).parquet(inputDir)
    val canonical = TsSchema.canonicalize(in, promoted)
    val maxSeen = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = canonical.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist()
        batch.write.partitionBy("block_start")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
        val mx = batch.agg(max(col("t"))).head()
        batch.unpersist()
        if (!mx.isNullAt(0)) maxSeen.getAndAccumulate(mx.getLong(0), math.max)
        val horizon = maxSeen.get() - lagMs
        if (maxSeen.get() != Long.MinValue && horizon >= startMs) {
          // newest grid step that has fully closed
          val closed = startMs + ((horizon - startMs) / stepMs) * stepMs
          val s2 = batch.sparkSession
          rules.foreach { case (name, expr) =>
            val from = markerOf(name) + stepMs
            if (from <= closed) {
              graft.promql.RecordingRules.record(
                graft.tsdb.TsStore.read(s2, storePath, promoted), storePath,
                name, expr, from, closed, stepMs, promoted,
                extraLabels = ruleLabels.getOrElse(name, Nil))
              setMarker(name, closed)
            }
          }
          alerts.foreach { case (name, expr, forMs) =>
            val from = markerOf(name) + stepMs
            if (from <= closed) {
              val firing = graft.promql.AlertRules.firing(
                graft.tsdb.TsStore.read(s2, storePath, promoted),
                expr, from, closed, stepMs, forMs)
              // rule-file `labels:` override result labels of the same
              // name (upstream alert semantics), then the alert name
              val extra = ruleLabels.getOrElse(name, Nil)
              val dropped = extra.map(_._1).toSet + graft.tsdb.Labels.MetricName
              val attach = array((
                (graft.tsdb.Labels.MetricName -> name) +: extra).map {
                  case (k, v) => struct(lit(k).as("name"), lit(v).as("value"))
                }: _*)
              val renamed = firing.select(
                map_from_entries(concat(
                  filter(col("labels"),
                    e => !e.getField("name").isin(dropped.toSeq: _*)),
                  attach)).as("labels"),
                col("t"), col("v"))
              TsSchema.canonicalize(renamed, promoted)
                .write.partitionBy("block_start")
                .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
              setMarker(name, closed)
            }
          }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Continuous downsampling: each micro-batch appends to the raw store,
    * then materializes every downsample resolution whose windows have
    * closed (newest event time − `lagMs` past the window end). The
    * marker inside each `_downsample/res=<r>` dir keeps replays
    * incremental — an already-materialized window is never recomputed,
    * the same contract as [[rulesStream]]'s rule markers. Query-time
    * resolution choice then reads the coarsest materialized form
    * ([[graft.tsdb.TsDownsample.pick]]). */
  def downsampleStream(spark: SparkSession, inputDir: String, storePath: String,
                       checkpoint: String,
                       resolutions: Seq[Long] = graft.tsdb.TsDownsample.Ladder,
                       lagMs: Long = 10 * 60 * 1000L,
                       promoted: Seq[String] = TsSchema.DefaultPromoted,
                       daemon: Boolean = false): StreamingQuery = {
    val in = spark.readStream.schema(inputSchema).parquet(inputDir)
    val canonical = TsSchema.canonicalize(in, promoted)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = canonical.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.partitionBy("block_start")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(storePath)
        resolutions.foreach { res =>
          graft.tsdb.TsDownsample.materialize(
            batch.sparkSession, storePath, res, lagMs)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Beyond-reference: watermarked tumbling-window aggregation per metric
    * name — the PromQL `sum/count by (__name__)` shape as a stream.
    * Late data beyond `watermark` is dropped; state is bounded. */
  def windowedAgg(longForm: DataFrame, windowDur: String = "1 minute",
                  watermark: String = "2 minutes"): DataFrame =
    longForm
      .withColumn("ts", timestamp_millis(col("t")))
      .withColumn("name", coalesce(element_at(col("labels"), graft.tsdb.Labels.MetricName), lit("")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("name"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .select(col("w.start").as("window_start"), col("name"),
        col("n"), col("sum_v"), col("min_v"), col("max_v"))

  /** Per-series state carried between micro-batches by [[streamingRate]]:
    * the last seen sample. */
  final case class RateState(lastT: Long, lastV: Double)

  /** One emitted rate point. */
  final case class RatePoint(fingerprint: Long, t: Long, increase: Double,
                             rate: Double)

  /** Beyond-reference: continuous counter rate per series — the streaming
    * form of PromOps.rate (same Prometheus reset semantics), implemented
    * with flatMapGroupsWithState: state = the last (t, v) seen per
    * fingerprint, carried across micro-batches, so a sample's rate is
    * computed against its true predecessor even when the two arrive in
    * different batches. State is dropped after `stateTtlMs` of event time
    * (EventTimeTimeout + watermark on the input keeps it bounded — a
    * series that stops reporting costs nothing forever after). */
  def streamingRate(longForm: DataFrame, watermark: String = "10 minutes",
                    stateTtlMs: Long = 60 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = longForm.sparkSession
    import spark.implicits._
    val keyed = longForm
      .withColumn("fingerprint", TsSchema.fingerprintCol(
        array_sort(filter(map_entries(col("labels")), e => e.getField("value") =!= lit("")))
          .cast("array<struct<name:string,value:string>>")))
      .withColumn("ts", timestamp_millis(col("t")))
      .withWatermark("ts", watermark)
      // the watermarked `ts` column must survive projection for the
      // stateful operator's event-time timeout to resolve
      .select(col("fingerprint").as[Long], col("t").as[Long],
        col("v").as[Double], col("ts").as[java.sql.Timestamp])
      .as[(Long, Long, Double, java.sql.Timestamp)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[RateState, RatePoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (fp, rows, state: GroupState[RateState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove(); Iterator.empty
          } else {
            // within-batch samples processed in time order; predecessor
            // carried in from the previous batch via state
            val sorted = rows.toSeq.sortBy(_._2)
            var last = state.getOption
            val out = sorted.iterator.flatMap { case (_, t, v, _) =>
              val point = last.collect {
                case RateState(pt, pv) if t > pt =>
                  val inc = if (v >= pv) v - pv else v // reset: post-reset value
                  RatePoint(fp, t, inc, inc / ((t - pt) / 1000.0d))
              }
              // advance ONLY on strictly newer samples: a late sample
              // (t <= lastT, allowed inside the watermark) emits nothing
              // and must not regress the stored predecessor — otherwise
              // the next in-order sample recomputes increase against the
              // older point and double-counts
              if (last.forall(t > _.lastT)) last = Some(RateState(t, v))
              point
            }.toVector
            last.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastT + stateTtlMs)
            }
            out.iterator
          }
      }.toDF()
  }

  /** Beyond-reference: session windows per series (gap-based sessions over
    * sample arrival times) — the stateful-window shape training pipelines
    * use for sessionization. */
  def sessionAgg(longForm: DataFrame, gap: String = "5 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    longForm
      .withColumn("ts", timestamp_millis(col("t")))
      .withColumn("name", coalesce(element_at(col("labels"), graft.tsdb.Labels.MetricName), lit("")))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("name"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("name"), col("n"))

  /** Beyond-reference: streaming exact dedup for a continuously-arriving
    * document stream — the streaming form of the batch `Dedup.exact`
    * digest key. First occurrence wins (emitted in append mode);
    * duplicates arriving within the watermark horizon are suppressed;
    * `dropDuplicatesWithinWatermark` drops a digest's state once the
    * watermark passes it, so state stays bounded by the horizon's
    * arrival rate, not by corpus size — the property that lets this run
    * forever against a firehose. */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Beyond-reference: streaming duplicated-span index — the incremental
    * form of [[graft.ops.Dedup.spanIndex]] (Lee et al. exact-substring
    * dedup). Each micro-batch appends PARTIAL per-span aggregates
    * (16-byte span digest, batch doc count, batch min doc) to a parquet
    * index store: O(batch) work per trigger — the corpus-wide tail is
    * never recomputed. Merging is possible because the span index is a
    * (sum, min) monoid over digests, the same property that makes the
    * batch aggregation map-side combinable.
    *
    * The store is LSM-shaped: [[spanIndexView]] is the read-side merge of
    * the partials, [[compactSpanIndex]] collapses them back to one row
    * per digest (run it on the maintenance cadence, like block
    * compaction). Singleton spans ARE retained in the store — a span
    * unique today becomes duplicated when a later batch re-emits it, so
    * dropping singletons would break exactly the cross-batch detection
    * this stream exists for. Span TEXT never leaves the map side: the
    * store holds digests only.
    *
    * EXACTLY-once under crash replay: each micro-batch OVERWRITES its
    * own `batch=<id>` partition directory — the canonical (batchId,
    * idempotent-write) foreachBatch contract — so a replayed batch
    * clobbers its previous partials instead of double-counting them
    * (a plain append would silently inflate every replayed span's doc
    * frequency). Consequence: an index store is owned by ONE checkpoint;
    * starting a fresh checkpoint against an existing store would reuse
    * batch ids ([[compactSpanIndex]] first — compacted rows live in
    * `batch=-1`, which no live stream ever writes). */
  def spanIndexStream(docs: DataFrame, idCol: String, textCol: String,
                      spanTokens: Int, indexPath: String,
                      checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch
          .select(col(idCol).as("doc_id"),
            explode(graft.functions.shingles(col(textCol), spanTokens)).as("span"))
          // per-doc spans are distinct → count(1) ≡ document frequency
          .groupBy(md5(col("span")).as("span_digest"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Marker file recording the highest batch id folded into `batch=-1`
    * by [[compactSpanIndex]]. Readers ignore any `batch=<id>` dir with
    * id ≤ the marker: a micro-batch REPLAYED after compaction (crash
    * between the foreachBatch parquet write and the checkpoint commit,
    * or a compaction run while the query was live) re-creates its
    * batch dir, and without the marker its sum-monoid counts would land
    * ON TOP of the already-folded rows — double counting that breaks
    * the exactly-once contract. */
  private val CompactedThroughMarker = "_compacted_through"

  private[graft] def compactedThrough(indexPath: String): Long = {
    val p = graft.tsdb.BlockIO.child(indexPath, CompactedThroughMarker)
    if (graft.tsdb.BlockIO.exists(p))
      graft.tsdb.BlockIO.readString(p).trim.toLong
    else Long.MinValue
  }

  /** Live (not-yet-folded) rows of any `batch=<id>`-partitioned monoid
    * store: the compacted `batch=-1` partition plus every batch dir
    * NEWER than the compaction marker. Every view over such a store
    * reads through this, so [[compactMonoidStore]] is valid for ALL of
    * them — and a batch REPLAYED after its partials were folded is
    * inert rather than double-counted. */
  def livePartials(spark: SparkSession, indexPath: String): DataFrame = {
    val through = compactedThrough(indexPath)
    val all = spark.read.parquet(indexPath)
    val live =
      if (through == Long.MinValue) all
      else all.where(col("batch") === -1L || col("batch") > through)
    live.drop("batch") // the replay-idempotency partition key
  }

  /** Collapse ANY `batch=<id>` monoid store's accumulated partials via
    * its own merge `fold` (sum counts, max registers, min hashes,
    * distinct candidates, …) — the generalization of the span-index
    * compaction: fold the live partials into `batch=-1`, record the
    * highest folded batch id in the marker, atomically swap. The fold
    * MUST be the same merge the store's view applies, so
    * view(compact(store)) ≡ view(store) by the monoid laws. Prefer
    * running with the owning stream stopped and committed; the marker
    * makes the overlap safe either way. */
  def compactMonoidStore(spark: SparkSession, indexPath: String,
                         targetFiles: Int = 8)
                        (fold: DataFrame => DataFrame): Unit = {
    import graft.tsdb.BlockIO
    val priorThrough = compactedThrough(indexPath)
    val maxFolded = BlockIO.listDirNames(indexPath)
      .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
      .foldLeft(priorThrough)(math.max)
    val merged = fold(livePartials(spark, indexPath)).repartition(targetFiles)
    val tmp = indexPath + ".compact"
    merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(tmp + "/batch=-1")
    BlockIO.writeString(BlockIO.child(tmp, CompactedThroughMarker),
      maxFolded.toString)
    val old = indexPath + ".old"
    BlockIO.rename(indexPath, old)
    BlockIO.rename(tmp, indexPath)
    BlockIO.delete(old, recursive = true)
    spark.catalog.refreshByPath(indexPath)
  }

  /** The queryable multi-doc span tail over a [[spanIndexStream]] store:
    * merge the appended partials (sum doc counts, min first doc) and keep
    * spans in ≥ `minDocs` documents. Output schema matches the batch
    * [[graft.ops.Dedup.spanIndex]] exactly. Batch dirs at or below the
    * [[compactSpanIndex]] marker are ignored (replayed stale partials). */
  def spanIndexView(spark: SparkSession, indexPath: String,
                    minDocs: Int = 2): DataFrame =
    livePartials(spark, indexPath)
      .groupBy(col("span_digest"))
      .agg(sum(col("n_docs")).as("n_docs"), min(col("first_doc")).as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** Collapse a [[spanIndexStream]] store's accumulated partials to one
    * row per digest (keeping singletons — see [[spanIndexStream]]).
    * Same atomic-ish temp-dir swap as block compaction
    * ([[graft.tsdb.TsMaintenance.compact]]).
    *
    * Exactly-once across compaction: the max folded batch id is
    * recorded in a [[CompactedThroughMarker]] file inside the store,
    * and every reader ([[spanIndexView]], a re-run of this method)
    * ignores batch dirs ≤ that id — so a batch replayed AFTER its
    * partials were folded is inert rather than double-counted. Prefer
    * running compaction with the owning stream stopped and fully
    * committed; the marker makes the overlap safe either way. */
  def compactSpanIndex(spark: SparkSession, indexPath: String,
                       targetFiles: Int = 8): Unit =
    compactMonoidStore(spark, indexPath, targetFiles)(
      _.groupBy(col("span_digest"))
        .agg(sum(col("n_docs")).as("n_docs"), min(col("first_doc")).as("first_doc")))

  /** Beyond-reference: streaming HyperLogLog — the incremental form of
    * [[graft.ops.Sketches.hllDistinct]]. Registers are a MAX-monoid
    * ([[graft.ops.Sketches.hllRegisters]]), so each micro-batch writes
    * its own (grp, idx, mj) partials and the union's registers are
    * recovered by `max` at read time: O(groups × m) rows per batch,
    * never the distinct stream. Same `batch=<id>` Overwrite
    * replay-idempotency contract as [[spanIndexStream]] (max-merge is
    * additionally insensitive to duplicated partials — double counting
    * is structurally impossible, unlike a sum sketch). */
  def hllRegisterStream(rows: DataFrame, groupCol: String, keyCol: String,
                        m: Int, indexPath: String, checkpoint: String,
                        daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.hllRegisters(batch, col(groupCol), col(keyCol), m)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Current distinct-count estimates over a [[hllRegisterStream]]
    * store: max-merge the register partials, then the standard HLL
    * finalize — identical to the batch [[graft.ops.Sketches
    * .hllDistinct]] over the union of all batches. `m` must match the
    * stream's. */
  def hllEstimateView(spark: SparkSession, indexPath: String, m: Int): DataFrame =
    graft.ops.Sketches.hllEstimate(
      livePartials(spark, indexPath)
        .groupBy(col("grp"), col("idx")).agg(max(col("mj")).as("mj")), m)

  /** Streaming KMV — the bottom-k counterpart of [[hllRegisterStream]]:
    * each micro-batch writes its ≤ k smallest distinct hashes per group
    * ([[graft.ops.Sketches.kmvBottomK]], ≤ groups × k rows per batch);
    * the k smallest of the union are among the union of each batch's k
    * smallest, so the view re-takes bottom-k over the partials and
    * lands on EXACTLY the batch sketch. Same `batch=<id>` Overwrite
    * replay contract; like the HLL, min-merge is insensitive to
    * duplicated partials. */
  def kmvHashStream(rows: DataFrame, groupCol: String, keyCol: String,
                    k: Int, indexPath: String, checkpoint: String,
                    daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.kmvBottomK(batch, col(groupCol), col(keyCol), k)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Current KMV estimates over a [[kmvHashStream]] store — identical
    * to the batch [[graft.ops.Sketches.kmvDistinct]] on the union.
    * `k` must match the stream's. */
  def kmvEstimateView(spark: SparkSession, indexPath: String, k: Int): DataFrame =
    graft.ops.Sketches.kmvEstimateFromHashes(
      livePartials(spark, indexPath), k)

  /** Streaming quantile sketch — the rank-query member of the streaming
    * sketch family: each micro-batch writes its ≤ s smallest-hash
    * (grp, h, v) sample rows ([[graft.ops.Sketches.qsampleBottomK]],
    * ≤ groups × s rows per batch); the s smallest hashes of the union
    * are among the union of each batch's s smallest, so the view
    * re-takes bottom-s over the partials and lands on EXACTLY the batch
    * sketch. Same `batch=<id>` Overwrite replay contract; min-merge is
    * insensitive to duplicated partials, like the KMV. */
  def qsampleStream(rows: DataFrame, groupCol: String, uidCol: String,
                    valueCol: String, s: Int, indexPath: String,
                    checkpoint: String,
                    daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.qsampleBottomK(batch, col(groupCol), col(uidCol),
            col(valueCol), s)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Current quantile estimates over a [[qsampleStream]] store —
    * identical to the batch [[graft.ops.Sketches.qsampleQuantile]] on
    * the union of all batches. `s` must match the stream's. */
  def qsampleQuantileView(spark: SparkSession, indexPath: String, s: Int,
                          qs: Seq[Double]): DataFrame =
    graft.ops.Sketches.qsampleQuantiles(
      livePartials(spark, indexPath), s, qs)

  /** Continuous crawl ingest: WARC segments LANDING in `dir` stream
    * into an extracted-documents store.
    *
    * Spark's file source does the segment tracking (checkpointed
    * seen-files log → each segment exactly once, new arrivals picked up
    * per trigger), but is used for NAMES ONLY — the `binaryFile` format
    * prunes the content column away, so nothing file-sized crosses the
    * source; each micro-batch hands its segment list to
    * [[graft.sources.WarcReader.recordsForFiles]], which streams every
    * file through the bounded parser (one task per segment, O(maxPayload)
    * memory). Extraction is [[graft.sources.WarcReader.htmlDocuments]] +
    * canonical URL. Output rows land under `batch=<id>` with Overwrite —
    * the same replay-idempotency contract as every store here (a
    * replayed batch rewrites its own directory, never duplicates).
    * [[warcDocsView]] serves the accumulated corpus. */
  def warcIngestStream(spark: SparkSession, dir: String, docsPath: String,
                       checkpoint: String, maxPayloadBytes: Int = 2 << 20,
                       daemon: Boolean = false): StreamingQuery = {
    val names = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("path"))
    val w: DataStreamWriter[org.apache.spark.sql.Row] = names.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val files = batch.collect().map(_.getString(0)).toSeq.sorted
        if (files.nonEmpty) {
          val recs = graft.sources.WarcReader.recordsForFiles(
            batch.sparkSession, files, maxPayloadBytes)
          graft.sources.WarcReader.htmlDocuments(recs)
            .withColumn("curl", graft.ops.WebText.canonicalizeUrl(col("url")))
            .drop("html")
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$docsPath/batch=$batchId")
          batch.sparkSession.catalog.refreshByPath(docsPath)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** The accumulated extracted corpus of a [[warcIngestStream]] store.
    * Reads through [[livePartials]], so [[compactMonoidStore]] with the
    * identity fold bin-packs the per-batch small files and a batch
    * replayed after compaction is inert, not duplicated. */
  def warcDocsView(spark: SparkSession, docsPath: String): DataFrame =
    livePartials(spark, docsPath)

  /** Continuous WebDataset ingest — [[warcIngestStream]]'s shape for
    * tar shards: shards landing under `dir` stream into a regrouped
    * samples store (`key`, `parts: map<ext, payload>`, counts). Same
    * contract: the file source reads segment NAMES only (content
    * pruned — shards are parsed by [[graft.sources.TarReader]]'s
    * streaming walk, never materialized whole), the checkpointed
    * seen-files log makes each shard exactly-once, and each batch
    * writes an idempotent `batch=<id>` directory so a replayed batch
    * overwrites itself instead of duplicating samples. */
  def tarIngestStream(spark: SparkSession, dir: String, samplesPath: String,
                      checkpoint: String, maxPayloadBytes: Int = 16 << 20,
                      daemon: Boolean = false): StreamingQuery = {
    val names = spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", "*.tar*").load(dir)
      .select(col("path"))
    val w: DataStreamWriter[org.apache.spark.sql.Row] = names.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val files = batch.collect().map(_.getString(0)).toSeq.sorted
        if (files.nonEmpty) {
          val entries = graft.sources.TarReader.entriesForFiles(
            batch.sparkSession, files, maxPayloadBytes)
          graft.sources.TarReader.webdatasetSamples(entries)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$samplesPath/batch=$batchId")
          batch.sparkSession.catalog.refreshByPath(samplesPath)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** The accumulated samples of a [[tarIngestStream]] store. Reads
    * through [[livePartials]] — see [[warcDocsView]]'s compaction
    * contract. */
  def tarSamplesView(spark: SparkSession, samplesPath: String): DataFrame =
    livePartials(spark, samplesPath)

  /** Streaming histogram — the sum-monoid member of the streaming
    * sketch family (HLL registers merge by max, KMV hashes by min,
    * histogram bins by SUM): each micro-batch writes its per-(group,
    * bin) counts (≤ groups × nBins rows); the view sums partials into
    * exactly the union's histogram and serves quantiles from it. Same
    * `batch=<id>` Overwrite replay contract — sums DO double-count
    * duplicated partials, so the idempotent per-batch directory is
    * load-bearing here, not just hygiene. */
  def histCountStream(rows: DataFrame, groupCol: String, valueCol: String,
                      lo: Double, hi: Double, nBins: Int,
                      indexPath: String, checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.histCounts(batch, col(groupCol), col(valueCol),
            lo, hi, nBins)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Current quantile estimates over a [[histCountStream]] store —
    * identical to the batch [[graft.ops.Sketches.histQuantiles]] on the
    * union. (lo, hi, nBins) must match the stream's. */
  def histQuantileView(spark: SparkSession, indexPath: String,
                       lo: Double, hi: Double, nBins: Int,
                       qs: Seq[Double]): DataFrame =
    graft.ops.Sketches.histQuantilesFromCounts(
      livePartials(spark, indexPath), nBins, lo, hi, qs)

  /** Streaming count-min — frequency's member of the streaming sketch
    * family: per-batch (r, c, cnt) counter partials (≤ depth × width
    * rows per batch), summed at read time into exactly the union's
    * counters. Same `batch=<id>` Overwrite replay contract as
    * [[histCountStream]] (counters sum, so idempotency is
    * load-bearing). */
  def cmCounterStream(rows: DataFrame, keyCol: String,
                      depth: Int, width: Int,
                      indexPath: String, checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.cmCounters(batch, col(keyCol), depth, width)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Frequency estimates for `probes` over a [[cmCounterStream]] store —
    * identical to the batch [[graft.ops.Sketches.cmFrequency]] on the
    * union. (depth, width) must match the stream's. */
  def cmFrequencyView(spark: SparkSession, indexPath: String,
                      probes: DataFrame, depth: Int, width: Int): DataFrame =
    graft.ops.Sketches.cmEstimate(
      livePartials(spark, indexPath), probes, depth, width)

  /** Streaming Bloom filter — membership's member of the family: each
    * micro-batch writes its sparse (word, bits) partials; OR-merge is
    * IDEMPOTENT (re-adding a key changes nothing), so this sketch is
    * insensitive to replays by construction — the `batch=<id>` store is
    * kept purely for uniformity with the other streams. The continuously
    * maintained bitmap is the streaming decontamination prefilter: probe
    * a new benchmark against the corpus-so-far without touching the
    * corpus. */
  def bloomBitsStream(rows: DataFrame, keyCol: String,
                      widthBits: Int, numHashes: Int,
                      indexPath: String, checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.bloomBits(batch, col(keyCol), widthBits, numHashes)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Membership of `probes` in a [[bloomBitsStream]] store — identical
    * to the batch [[graft.ops.Sketches.bloomMembership]] on the union.
    * (widthBits, numHashes) must match the stream's. */
  def bloomContainsView(spark: SparkSession, indexPath: String,
                        probes: DataFrame, widthBits: Int,
                        numHashes: Int): DataFrame =
    graft.ops.Sketches.bloomContains(
      livePartials(spark, indexPath), probes, widthBits, numHashes)

  /** Streaming NATIVE histograms — the sum-monoid streaming form of
    * [[graft.ops.NativeHistogram]]: each micro-batch writes its
    * per-group histogram row (sparse exponential buckets + zero bucket
    * + count/sum — ≤ groups rows per batch, observations never stored),
    * and the view [[NativeHistogram.merge]]s the partials into exactly
    * the union's histogram. Same `batch=<id>` Overwrite replay contract
    * as the other sum-monoid stores ([[histCountStream]]): the
    * idempotent per-batch directory is what keeps replayed counts from
    * double-summing. */
  def nativeHistStream(rows: DataFrame, valueCol: String, schema: Int,
                       groupCols: Seq[String], indexPath: String,
                       checkpoint: String,
                       daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.NativeHistogram.observe(batch, col(valueCol), schema, groupCols)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** One merged native histogram per group over a [[nativeHistStream]]
    * store — identical to the batch observe on the union; feed it to
    * [[graft.ops.NativeHistogram.quantile]]/`stats`/`fraction`. */
  def nativeHistView(spark: SparkSession, indexPath: String,
                     groupCols: Seq[String]): DataFrame =
    graft.ops.NativeHistogram.merge(
      livePartials(spark, indexPath), groupCols)

  /** Streaming heavy hitters — the candidate half of
    * [[graft.ops.Sketches.heavyHitters]] run per micro-batch: each batch
    * writes only its bounded Misra-Gries candidate set (≤ partitions × m
    * `(grp, key)` rows — raw observations are never stored). The union
    * of per-batch candidate sets is a SUPERSET of every key with
    * frequency > N/m over the whole stream: a key that never exceeds its
    * batch's local threshold in ANY batch cannot, by pigeonhole, exceed
    * the global one. Candidate sets are idempotent under set-union, so
    * the `batch=<id>` Overwrite replay contract makes replays harmless,
    * like [[bloomBitsStream]]. */
  def heavyHittersStream(rows: DataFrame, groupCol: String, keyCol: String,
                         m: Int, indexPath: String, checkpoint: String,
                         daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Sketches.mgCandidates(batch, col(groupCol), col(keyCol), m)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Top-k per group over a [[heavyHittersStream]] candidate store —
    * identical to the batch [[graft.ops.Sketches.heavyHitters]] on the
    * union whenever the k-th frequency exceeds N/m (the batch contract):
    * both recount EXACTLY over the corpus, and any candidate superset of
    * the true heavies recounts to the same answer. `corpus` is the
    * accumulated stream content — the parquet table the ingest path
    * already appends ([[ingestStream]]/[[curateToStore]]) — so the
    * recount is one bounded broadcast semi-join + aggregation, never a
    * full top-N sort. */
  def heavyHittersView(spark: SparkSession, indexPath: String,
                       corpus: DataFrame, groupCol: String, keyCol: String,
                       k: Int): DataFrame = {
    val pairs = corpus
      .select(col(groupCol).cast("string").as("grp"),
        col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull)
    graft.ops.Sketches.recountTopK(pairs,
      livePartials(spark, indexPath).distinct(), k)
  }

  /** Streaming SCD2 dimension maintenance — the streaming consumer of
    * [[graft.ops.Scd]]: each micro-batch of updates folds into the
    * dimension history via `scd2Merge` and the result snapshots under
    * `epoch=<batchId>` (Overwrite). A batch reads the latest epoch
    * STRICTLY BELOW its own id, so a crash replay of batch N rebuilds
    * from N−1 and overwrites the same dir — bit-identical, idempotent.
    * Snapshots are dimension-sized (never fact-sized); [[scd2Vacuum]]
    * prunes superseded epochs. */
  def scd2Stream(updates: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
                 tsCol: String, dimPath: String, checkpoint: String,
                 endOfTime: Long = 4102444800000L,
                 daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = updates.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val current = latestEpochBelow(spark, dimPath, batchId) match {
          case Some(p) => spark.read.parquet(s"$dimPath/epoch=$p")
          case None => // empty history with the right schema
            graft.ops.Scd.scd2(batch.limit(0), keyCols, valueCols, tsCol, endOfTime)
        }
        graft.ops.Scd.scd2Merge(current, batch, keyCols, valueCols, tsCol, endOfTime)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$dimPath/epoch=$batchId")
        spark.catalog.refreshByPath(dimPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** The dimension as of the newest committed epoch. */
  def scd2View(spark: SparkSession, dimPath: String): DataFrame = {
    val latest = epochIds(spark, dimPath).maxOption.getOrElse(
      throw new IllegalStateException(s"no scd2 epochs under $dimPath"))
    spark.read.parquet(s"$dimPath/epoch=$latest")
  }

  /** Drop every epoch snapshot superseded by the newest one. */
  def scd2Vacuum(spark: SparkSession, dimPath: String): Int = {
    val ids = epochIds(spark, dimPath)
    if (ids.isEmpty) return 0
    val fs = new org.apache.hadoop.fs.Path(dimPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stale = ids.filter(_ != ids.max)
    stale.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dimPath/epoch=$id"), true)
    }
    stale.size
  }

  private def epochIds(spark: SparkSession, dimPath: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dimPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
  }

  private def latestEpochBelow(spark: SparkSession, dimPath: String,
                               batchId: Long): Option[Long] =
    epochIds(spark, dimPath).filter(_ < batchId).maxOption

  /** Streaming data-validation gate — the streaming consumer of
    * [[graft.ops.Checks]]: each micro-batch is admitted to
    * `storePath/batch=<id>` ONLY when its constraint suite passes; a
    * failing batch lands WHOLE in `quarantinePath/batch=<id>` with its
    * report rows beside it (`<quarantinePath>_reports/batch=<id>`), so
    * bad data never mixes into the corpus and the failure is
    * diagnosable from the report alone — the Deequ gate, run where the
    * data arrives instead of after it has already landed.
    *
    * The report is ≤ |constraints| rows, so collecting the verdict is
    * driver-bounded by construction. An empty batch passes vacuously
    * (null metrics assert nothing). `batch=<id>` Overwrite dirs make
    * replays idempotent on BOTH destinations — a batch that failed,
    * was quarantined, and is replayed after a crash overwrites its own
    * quarantine copy, never double-lands. */
  def validatedStream(rows: DataFrame,
                      rowChecks: Seq[graft.ops.Checks.RowCheck],
                      uniques: Seq[graft.ops.Checks.UniqueCheck],
                      storePath: String, quarantinePath: String,
                      checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    require(rowChecks.nonEmpty || uniques.nonEmpty, "empty check suite")
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val persisted = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val report = graft.ops.Checks.run(persisted, rowChecks, uniques)
          val verdicts = report.collect()
          val pass = verdicts.forall(r =>
            r.isNullAt(r.fieldIndex("pass")) || r.getBoolean(r.fieldIndex("pass")))
          val dst = if (pass) storePath else quarantinePath
          persisted.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(s"$dst/batch=$batchId")
          if (!pass)
            report.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"${quarantinePath}_reports/batch=$batchId")
        } finally persisted.unpersist(false)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Streaming drift monitor — the streaming consumer of
    * [[graft.ops.Drift]]: every micro-batch's category mix is compared
    * against a BLESSED reference count table (fit once via
    * `Drift.categoryCounts`, loaded at stream start) and one summary
    * row per batch lands in `monitorPath/batch=<id>`:
    * `(n_categories, n_ref, n_cur, psi, js, chi2, alert)` with `alert`
    * = psi ≥ `psiAlert`. The monitor table IS the alert feed — tail it,
    * graph it, join it to batch ids; Overwrite dirs keep replays
    * idempotent (a replayed batch rewrites its own verdict). Each
    * batch's count is ≤ |categories| rows; the reference never
    * recounts. */
  def driftMonitorStream(rows: DataFrame, catCol: String,
                         refCountsPath: String, monitorPath: String,
                         checkpoint: String, psiAlert: Double = 0.25,
                         alpha: Double = 0.5,
                         daemon: Boolean = false): StreamingQuery = {
    val refCounts = rows.sparkSession.read.parquet(refCountsPath)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Drift.summaryFromCounts(refCounts,
            graft.ops.Drift.categoryCounts(batch, col(catCol)), alpha)
          .withColumn("alert", col("psi") >= psiAlert)
          .coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$monitorPath/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Streaming classifier gate — the streaming consumer of a persisted
    * [[graft.ops.Classifier.NbModel]] (train once on curated seeds,
    * ship the parquet artifact, gate every arriving micro-batch): docs
    * scoring `p_pos >= minP` land in `storePath/batch=<id>`, the rest
    * in `rejectPath/batch=<id>` WITH their scores (rejects are
    * delivered, not swallowed — the quality-filter audit trail every
    * curation pipeline keeps). The model loads once per stream start
    * and its ≤buckets-row weight table broadcasts into each batch's
    * scoring join; Overwrite batch dirs keep replays idempotent. */
  def classifierGatedStream(docs: DataFrame, idCol: String, textCol: String,
                            modelPath: String, minP: Double,
                            storePath: String, rejectPath: String,
                            checkpoint: String,
                            daemon: Boolean = false): StreamingQuery = {
    val model = graft.ops.Classifier.load(docs.sparkSession, modelPath)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val persisted = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val scored = graft.ops.Classifier.score(persisted, idCol, textCol, model)
            .withColumnRenamed("id", idCol)
          val joined = persisted.join(
            scored.select(col(idCol), col("logodds"), col("p_pos")), Seq(idCol))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            joined.where(col("p_pos") >= minP)
              .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"$storePath/batch=$batchId")
            joined.where(col("p_pos") < minP)
              .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"$rejectPath/batch=$batchId")
          } finally joined.unpersist(false)
        } finally persisted.unpersist(false)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Streaming DSIR pool model — the sum-monoid member of the streaming
    * family for importance-resampling data selection
    * ([[graft.ops.Dsir]]): each micro-batch writes its hashed-gram
    * bucket counts (≤ `buckets` rows — the model's sufficient statistic)
    * to a `batch=<id>` directory with Overwrite, so a replayed batch
    * rewrites rather than double-counts (load-bearing for a sum, as with
    * the histogram stream). The accumulated store IS the raw-pool model
    * q, refined as the pool streams past; score any frame against it
    * with [[graft.ops.Dsir.weightsAgainst]] + [[dsirPoolCounts]]. */
  def dsirCountStream(docs: DataFrame, textCol: String, buckets: Int,
                      indexPath: String, checkpoint: String,
                      daemon: Boolean = false): StreamingQuery = {
    val w: DataStreamWriter[org.apache.spark.sql.Row] = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.ops.Dsir.bucketCounts(batch, textCol, buckets)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$indexPath/batch=$batchId")
        batch.sparkSession.catalog.refreshByPath(indexPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Accumulated pool-model counts over a [[dsirCountStream]] store —
    * identical to [[graft.ops.Dsir.bucketCounts]] on the union of every
    * batch streamed so far (counts are a sum-monoid). */
  def dsirPoolCounts(spark: SparkSession, indexPath: String): DataFrame =
    livePartials(spark, indexPath)
      .groupBy("b").agg(sum(col("c")).as("c"))

  /** Beyond-reference: the streaming form of the batch curation pipeline
    * ([[graft.queries.PipelineQueries]] `pipeline_curate`) — the
    * watermark-bounded exact dedup composed with the STATELESS per-doc
    * curation columns (quality score, language id, BPE-ish token
    * estimate) and a quality floor. The stateless ops are codegen'd
    * projections riding the same micro-batch; only the digest dedup
    * keeps (bounded) state. Dedup runs FIRST so a duplicate never
    * re-enters scoring, and the emitted stream is exactly what a
    * continuously-curated training corpus appends. */
  def curateStream(docs: DataFrame, tsCol: String, textCol: String,
                   watermark: String = "10 minutes",
                   minQuality: Double = 0.2): DataFrame =
    streamingDedup(docs, tsCol, textCol, watermark)
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", graft.ops.TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens_est", graft.ops.TextAnalysis.tokenEstimate(col(textCol)))
      .where(col("quality") >= minQuality)

  /** The complete streaming curation pipeline, ending in a curated
    * parquet corpus: [[curateStream]] (watermark-bounded exact dedup ×
    * quality floor × langid) composed with per-micro-batch benchmark
    * DECONTAMINATION ([[graft.ops.Decontaminate.clean]]) against a
    * static benchmark frame. Decontamination is doc-local — a document's
    * overlap with the (static) benchmark does not depend on any other
    * corpus document — so cleaning each micro-batch independently equals
    * cleaning the batch union: no state beyond the dedup horizon, and
    * the benchmark side broadcast per batch exactly as in the batch
    * path. Output append is the same at-least-once-on-crash contract as
    * [[ingestStream]] (the curated corpus is a plain parquet table).
    *
    * With `nearDupIndexPath` set, an incremental NEAR-dup gate runs
    * after decontamination ([[admitNearDupFree]]): batch docs that
    * near-duplicate anything previously admitted are dropped, and
    * survivors' minhash signatures append to the growing index. */
  def curateToStore(docs: DataFrame, tsCol: String, idCol: String,
                    textCol: String, benchmark: DataFrame,
                    storePath: String, checkpoint: String,
                    watermark: String = "10 minutes",
                    minQuality: Double = 0.2, shingleSize: Int = 2,
                    threshold: Double = 0.4,
                    daemon: Boolean = false,
                    nearDupIndexPath: Option[String] = None,
                    nearDupThreshold: Double = 0.6): StreamingQuery = {
    val curated = curateStream(docs, tsCol, textCol, watermark, minQuality)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = curated.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val cleaned = graft.ops.Decontaminate.clean(batch, benchmark, idCol,
          textCol, shingleSize, threshold)
        nearDupIndexPath match {
          case None =>
            cleaned.write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(storePath)
          case Some(ix) => admitNearDupFree(cleaned, idCol, textCol, ix,
            nearDupThreshold, storePath)
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** Per-micro-batch near-dup FLAGS against the growing signature index
    * at `indexPath` — the shared core of the curation gates: the batch
    * comes back with a `near_dup_of` column holding the smallest
    * already-indexed near-duplicate's id, or null for a novel document.
    * The index is read FRESH each call (a new file listing per batch —
    * the reason the gate lives in `foreachBatch` rather than a
    * stream-static join, whose file listing freezes at stream start).
    * Before the index has any data every document is novel. */
  private def nearDupFlags(batch: DataFrame, idCol: String, textCol: String,
                           indexPath: String, threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val hasIndex = graft.tsdb.BlockIO.isDirectory(indexPath) &&
      graft.tsdb.BlockIO.listNames(indexPath)
        .exists(n => !n.startsWith("_") && !n.startsWith("."))
    if (!hasIndex)
      batch.withColumn("near_dup_of",
        lit(null).cast(batch.schema(batch.schema.fieldIndex(idCol)).dataType))
    else {
      val matches = graft.ops.Dedup.minhashLshAgainst(batch, idCol, textCol,
          spark.read.parquet(indexPath), numHashes = 16, bands = 4,
          shingleSize = 3, threshold = threshold)
        .groupBy(col("new_id"))
        .agg(min(col("corpus_id")).as("near_dup_of"))
        .select(col("new_id").as(idCol), col("near_dup_of"))
      batch.join(matches, Seq(idCol), "left")
    }
  }

  /** [[curateStream]] with the incremental near-dup gate folded in — the
    * non-store counterpart of [[curateToStore]]'s gate, for pipelines
    * that own their sink: upstream, the watermark-bounded exact dedup ×
    * quality floor × langid of [[curateStream]]; then per micro-batch
    * the surviving documents are flagged against the growing minhash
    * signature index ([[nearDupFlags]] — `near_dup_of` names the
    * already-seen near-duplicate, null means novel), NOVEL documents'
    * signatures append to the index so later batches (and later runs)
    * compare against everything admitted before, and the flagged batch
    * is handed to `sink`. The sink decides drop-vs-route — flagged rows
    * are delivered, not silently swallowed, because a real pipeline
    * audits its rejects. Same at-least-once-on-crash contract as
    * [[curateToStore]]: a replayed batch re-appends signatures, and
    * duplicate index rows only make the gate stricter. */
  def curateStreamGated(docs: DataFrame, tsCol: String, idCol: String,
                        textCol: String, nearDupIndexPath: String,
                        checkpoint: String,
                        watermark: String = "10 minutes",
                        minQuality: Double = 0.2,
                        nearDupThreshold: Double = 0.6,
                        daemon: Boolean = false)
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val curated = curateStream(docs, tsCol, textCol, watermark, minQuality)
    val w: DataStreamWriter[org.apache.spark.sql.Row] = curated.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val persisted = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val flagged = nearDupFlags(persisted, idCol, textCol,
              nearDupIndexPath, nearDupThreshold)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            sink(flagged, batchId)
            // novel docs join the index so the NEXT batch sees them
            graft.ops.Dedup.minhashSignatures(
                flagged.where(col("near_dup_of").isNull), idCol, textCol,
                numHashes = 16, shingleSize = 3, bands = 4)
              .write.mode(org.apache.spark.sql.SaveMode.Append)
              .parquet(nearDupIndexPath)
          } finally flagged.unpersist(false)
        } finally persisted.unpersist(false)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(if (daemon) Trigger.ProcessingTime("5 seconds") else Trigger.AvailableNow())
    w.start()
  }

  /** The incremental NEAR-dup gate of the store-ending curation stream —
    * the streaming consumer of [[graft.ops.Dedup.minhashLshAgainst]]:
    * documents of this micro-batch that near-duplicate anything already
    * ADMITTED to the corpus are dropped ([[nearDupFlags]] decides), and
    * the survivors' minhash signatures are appended to the growing index
    * at `indexPath`, so later batches (and later runs — the index is a
    * plain parquet table) compare against everything that came before.
    * Within-batch near-dups are not collapsed here (the watermark dedup
    * upstream removes exact repeats; run the batch
    * [[graft.ops.Dedup.minhashLsh]] over the corpus on the maintenance
    * cadence for the rest). Index appends share the corpus append's
    * at-least-once-on-crash contract: a replayed batch re-appends
    * signatures, and duplicate index rows only make the gate STRICTER
    * (the same candidate pairs re-verify), never admit a duplicate. */
  private def admitNearDupFree(batch: DataFrame, idCol: String,
                               textCol: String, indexPath: String,
                               threshold: Double, storePath: String): Unit = {
    import graft.ops.Dedup
    val persisted = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val survivors = nearDupFlags(persisted, idCol, textCol, indexPath, threshold)
      .where(col("near_dup_of").isNull).drop("near_dup_of")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      survivors.write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(storePath)
      // admitted docs join the index so the NEXT batch sees them
      Dedup.minhashSignatures(survivors, idCol, textCol,
          numHashes = 16, shingleSize = 3, bands = 4)
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
    } finally {
      survivors.unpersist(false)
      persisted.unpersist(false)
    }
  }
}
