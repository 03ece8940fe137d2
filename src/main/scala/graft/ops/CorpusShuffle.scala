package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Deterministic global corpus shuffle + token-budgeted shard planning —
  * the write path between a curated corpus and a training run: examples
  * must reach the trainer in a reproducible pseudo-random order, cut
  * into shards of ~equal token mass.
  *
  * The order is a pure function of (seed, id): `md5(seed ':' id)`. A
  * re-run, a different cluster size, or a different engine produces the
  * identical permutation, so the whole plan — order, ordinals, shard
  * cuts — gets an exact SQL oracle.
  *
  * Scale shape (100 TB): a global `row_number()`/running-sum window is
  * a single-partition sort — a non-starter. Instead: range-partition on
  * the shuffle key (each output partition owns a contiguous key range),
  * sort within partitions, then a TWO-PASS prefix sum — pass 1 is a
  * per-partition count/token-sum (one tiny row per partition to the
  * driver), pass 2 streams each partition once, seeding its running
  * counters from the broadcast prefix offsets. Nothing but the
  * partition stats ever leaves the executors; the expensive exchange is
  * the one range shuffle, which at scale IS the output write order. */
object CorpusShuffle {

  /** The seeded permutation key: deterministic, uniform, and
    * collision-broken by the id itself (ties are impossible in the
    * (key, id) order even if two ids hashed identically). */
  def shuffleKey(seed: String, id: Column): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** Deterministic range partitioner over the md5 shuffle key: the
    * partition is the key's leading 32 hex bits scaled into
    * `numPartitions` buckets. md5 output is uniform, so the buckets are
    * balanced BY CONSTRUCTION — no sampling pass, no sampled boundaries
    * to disagree between jobs — and bucket i holds a contiguous key
    * range below bucket i+1, so partition order is global key order. */
  /** Globally shuffle `df` into the seeded order and assign each row
    * its 0-based global ordinal `ord` plus the running token count
    * `tok_before` (tokens of all rows strictly ahead of it). Emits
    * (id, n_tokens, ord, tok_before) in shuffle order.
    *
    * Scale mechanics — one Tungsten exchange, one spill-safe sort, all
    * prefix math on bucket-granular driver state:
    *
    *  - rows get a BUCKET: the key's leading 32 hex bits scaled into
    *    16·shuffle-partitions slots. The bucket is a monotone function
    *    of the key, so (bucket, skey, id) order IS (skey, id) order.
    *  - `repartition(nParts, bucket)` hash-partitions on the bucket
    *    value — every bucket lands WHOLLY in one partition, and the
    *    assignment is deterministic arithmetic, not sampling, so a
    *    partition recomputed after cache eviction or executor loss is
    *    bit-identical (a sampled `repartitionByRange` cannot promise
    *    that: resampled boundaries silently reshuffle rows).
    *  - `sortWithinPartitions(bucket, skey, id)` groups each bucket
    *    contiguously. Physical partition order never matters — only
    *    per-bucket offsets do.
    *  - pass 1 aggregates per-bucket (rows, tokens) — map-side
    *    combined, one tiny row per bucket to the driver.
    *  - pass 2 streams each cached partition once, re-seeding the
    *    running counters from the broadcast offsets at every bucket
    *    boundary.
    *
    * The persisted sorted layout is columnar (DataFrame cache) and is
    * the only materialization; the corpus crosses the wire exactly
    * once. */
  def shuffledWithOrdinals(df: DataFrame, idCol: String, tokensCol: Column,
                           seed: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val nBuckets = nParts * 16
    val hex32 = conv(substring(col("skey"), 1, 8), 16, 10).cast("long")
    val parted = df.select(col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"))
      .withColumn("skey", shuffleKey(seed, col("id")))
      .withColumn("bucket", shiftright(hex32 * nBuckets, 32))
      .repartition(nParts, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("skey"), col("id"))
      .select(col("bucket"), col("id"), col("n_tokens"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-bucket (rows, tokens) — map-side-combined partials,
    // nBuckets rows to the driver; this action also builds the cache
    val ordOff = new Array[Long](nBuckets)
    val tokOff = new Array[Long](nBuckets)
    val stats = parted.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var ro = 0L; var to = 0L
    stats.foreach { case (b, n, tok) =>
      ordOff(b) = ro; tokOff(b) = to; ro += n; to += tok
    }
    val bOrd = spark.sparkContext.broadcast(ordOff)
    val bTok = spark.sparkContext.broadcast(tokOff)
    // pass 2: stream each cached partition once; counters re-seed from
    // the broadcast offsets at each bucket boundary
    val rows = parted.rdd.mapPartitions { it =>
      var cur = -1L; var ord = 0L; var tok = 0L
      it.map { r =>
        val b = r.getLong(0)
        if (b != cur) { cur = b; ord = bOrd.value(b.toInt); tok = bTok.value(b.toInt) }
        val out = Row(r.getLong(1), r.getLong(2), ord, tok)
        ord += 1; tok += r.getLong(2)
        out
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("ord", LongType, nullable = false),
      StructField("tok_before", LongType, nullable = false))))
  }

  /** Incremental shard append — training corpora GROW, and shards
    * already written (and possibly already consumed by a run) must stay
    * frozen. New documents shuffle deterministically among THEMSELVES
    * (same seeded key) and take ordinals/token offsets continuing after
    * the existing plan; the straddling shard (the old plan's last, if
    * under budget) fills up first, then fresh shards open. Returns ONLY
    * the delta rows, same schema as [[tokenShards]] — union with the
    * old plan for the full layout.
    *
    * This is deliberately NOT equal to re-running [[tokenShards]] on
    * the union (that would interleave new docs into written shards);
    * the append contract is immutability of everything already
    * planned. Driver state: four scalars from one aggregate over the
    * old plan. */
  def tokenShardsAppend(plan: DataFrame, df: DataFrame, idCol: String,
                        tokensCol: Column, seed: String,
                        budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = plan.agg(
      count(lit(1)).as("n"), sum(col("n_tokens")).as("tok"),
      max(col("shard_id")).as("last_shard")).head()
    val (n0, tok0) =
      if (base.isNullAt(1)) (0L, 0L) else (base.getLong(0), base.getLong(1))
    val lastShard = if (base.isNullAt(2)) -1L else base.getLong(2)
    val lastShardOrd0 =
      if (lastShard < 0) -1L
      else plan.where(col("shard_id") === lastShard)
        .agg(min(col("ord"))).head().getLong(0)
    val fresh = shuffledWithOrdinals(df, idCol, tokensCol, seed)
      .withColumn("ord", col("ord") + n0)
      .withColumn("tok_before", col("tok_before") + tok0)
      .withColumn("shard_id", expr(s"tok_before div ${budget}L"))
    // per-shard first ordinal over the COMBINED corpus: new shards own
    // their min; the straddling shard's origin lives in the old plan
    val firstOrd = fresh.groupBy(col("shard_id"))
      .agg(min(col("ord")).as("ord0"))
      .withColumn("shard_ord0",
        when(col("shard_id") === lastShard, lit(lastShardOrd0))
          .otherwise(col("ord0")))
    fresh.join(firstOrd.select(col("shard_id"), col("shard_ord0")), "shard_id")
      .withColumn("shard_pos", (col("ord") - col("shard_ord0")).cast("long"))
      .select(col("id"), col("n_tokens"), col("ord"),
        col("shard_id"), col("shard_pos"))
  }

  /** Materialize a shard plan into files: join the plan back to the
    * full rows and write `partitionBy("shard_id")`, one writer (and so
    * ONE file) per shard directory, rows inside each file in exact
    * shuffle order. This is the plan becoming the training dataset:
    * a reader that consumes shard directories in id order and rows in
    * file order replays the seeded global permutation.
    *
    * Scale shape: the plan is (id, ord, shard) — document payloads join
    * it by id (one shuffle of the corpus, the write movement itself);
    * `repartition(shard_id)` gives every shard directory exactly one
    * writer instead of tasks×shards small files (the object-store
    * antipattern), and the within-partition sort on `ord` makes file
    * order the shuffle order. */
  def writeShards(df: DataFrame, idCol: String, plan: DataFrame,
                  path: String): Unit = {
    df.withColumn("id", col(idCol).cast("long"))
      .join(plan.select(col("id"), col("ord"), col("shard_id")), "id")
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("ord"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(path)
  }

  /** Token-budgeted shard plan over the shuffled order: a document
    * belongs to the shard its FIRST token lands in (the same streaming
    * cut rule as [[Packing.pack]] — shards fill to ~`budget` tokens,
    * overshooting by at most one document), with its 0-based position
    * within the shard. Emits (id, n_tokens, ord, shard_id, shard_pos).
    *
    * Both shard columns are closed-form from the prefix sum: shard_id
    * is `tok_before / budget`, and because a shard is a CONTIGUOUS
    * ordinal range, shard_pos is `ord - min(ord) of the shard` — a
    * map-side-combined aggregate (one tiny row per shard) joined back,
    * never a full-row window shuffle over the corpus. */
  def tokenShards(df: DataFrame, idCol: String, tokensCol: Column,
                  seed: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val ordered = shuffledWithOrdinals(df, idCol, tokensCol, seed)
      .withColumn("shard_id", expr(s"tok_before div ${budget}L"))
    // per-shard first ordinal: partial-aggregated to ≤ one row per
    // (shard, partition) before the exchange; the join back is
    // dim-sized (shard count), so Catalyst/AQE broadcasts it and the
    // corpus-side rows never shuffle again (they re-stream from the
    // persisted range layout)
    val firstOrd = ordered.groupBy(col("shard_id"))
      .agg(min(col("ord")).as("shard_ord0"))
    ordered.join(firstOrd, "shard_id")
      .withColumn("shard_pos", (col("ord") - col("shard_ord0")).cast("long"))
      .select(col("id"), col("n_tokens"), col("ord"),
        col("shard_id"), col("shard_pos"))
  }
}
