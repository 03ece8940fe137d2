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

  /** Globally shuffle `df` into the seeded order and assign each row
    * its 0-based global ordinal `ord` plus the running token count
    * `tok_before` (tokens of all rows strictly ahead of it). Emits
    * (id, n_tokens, ord, tok_before) in shuffle order.
    *
    * The range-partitioned intermediate is persisted for the span of
    * the two passes: range boundaries come from sampling, so pass 1
    * (stats) and pass 2 (ordinals) must see the SAME physical
    * partitioning, not a recomputed one. */
  def shuffledWithOrdinals(df: DataFrame, idCol: String, tokensCol: Column,
                           seed: String): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.select(col(idCol).cast("long").as("id"),
        tokensCol.cast("long").as("n_tokens"))
      .withColumn("skey", shuffleKey(seed, col("id")))
    val parted = keyed
      .repartitionByRange(col("skey"), col("id"))
      .sortWithinPartitions(col("skey"), col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition (rows, tokens) — one row per partition
    val stats = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var tok = 0L
      it.foreach { r => n += 1; tok += r.getLong(1) }
      Iterator((pid, n, tok))
    }.collect().sortBy(_._1)
    val nParts = parted.rdd.getNumPartitions
    val ordOff = new Array[Long](nParts)
    val tokOff = new Array[Long](nParts)
    var ro = 0L; var to = 0L
    stats.foreach { case (pid, n, tok) =>
      ordOff(pid) = ro; tokOff(pid) = to; ro += n; to += tok
    }
    val bOrd = spark.sparkContext.broadcast(ordOff)
    val bTok = spark.sparkContext.broadcast(tokOff)
    // pass 2: stream each partition once, counters seeded from the
    // broadcast prefix offsets — partition-local, no further exchange
    val rows = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var ord = bOrd.value(pid); var tok = bTok.value(pid)
      it.map { r =>
        val out = Row(r.getLong(0), r.getLong(1), ord, tok)
        ord += 1; tok += r.getLong(1)
        out
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("ord", LongType, nullable = false),
      StructField("tok_before", LongType, nullable = false))))
  }

  /** Token-budgeted shard plan over the shuffled order: a document
    * belongs to the shard its FIRST token lands in (the same streaming
    * cut rule as [[Packing.pack]] — shards fill to ~`budget` tokens,
    * overshooting by at most one document), with its 0-based position
    * within the shard. Emits (id, n_tokens, ord, shard_id, shard_pos).
    *
    * The shard_id is closed-form from the prefix sum (`tok_before /
    * budget`); only shard_pos needs a window, and its groups are
    * budget-bounded (≈ budget/avg_tokens rows), so that exchange is
    * small and skew-free by construction — shard keys are contiguous
    * ordinal ranges of uniform mass. */
  def tokenShards(df: DataFrame, idCol: String, tokensCol: Column,
                  seed: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val ordered = shuffledWithOrdinals(df, idCol, tokensCol, seed)
    val w = Window.partitionBy(col("shard_id")).orderBy(col("ord"))
    ordered
      .withColumn("shard_id", (col("tok_before") / budget).cast("long"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .select(col("id"), col("n_tokens"), col("ord"),
        col("shard_id"), col("shard_pos"))
  }
}
