package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class CorpusShuffleSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // 200 docs over 7 input partitions so the range repartition and the
  // prefix-sum offsets are actually exercised across partitions
  private def corpus = (0L until 200L).map(i => (i, 1L + (i * 37) % 90))
    .toDF("doc_id", "n_tokens").repartition(7)

  test("shuffledWithOrdinals matches a single-threaded sort of the same keys") {
    val got = CorpusShuffle.shuffledWithOrdinals(
        corpus, "doc_id", col("n_tokens"), seed = "s1")
      .orderBy("ord").collect()
    // local reference: order by (md5 key, id), then running count/sum
    val keyed = corpus.select(col("doc_id"),
        CorpusShuffle.shuffleKey("s1", col("doc_id")).as("skey"), col("n_tokens"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var tok = 0L
    keyed.zipWithIndex.foreach { case ((_, id, n), i) =>
      assert(got(i).getLong(0) == id, s"ord $i id")
      assert(got(i).getLong(1) == n, s"ord $i tokens")
      assert(got(i).getLong(2) == i.toLong, s"ord $i ordinal")
      assert(got(i).getLong(3) == tok, s"ord $i tok_before")
      tok += n
    }
    // the permutation actually shuffles (not the identity order)
    assert(keyed.map(_._2).take(20).toSeq != (0L until 20L).toSeq)
  }

  test("two runs and a different partitioning produce the identical plan") {
    val a = CorpusShuffle.shuffledWithOrdinals(corpus, "doc_id",
      col("n_tokens"), "s2").orderBy("ord").collect().map(_.toSeq).toSeq
    val b = CorpusShuffle.shuffledWithOrdinals(corpus.repartition(3), "doc_id",
      col("n_tokens"), "s2").orderBy("ord").collect().map(_.toSeq).toSeq
    assert(a == b)
    // a different seed is a different permutation
    val c = CorpusShuffle.shuffledWithOrdinals(corpus, "doc_id",
      col("n_tokens"), "s3").orderBy("ord").collect().map(_.toSeq).toSeq
    assert(a.map(_.head) != c.map(_.head))
  }

  test("tokenShards: streaming cut rule, contiguous shards, bounded overshoot") {
    val budget = 500L
    val shards = CorpusShuffle.tokenShards(corpus, "doc_id",
        col("n_tokens"), "s1", budget)
      .orderBy("ord").collect()
    // shard ids are non-decreasing along the shuffle order, starting at 0
    val ids = shards.map(_.getLong(3))
    assert(ids.head == 0L)
    assert(ids.zip(ids.tail).forall { case (a, b) => b == a || b == a + 1 || b > a },
      "shard ids must be non-decreasing")
    // the cut rule itself: walking the shuffle order with a local
    // running sum, every document's shard is exactly its first token's
    // budget bin (this is the whole definition — mass bounds follow)
    var cum = 0L
    shards.foreach { r =>
      assert(r.getLong(3) == cum / budget,
        s"doc ${r.getLong(0)} at cum $cum: shard ${r.getLong(3)}")
      cum += r.getLong(1)
    }
    val byShard = shards.groupBy(_.getLong(3)).toSeq.sortBy(_._1)
    // shard_pos is a dense 0-based sequence within each shard
    byShard.foreach { case (sid, rows) =>
      assert(rows.sortBy(_.getLong(2)).map(_.getLong(4)).toSeq ==
        rows.indices.map(_.toLong), s"shard $sid positions")
    }
    // total conservation: every doc in exactly one shard
    assert(shards.length == 200)
  }

  test("tokenShardsAppend: frozen prefix, straddling shard fills, cut rule holds") {
    val budget = 400L
    val old = corpus.where(col("doc_id") < 150)
    val fresh = corpus.where(col("doc_id") >= 150)
    val plan = CorpusShuffle.tokenShards(old, "doc_id", col("n_tokens"), "a1", budget)
    val delta = CorpusShuffle.tokenShardsAppend(plan, fresh, "doc_id",
      col("n_tokens"), "a1", budget)
    val oldRows = plan.orderBy("ord").collect()
    val newRows = delta.orderBy("ord").collect()
    // ordinals continue densely after the frozen prefix
    assert(newRows.head.getLong(2) == oldRows.length.toLong)
    assert(newRows.map(_.getLong(2)).toSeq ==
      (oldRows.length.toLong until (oldRows.length + newRows.length).toLong))
    // the UNION satisfies the global streaming cut rule end to end —
    // i.e. the append continued the token stream exactly
    var cum = 0L
    (oldRows ++ newRows).foreach { r =>
      assert(r.getLong(3) == cum / budget,
        s"doc ${r.getLong(0)} at cum $cum: shard ${r.getLong(3)}")
      cum += r.getLong(1)
    }
    // shard_pos in the straddling shard continues the old count
    val lastOldShard = oldRows.map(_.getLong(3)).max
    val oldInLast = oldRows.count(_.getLong(3) == lastOldShard)
    val straddlers = newRows.filter(_.getLong(3) == lastOldShard)
    if (straddlers.nonEmpty)
      assert(straddlers.head.getLong(4) == oldInLast.toLong,
        "straddling shard position must continue the frozen prefix")
    // positions are dense within every purely-new shard
    newRows.groupBy(_.getLong(3)).foreach { case (sid, rows) =>
      if (sid != lastOldShard)
        assert(rows.sortBy(_.getLong(2)).map(_.getLong(4)).toSeq ==
          rows.indices.map(_.toLong), s"shard $sid")
    }
  }

  test("writeShards: one file per shard, file order replays the permutation") {
    val docs = (0L until 120L).map(i => (i, 1L + i % 40, s"doc-$i"))
      .toDF("doc_id", "n_tokens", "body").repartition(5)
    val plan = CorpusShuffle.tokenShards(docs, "doc_id", col("n_tokens"),
      seed = "w1", budget = 300L)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
      .resolve("out").toString
    CorpusShuffle.writeShards(docs, "doc_id", plan, dir)
    // exactly one parquet file per shard directory
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    // replaying shards in id order, rows in FILE order, reproduces the
    // seeded global permutation exactly
    val replayed = shardDirs.flatMap { d =>
      spark.read.parquet(d.getAbsolutePath)
        .select("doc_id", "ord", "body").collect()
    }
    val expected = plan.orderBy("ord").collect()
    assert(replayed.map(_.getLong(1)).toSeq == expected.map(_.getLong(2)).toSeq,
      "file order must be shuffle order")
    assert(replayed.map(r => r.getString(2)) ===
      replayed.map(r => s"doc-${r.getLong(0)}"), "payload rides the join")
  }

  test("scale shape: no single-partition global window in the plan") {
    val df = CorpusShuffle.shuffledWithOrdinals(corpus, "doc_id",
      col("n_tokens"), "s4")
    // the ordinal assignment is partition-parallel: the result RDD keeps
    // the range partitioning (one partition per range), and the plan has
    // no Window operator at all
    assert(df.rdd.getNumPartitions > 1,
      "ordinals must be computed partition-parallel, not via a global sort")
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
  }
}
