package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history — the warehouse pattern
  * that turns an update stream into interval-versioned dimension rows
  * `(key, attrs, valid_from, valid_to)`, open rows carrying
  * `valid_to = endOfTime`.
  *
  * Determinism: updates order by `(ts, attrs)` — a (key, ts) tie
  * breaks on the attribute tuple, so any engine replays the same
  * history; exact duplicates collapse in change detection.
  *
  * 100 TB shape: ONE shuffle on the key. Change detection (lag) and
  * interval assignment (lead) are two windows over the same key
  * partitioning with a filter between them — the exchange and sort
  * are planned once (spec-asserted). [[scd2Merge]] adds one
  * key-bounded join against the OPEN rows only (dimension-sized, not
  * history-sized). */
object Scd {

  private def attrsOf(valueCols: Seq[String]): Column =
    struct(valueCols.map(col): _*)

  /** Build SCD2 history from scratch: one row per CHANGE of the value
    * tuple per key, valid from its first ts (exclusive end = next
    * change's ts; the last change stays open at `endOfTime`).
    * Consecutive updates with identical values collapse. */
  def scd2(updates: DataFrame, keyCols: Seq[String], valueCols: Seq[String],
           tsCol: String, endOfTime: Long): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    val attrs = attrsOf(valueCols)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), attrs)
    updates
      .select((keyCols ++ valueCols).map(col) :+ col(tsCol): _*)
      // null-safe: a NULL attribute value is a real state (e.g. "field
      // cleared"), and the first row's missing lag is always a change —
      // plain =!= would return NULL on either and silently collapse
      .withColumn("_prev", lag(attrs, 1).over(w))
      .where(!(col("_prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to",
        coalesce(lead(col(tsCol), 1).over(w), lit(endOfTime)))
      .select((keyCols ++ valueCols).map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Incremental merge: fold a batch of updates into an existing SCD2
    * history. Open rows whose key changed close at the change's ts and
    * the new version opens; unchanged values are no-ops; unseen keys
    * insert. Updates at or before the open row's `valid_from` are
    * STALE and dropped (late data belongs in a history rebuild, not a
    * forward merge). Closed history passes through untouched, so a
    * daily merge never rewrites the archive — `scd2Merge(history,
    * batch) ≡ scd2(all updates)` (spec-gated). */
  def scd2Merge(current: DataFrame, updates: DataFrame,
                keyCols: Seq[String], valueCols: Seq[String],
                tsCol: String, endOfTime: Long): DataFrame = {
    val closed = current.where(col("valid_to") =!= endOfTime)
    val open = current.where(col("valid_to") === endOfTime)
    // replay each open row as the epoch-starting update of its key
    val replay = open.select((keyCols ++ valueCols).map(col) :+
      col("valid_from").as(tsCol): _*)
    val fresh = updates
      .select((keyCols ++ valueCols).map(col) :+ col(tsCol): _*)
      .join(open.select(keyCols.map(col) :+ col("valid_from").as("_open_from"): _*),
        keyCols, "left")
      .where(col("_open_from").isNull || col(tsCol) > col("_open_from"))
      .drop("_open_from")
    closed.unionByName(
      scd2(replay.unionByName(fresh), keyCols, valueCols, tsCol, endOfTime))
  }

  /** Temporal (as-of) enrichment: each fact row picks up the history
    * version valid at its timestamp — `valid_from <= t < valid_to` —
    * via the bucketed containment join ([[RangeJoin.pointInInterval]],
    * sort-merge-pinned, sub-quadratic). `horizonMs` clamps the open
    * tail (valid_to = endOfTime) to the fact data's horizon so the
    * bucket explode stays data-bounded, never epoch-bounded. Facts
    * need columns `key` and `t`; history columns pass through. */
  def asOf(facts: DataFrame, history: DataFrame,
           keyCols: Seq[String], tsCol: String,
           horizonMs: Long, bucketWidth: Long): DataFrame = {
    require(keyCols.size == 1,
      "asOf composes RangeJoin.pointInInterval, which keys on ONE column; " +
        "concat composite keys first")
    val intervals = history
      .withColumnRenamed(keyCols.head, "key")
      .withColumn("lo", col("valid_from"))
      .withColumn("hi", least(col("valid_to") - 1, lit(horizonMs)))
      .drop("valid_from", "valid_to")
    val points = facts
      .withColumnRenamed(keyCols.head, "key")
      .withColumnRenamed(tsCol, "t")
    RangeJoin.pointInInterval(points, intervals, bucketWidth)
      .drop("lo", "hi")
      .withColumnRenamed("key", keyCols.head)
      .withColumnRenamed("t", tsCol)
  }
}
