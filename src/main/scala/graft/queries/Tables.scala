package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver's parquet corpus.
  *
  * `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark only
  * reads as a raw LONG under `spark.sql.legacy.parquet.nanosAsLong` (the
  * conf is dynamic, so we set it on the session at read time — safe to do
  * from inside a query function regardless of which harness built the
  * session). Downstream code uses [[eventsTsMicros]] for a proper
  * TimestampType column (truncated ns→µs, exactly how DuckDB reads the
  * same file) and [[eventsTsMillis]] for epoch-ms longs. */
object Tables {
  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  // NOTE: Column./ is DOUBLE division; epoch-nanos (~1.7e18) exceed
  // double's 2^53 mantissa, so `ts / 1000000` is off by ±1 on edge values.
  // `div` resolves to IntegralDivide — exact on longs.

  /** events.ts (nanos long) → TimestampType at µs precision. */
  def tsMicros(tsNanos: Column): Column =
    timestamp_micros(call_function("div", tsNanos, lit(1000L)))

  /** events.ts (nanos long) → epoch milliseconds. */
  def tsMillis(tsNanos: Column): Column =
    call_function("div", tsNanos, lit(1000000L))
}
