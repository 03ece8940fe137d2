package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.tsdb.{Sample, XorChunk}

/** Column-level function surface of the engine. Everything here is either
  * a composition of codegen'd built-ins (preferred) or a Scala UDF
  * confined to the ingest path. */
package object functions {

  /** Decode a reference-format XOR chunk (`chunks/xor.go`) into
    * `array<struct<t: long, v: double>>` — the migration-ingest decode
    * step (SURVEY.md §7.3). UDF is acceptable here: ingest-path only,
    * one call per ~120-sample chunk, not in the query hot path. */
  val tsdbDecodeChunk = udf { bytes: Array[Byte] =>
    XorChunk.decode(bytes).map(s => (s.t, s.v))
  }

  def tsdb_decode_chunk(c: Column): Column = tsdbDecodeChunk(c).cast(
    "array<struct<t:long,v:double>>")

  /** Encode `array<struct<t,v>>` (time-sorted) as a reference-format XOR
    * chunk — the write side of the migration path (shipper equivalent). */
  val tsdbEncodeChunk = udf { samples: Seq[org.apache.spark.sql.Row] =>
    XorChunk.encode(samples.map(r => Sample(r.getLong(0), r.getDouble(1))))
  }

  def tsdb_encode_chunk(c: Column): Column = tsdbEncodeChunk(c)

  /** Prometheus-anchored regex match (SURVEY.md §2.2 P2: the reference
    * drops anchoring — we follow Prometheus and anchor `^(?:re)$`). */
  def regex_match_anchored(c: Column, pattern: String): Column =
    c.rlike("^(?:" + pattern + ")$")

  // ---- vector ops over array<float|double> embeddings (codegen'd) ----

  /** Dot product of two equal-length numeric array columns via
    * zip_with + aggregate — stays inside whole-stage codegen (no UDF). */
  def vec_dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def vec_norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine_similarity(a: Column, b: Column): Column = {
    val d = vec_dot(a, b)
    val n = vec_norm(a) * vec_norm(b)
    when(n === 0.0d, 0.0d).otherwise(d / n)
  }

  // ---- text primitives (shared by dedup + text analysis) ----

  /** Lowercased alphanumeric word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** Distinct word-level n-gram shingles ("a b c" style).
    *
    * The token array is bound ONCE via a single-element `transform` lambda:
    * a HOF lambda body re-evaluates every non-lambda-variable subexpression
    * per element, so referencing `tokens(text)` directly inside the index
    * lambdas would re-run the regex tokenizer O(tokens) times per document.
    */
  def shingles(text: Column, n: Int): Column =
    element_at(transform(array(tokens(text)), ts =>
      array_distinct(transform(
        filter(sequence(lit(0), greatest(size(ts) - n, lit(0))),
          i => i + n <= size(ts)),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))), 1)
}
