package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence chunking and packing — the step between a curated corpus
  * and a training run: long documents split into fixed-size token
  * windows (with optional overlap), short documents packed into
  * near-budget sequences.
  *
  * Scale shape: chunking is a bounded map-side explode (a document
  * yields ⌈tokens/stride⌉ chunks — cost scales with corpus tokens, no
  * shuffle at all); packing is one window pass over a deterministic
  * document order per group (one shuffle on the group key), using a
  * cumulative-quota rule so the assignment is a closed-form expression
  * — no sequential driver loop, no UDF.
  */
object Packing {

  /** Split each document into token windows of `size` tokens advancing
    * by `stride` (`stride == size` → disjoint chunks; `stride < size` →
    * overlapping). Emits (id, chunk_id, n_tokens, chunk). Documents
    * shorter than one stride still emit chunk 0. Whitespace
    * tokenization keeps the op codegen-friendly; swap the splitter for
    * a real tokenizer at the same call site. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val toks = split(col(textCol), " ")
    // chunk starts: 0, stride, 2·stride, ... while start < n (at least
    // one chunk even for empty text)
    val nChunks = greatest(
      ceil(size(toks).cast("double") / stride).cast("long"), lit(1L))
    df.select(col(idCol).as("id"), toks.as("toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col("id"), col("chunk_id"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("ctoks"))
      .select(col("id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk"))
  }

  /** Length-bucketed batching plan — the inference/serving counterpart
    * of [[pack]]: sequences padded to their bucket's ceiling instead of
    * a global max, so padding waste is bounded by the bucket width.
    * Each document lands in bucket `ceil(n_tokens / width) · width`;
    * per bucket the plan reports the document count, real token mass,
    * padded token mass (docs × bucket ceiling) and the padding waste
    * ratio. One map-side-combined aggregation — the per-bucket output
    * is `distinct lengths / width` rows regardless of corpus size. */
  def lengthBuckets(df: DataFrame, idCol: String, tokensCol: Column,
                    width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val n = tokensCol.cast("long")
    // ceil to the bucket boundary; empty docs still occupy one width
    val bucket = greatest(
      call_function("div", n + (width - 1), lit(width)) * width, lit(width))
    df.select(col(idCol).as("id"), n.as("n_tokens"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("real_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste_ratio",
        round(lit(1.0d) - col("real_tokens").cast("double") /
          col("padded_tokens"), 6))
  }

  /** Pack documents into ~`budget`-token training sequences per group
    * (e.g. per source): documents are laid out in a DETERMINISTIC
    * order (ascending id) as one concatenated token stream, the stream
    * is cut at budget boundaries, and a document belongs to the pack
    * its FIRST token lands in — the standard streaming packer (packs
    * fill to the budget, overshooting by at most one document),
    * expressed as a window cumsum so the whole assignment is one pass,
    * no sequential loop, no UDF. Emits (group, id, n_tokens, pack_id,
    * pack_pos). */
  def pack(df: DataFrame, groupCol: Column, idCol: String,
           tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val base = df.select(groupCol.as("grp"), col(idCol).as("id"),
      tokensCol.cast("long").as("n_tokens"))
    // cumulative tokens including this doc; the pack index is how many
    // full budgets the PRECEDING documents consumed
    base
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / budget).cast("long"))
      .withColumn("pack_pos",
        (row_number().over(Window.partitionBy(col("grp"), col("pack_id"))
          .orderBy(col("id"))) - 1).cast("long"))
      .select(col("grp"), col("id"), col("n_tokens"), col("pack_id"), col("pack_pos"))
  }
}
