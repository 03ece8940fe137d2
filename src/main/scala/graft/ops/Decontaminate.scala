package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test decontamination — the LLM-pipeline step that removes
  * benchmark (eval-set) material from a training corpus before training.
  *
  * Standard n-gram overlap formulation (as published for GPT-3/PaLM
  * training-data dedup): a corpus document is contaminated when more
  * than `threshold` of its distinct n-grams appear anywhere in the
  * benchmark set.
  *
  * Scale shape (100 TB corpus, MB-scale benchmark): the benchmark's
  * distinct n-gram hash set is tiny and BROADCAST; the corpus side is
  * one map-side fused hash pass (the same single-pass native expression
  * the dedup stack uses) + an explode + broadcast-hash semi-join + one
  * shuffle keyed on doc id for the match count. The corpus text itself
  * never shuffles, and corpus cost is independent of benchmark count.
  */
object Decontaminate {

  /** Flag contaminated docs: returns (id, n_matched, n_grams, overlap)
    * for corpus documents whose distinct-n-gram overlap with the
    * benchmark reaches `threshold`. */
  def flag(corpus: DataFrame, benchmark: DataFrame, idCol: String,
           textCol: String, shingleSize: Int = 3,
           threshold: Double = 0.5): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
        Dedup.shingleHashes(col(textCol), shingleSize).as("hs"))
      .where(size(col("hs")) > 0)
    val bench = benchmark
      .select(explode(Dedup.shingleHashes(col(textCol), shingleSize)).as("h"))
      .distinct()
    val ex = c.select(col("id"), size(col("hs")).as("n"), explode(col("hs")).as("h"))
    ex.join(broadcast(bench), "h")
      .groupBy(col("id"), col("n"))
      .agg(count(lit(1)).as("n_matched"))
      .withColumn("overlap", round(col("n_matched").cast("double") / col("n"), 6))
      .where(col("overlap") >= threshold)
      .select(col("id"), col("n_matched"), col("n").cast("long").as("n_grams"),
        col("overlap"))
  }

  /** The complement workflow: corpus minus contaminated docs (the frame
    * a training job would actually read). */
  def clean(corpus: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, shingleSize: Int = 3,
            threshold: Double = 0.5): DataFrame =
    corpus.join(
      flag(corpus, benchmark, idCol, textCol, shingleSize, threshold)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
}
