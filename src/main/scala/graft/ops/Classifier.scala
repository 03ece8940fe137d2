package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-n-gram Naive-Bayes document classifier — the fastText-style
  * linear quality filter every public curation pipeline trains (GPT-3's
  * WebText-vs-CommonCrawl filter, CCNet, DataComp-LM's fastText stage):
  * fit a multinomial NB model over hashed unigram+bigram features on
  * small labeled seed sets, then score an arbitrarily large corpus with
  * one broadcast join.
  *
  * The gram/bucket machinery is shared with [[Dsir]] (same tokenizer,
  * same 60-bit md5 buckets), and the per-gram weight is the same
  * add-alpha log-likelihood ratio — what NB adds over DSIR's importance
  * weight is the CLASS PRIOR bias term, calibrated probabilities, and a
  * persistable model (train once on the driver's seeds, score 100 TB
  * forever after).
  *
  * 100 TB shape: training aggregates each seed corpus to ≤ `buckets`
  * rows (one map-side-combined shuffle each) plus two driver scalars
  * (the doc-count priors); the model is a ≤ `buckets`-row broadcast
  * table; scoring is a map-side gram explode into that broadcast join
  * and one doc-keyed partial-aggregated shuffle — document text never
  * shuffles, and zero-gram documents are kept (scored on the prior
  * alone) via the final left join back to the id spine.
  */
object Classifier {

  /** A trained model: the per-bucket log-likelihood weight table
    * `weights(b, w)` with `w = ln p(b|pos) − ln p(b|neg)` (add-`alpha`
    * smoothed over `buckets` outcomes), the log-prior-odds `bias`, and
    * the weight an UNSEEN bucket takes (`defaultW` — only reachable when
    * scoring text disjoint from both seed corpora). */
  final case class NbModel(weights: DataFrame, bias: Double,
                           defaultW: Double, buckets: Int) {
    /** Persist the model: the weight table as parquet plus a one-row
      * `meta` parquet of the scalars — a trained filter is an artifact,
      * shipped to the scoring cluster, not refit there. */
    def save(dir: String): Unit = {
      weights.coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
      val s = weights.sparkSession
      import s.implicits._
      Seq((bias, defaultW, buckets)).toDF("bias", "default_w", "buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  def load(spark: SparkSession, dir: String): NbModel = {
    val m = spark.read.parquet(s"$dir/meta").head()
    NbModel(spark.read.parquet(s"$dir/weights"),
      m.getAs[Double]("bias"), m.getAs[Double]("default_w"),
      m.getAs[Int]("buckets"))
  }

  /** Fit multinomial NB on two labeled seed corpora. Driver state: four
    * scalars (two gram-mass normalizers, two doc-count priors). */
  def trainNb(pos: DataFrame, neg: DataFrame, textCol: String,
              buckets: Int = 4096, alpha: Double = 1.0): NbModel = {
    require(buckets >= 2 && alpha > 0, "need buckets >= 2, alpha > 0")
    val pc = Dsir.bucketCounts(pos, textCol, buckets)
    val nc = Dsir.bucketCounts(neg, textCol, buckets)
    def mass(c: DataFrame) =
      c.agg(coalesce(sum("c"), lit(0L))).head().getLong(0).toDouble
    val (pn, qn) = (mass(pc), mass(nc))
    val (dp, dn) = (pos.count().toDouble, neg.count().toDouble)
    val weights = pc.withColumnRenamed("c", "cp")
      .join(nc.withColumnRenamed("c", "cn"), Seq("b"), "full_outer")
      .select(col("b"),
        (log((coalesce(col("cp"), lit(0L)) + alpha) / (pn + alpha * buckets)) -
         log((coalesce(col("cn"), lit(0L)) + alpha) / (qn + alpha * buckets)))
          .as("w"))
    val bias = math.log((dp + alpha) / (dp + dn + 2 * alpha)) -
      math.log((dn + alpha) / (dp + dn + 2 * alpha))
    val defaultW = math.log(alpha / (pn + alpha * buckets)) -
      math.log(alpha / (qn + alpha * buckets))
    NbModel(weights, bias, defaultW, buckets)
  }

  /** The model's weight table as a dense array (one slot per bucket,
    * unseen slots pre-filled with `defaultW`) — ≤ `buckets` rows to the
    * driver, the form the fused scorer indexes. */
  def denseWeights(model: NbModel): Array[Double] = {
    val arr = Array.fill(model.buckets)(model.defaultW)
    model.weights.collect().foreach { r =>
      arr(r.getAs[Long]("b").toInt) = r.getAs[Double]("w")
    }
    arr
  }

  /** Score a corpus: `(id, n_grams, logodds, p_pos)`. `logodds` is the
    * NB posterior log-odds `bias + Σ_grams w_b`, rounded to 6 places so
    * both engines agree on the value AND anything ranked by it; `p_pos`
    * is the calibrated posterior `sigmoid(logodds)` computed FROM the
    * rounded log-odds (a consistent function of an agreed value) and
    * rounded likewise. Documents with zero grams survive with
    * `n_grams = 0` and the prior-only score.
    *
    * Scoring is the fused codegen'd [[graft.functions.NbScoreExpr]] —
    * one doc-local pass indexing the dense weight array, so a document
    * never explodes its 2n−1 gram rows through a join and the corpus
    * crosses no shuffle at all. [[scoreViaJoin]] is the
    * explode-and-join formulation the fused path is spec-gated
    * against. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: NbModel): DataFrame = {
    val s = graft.functions.MinhashExpressions.nb_score(
      col(textCol), denseWeights(model))
    val logodds = round(lit(model.bias) + coalesce(col("s.gram_sum"), lit(0d)), 6)
    df.select(col(idCol).as("id"), s.as("s"))
      .select(col("id"), coalesce(col("s.n_grams"), lit(0L)).as("n_grams"),
        logodds.as("logodds"),
        round(lit(1d) / (lit(1d) + exp(-logodds)), 6).as("p_pos"))
  }

  /** The explode → broadcast-join → per-doc aggregate formulation of
    * [[score]] (shared feature machinery with [[Dsir]]) — kept as the
    * cross-check the fused expression is spec-gated against, and as
    * the no-driver-collect fallback. */
  def scoreViaJoin(df: DataFrame, idCol: String, textCol: String,
                   model: NbModel): DataFrame = {
    val perDoc = Dsir.features(df, idCol, textCol, model.buckets)
      .join(broadcast(model.weights), Seq("b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("w"), lit(model.defaultW))).as("gram_sum"))
    val logodds = round(lit(model.bias) + coalesce(col("gram_sum"), lit(0d)), 6)
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        logodds.as("logodds"),
        round(lit(1d) / (lit(1d) + exp(-logodds)), 6).as("p_pos"))
  }

  /** One-shot convenience: train on the seeds, score `corpus`. */
  def trainScore(pos: DataFrame, neg: DataFrame, corpus: DataFrame,
                 idCol: String, textCol: String,
                 buckets: Int = 4096, alpha: Double = 1.0): DataFrame =
    score(corpus, idCol, textCol, trainNb(pos, neg, textCol, buckets, alpha))
}
