package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling & data-mixing operators for training-data
  * curation. All randomness is an md5 hash of a caller-chosen key (+
  * salt), so samples are REPRODUCIBLE across runs, engines and cluster
  * sizes — the property a 100 TB pipeline needs so a re-run (or an
  * auditor with DuckDB) selects byte-identical subsets. Everything is a
  * scan-side filter or a per-stratum window — no driver-side state.
  */
object Sampling {

  /** Uniform pseudo-random value in [0, 1) derived from key + salt —
    * 60-bit md5 prefix scaled. Codegen'd built-ins only. */
  def hashUnit(key: Column, salt: String): Column =
    Dedup.hash60(concat_ws("", lit(salt), key)) / 1152921504606846976.0d // 2^60

  /** Bernoulli sample: keep rows whose hash-unit < rate. A pure map-side
    * filter — pushes to the scan, shuffles nothing. */
  def bernoulli(df: DataFrame, keyCol: Column, rate: Double,
                salt: String = "graft"): DataFrame =
    df.where(hashUnit(keyCol, salt) < rate)

  /** Per-stratum quota sample: the k rows with the SMALLEST hash in each
    * stratum (deterministic "reservoir"). Orders by the INTEGER 60-bit
    * hash, not the double unit value — double rounding could merge two
    * distinct hashes and make the cross-engine order ambiguous. One
    * shuffle on the stratum; skewed strata cost only their own
    * partition. */
  def stratifiedQuota(df: DataFrame, stratumCol: Column, keyCol: Column,
                      k: Int, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(Dedup.hash60(concat_ws("", lit(salt), keyCol)))
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Per-stratum cap keeping the TOP-k rows by a caller-supplied order
    * (≤N documents per domain/source, best-first) — the "domain cap"
    * that stops crawl-heavy sources from dominating a training mix.
    * Same single-shuffle shape as [[stratifiedQuota]], ranked by
    * quality instead of by hash; the caller must break ties with a
    * unique key so the cap is deterministic across engines. Skewed
    * strata cost only their own partition and spill, never OOM. */
  def capPerStratum(df: DataFrame, stratumCol: Column, k: Int,
                    order: Column*): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(order: _*)
    df.withColumn("cap_rank", row_number().over(w))
      .where(col("cap_rank") <= k)
  }

  /** Deterministic train/val/test split: each row lands in exactly one
    * named bucket by hash range over the unit interval — reproducible
    * across runs, engines and cluster sizes, and STABLE UNDER CORPUS
    * GROWTH (a doc's assignment depends only on its own key, so adding
    * data never reshuffles existing splits — the property that keeps a
    * held-out set held out across dataset versions). Pure map-side.
    * `splits` = (name, weight); weights need not sum to 1 — they are
    * normalized. */
  def split(df: DataFrame, keyCol: Column, splits: Seq[(String, Double)],
            salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "bad split weights")
    val total = splits.map(_._2).sum
    val u = hashUnit(keyCol, salt)
    val (assign, _) = splits.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cum), (name, wgt)) =>
        val hi = cum + wgt / total
        (when(u >= cum && u < hi, lit(name)).otherwise(acc), hi)
    }
    // float edge: u == normalized total is impossible (u < 1), but the
    // last bucket's hi may fall just below 1 — close the interval
    df.withColumn("split",
      coalesce(assign, lit(splits.last._1)))
  }

  /** Leakage-safe split: rows sharing a group (a near-dup cluster, a
    * repository, a domain) are assigned as a UNIT — the hash key is
    * the group id, with the row's own key as the singleton fallback
    * (null group) — so a near-duplicate of a held-out document can
    * never land in train. Everything else is [[split]]: map-side,
    * reproducible, stable under corpus growth — now at group
    * granularity (new members of an existing group inherit its split). */
  def splitByGroup(df: DataFrame, keyCol: Column, groupCol: Column,
                   splits: Seq[(String, Double)],
                   salt: String = "graft"): DataFrame =
    split(df, coalesce(groupCol, keyCol), splits, salt)

  /** Training-mixture plan: given per-row token counts and target
    * mixture weights, the per-source sampling table a data recipe
    * publishes — available tokens, target share, target tokens under
    * `budgetTokens`, and `epochs` = target/available (>1 means the
    * source repeats, the up-weighting pattern of public LLM recipes).
    * Sources absent from `weights` get weight 0 (excluded); weights
    * normalize over the GIVEN map, so a weighted source missing from
    * the corpus still consumes its share of the budget (epochs null).
    * One map-side-combined aggregation; the weight table broadcasts. */
  def mixturePlan(df: DataFrame, stratumCol: Column, tokensCol: Column,
                  weights: Seq[(String, Double)],
                  budgetTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.exists(_._2 > 0), "need non-negative weights, at least one > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val total = weights.map(_._2).sum
    val wdf = weights.map { case (s, w) => (s, w / total) }
      .toDF("source", "weight")
    val avail = df.groupBy(stratumCol.as("source"))
      .agg(sum(tokensCol).cast("long").as("avail_tokens"),
        count(lit(1)).as("n_docs"))
    wdf.join(avail, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("avail_tokens"), lit(0L)).as("avail_tokens"),
        round(col("weight"), 6).as("weight"),
        round(col("weight") * budgetTokens).cast("long").as("target_tokens"),
        when(col("avail_tokens") > 0,
          round(col("weight") * budgetTokens / col("avail_tokens"), 4))
          .as("epochs"))
  }

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis A-ES scheme made deterministic: each row draws
    * its reproducible uniform u from the md5 hash and ranks by the key
    * u^(1/w) (largest keep), which samples proportional to weight
    * without replacement. Rank keys are rounded to 6 decimals (ulp
    * armor for the cross-engine pow) with the row key as tie-break, so
    * an external engine reproduces the exact subset. Same single
    * stratum-shuffle shape as [[stratifiedQuota]]; weights must be
    * strictly positive. Use for quality-weighted corpus subsetting:
    * high-quality docs are favored, but every doc keeps a nonzero,
    * reproducible chance. */
  def weightedQuota(df: DataFrame, stratumCol: Column, keyCol: Column,
                    weightCol: Column, k: Int,
                    salt: String = "graft"): DataFrame = {
    val rankKey = round(pow(hashUnit(keyCol, salt), lit(1.0) / weightCol), 6)
    val w = Window.partitionBy(stratumCol)
      .orderBy(rankKey.desc, keyCol)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }

  /** Temperature-scaled source mixing — the T-sampling of multilingual /
    * multi-source LLM recipes (mC4 §3.1, PaLM): output share of stratum
    * s ∝ n_s^(1/T), realized by DOWNSAMPLING only:
    * rate_s = n_s^(1/T−1) / max_s'(n_s'^(1/T−1)), so the stratum with
    * the largest factor (the SMALLEST one when T > 1, the largest when
    * T < 1) keeps everything and nothing is upsampled. T > 1 flattens a
    * skewed source histogram toward uniform, T = 1 is the identity,
    * T < 1 sharpens. Rates derive from the observed counts in one tiny
    * aggregation (k strata rows, broadcast back — the corpus is scanned
    * once for counts and once for the filter; cache the input when both
    * passes matter). Rates are rounded to 6 decimals so an external
    * engine derives bit-identical thresholds; membership stays
    * per-key deterministic like every sampler here. */
  def temperatureMix(df: DataFrame, stratumCol: Column, keyCol: Column,
                     temperature: Double, salt: String = "graft"): DataFrame = {
    require(temperature > 0, "temperature must be > 0")
    // collision-proof internal names: a caller's own "stratum"/"x"
    // column must neither make the join condition ambiguous nor get
    // silently dropped (only `mix_rate` is part of the output contract)
    val factors = df.groupBy(stratumCol.as("__tm_stratum"))
      .agg(count(lit(1)).as("__tm_n"))
      .select(col("__tm_stratum"),
        pow(col("__tm_n").cast("double"), 1.0 / temperature - 1.0).as("__tm_x"))
    val rates = factors
      .crossJoin(broadcast(factors.agg(max(col("__tm_x")).as("__tm_xmax"))))
      .select(col("__tm_stratum"),
        round(col("__tm_x") / col("__tm_xmax"), 6).as("mix_rate"))
    df.join(broadcast(rates), stratumCol === col("__tm_stratum"))
      .where(hashUnit(keyCol, salt) < col("mix_rate"))
      .drop("__tm_stratum")
  }

  /** Mixture weighting: per-stratum Bernoulli rates (e.g. up/down-weight
    * sources when composing a training mix). Unlisted strata drop out. */
  def weightedMix(df: DataFrame, stratumCol: Column, keyCol: Column,
                  rates: Map[String, Double], salt: String = "graft"): DataFrame = {
    val rate = rates.foldLeft(lit(0.0d)) { case (acc, (s, r)) =>
      when(stratumCol === s, lit(r)).otherwise(acc)
    }
    df.where(hashUnit(keyCol, salt) < rate)
  }
}
