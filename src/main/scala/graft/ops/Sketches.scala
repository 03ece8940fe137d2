package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic cardinality sketching.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is
  * implementation-specific — its estimates can't be cross-checked by
  * another engine. The KMV (k-minimum-values / bottom-k) sketch over the
  * md5 hash space IS cross-checkable: the k smallest hashes of a set are
  * a pure function of the data, so the estimate
  * `(k-1) / F(h_k)` (with `F` the k-th smallest hash scaled to [0,1))
  * is bit-reproducible by DuckDB — an approximate operator with an
  * EXACT oracle, like the SQ/PQ/kmeans paths.
  *
  * Scale shape: one shuffle keyed on the group. The `row_number <= k`
  * window compiles to WindowGroupLimit with a PARTIAL pass — each map
  * task forwards at most k rows per group to the exchange, so the
  * shuffle carries O(groups × k × partitions) rows, never the full
  * distinct stream. KMV sketches are also mergeable (union = k smallest
  * of the concatenation), which is exactly what the partial limit
  * exploits.
  */
object Sketches {

  /** Per-group KMV distinct-count estimate of `keyCol`, k minimum
    * 60-bit md5 values. Exact (returns the true count) when a group has
    * fewer than k distinct keys. NULL keys are excluded (COUNT DISTINCT
    * semantics — and the portable contract: `concat_ws` would silently
    * hash a null key as the bare salt while SQL `'salt' || key` yields
    * NULL, so the two engines would diverge on null input). Output:
    * (grp, est). */
  def kmvDistinct(df: DataFrame, groupCol: Column, keyCol: Column,
                  k: Int, salt: String = "kmv"): DataFrame =
    kmvEstimateFromHashes(kmvBottomK(df, groupCol, keyCol, k, salt), k)

  /** The hash stage of [[kmvDistinct]]: the ≤ k smallest distinct
    * 60-bit md5 values per group — (grp, h). Bottom-k sets are a
    * monoid: the k smallest of a union are among the union of each
    * part's k smallest, which is what makes the sketch mergeable
    * across partitions, shards and micro-batches
    * ([[graft.streaming.StreamIngest.kmvHashStream]]). */
  def kmvBottomK(df: DataFrame, groupCol: Column, keyCol: Column,
                 k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = Dedup.hash60(concat_ws("", lit(salt), keyCol))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    df.where(keyCol.isNotNull).select(groupCol.as("grp"), h.as("h")).distinct()
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("grp"), col("h"))
  }

  /** Finalize (grp, h) hash partials into (grp, est): dedupe, re-take
    * the k smallest (a union of bottom-k partials can hold more), then
    * the KMV estimator `(k-1)/F(h_k)` — or the exact count when a group
    * holds fewer than k distinct hashes. */
  def kmvEstimateFromHashes(hashes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    hashes.distinct()
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(1152921504606846976.0d) / col("hk"),
            2)).as("est"))
  }

  // ---- deterministic register-level HyperLogLog ----------------------

  /** HLL bias-correction constant alpha_m (Flajolet et al. 2007). Kept
    * as a Double so the SAME literal reaches both engines (Double
    * .toString round-trips). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-group deterministic HyperLogLog distinct-count estimate:
    * classic HLL over md5-derived registers, bit-reproducible by any
    * engine with md5 (unlike Spark's HLL++, whose register layout is
    * implementation-private — `approx_count_distinct` can never be
    * cross-checked).
    *
    * Register index = 60-bit md5 slice mod `m`; rank = leading zeros of
    * an INDEPENDENT 32-bit md5 slice + 1 (`33 - bitlength`, 33 for 0).
    * The harmonic-mean denominator is summed as EXACT integers — each
    * register contributes `2^(33 - rank)` (and each empty register
    * `2^33`), so the only floating-point steps are one literal/integer
    * division and (in the small-range branch) one `ln`, both absorbed
    * by round(_, 2). Summation order cannot matter: integer addition is
    * associative, which is what makes this portable where a
    * `sum(pow(2.0, -rank))` formulation would not be.
    *
    * Scale shape: ONE shuffle keyed (grp, register) with a map-side
    * partial max — the exchange carries at most m rows per group per
    * partition, never the distinct stream. Registers are mergeable by
    * max, the same property HLL++ itself exploits.
    *
    * Output: (grp, est). NULL keys excluded (COUNT DISTINCT
    * semantics, matching [[kmvDistinct]]). */
  def hllDistinct(df: DataFrame, groupCol: Column, keyCol: Column,
                  m: Int = 64, salt: String = "hll"): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol, m, salt), m)

  /** The register stage of [[hllDistinct]]: per (group, register index)
    * max rank — (grp, idx, mj). Registers are a MAX-monoid: partials
    * from any split of the data (partitions, micro-batches, shards)
    * merge by `max(mj)` into exactly the registers of the union, which
    * is what makes the sketch streamable
    * ([[graft.streaming.StreamIngest.hllRegisterStream]]) and
    * map-side combinable. */
  def hllRegisters(df: DataFrame, groupCol: Column, keyCol: Column,
                   m: Int, salt: String = "hll"): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val md5hex = md5(concat_ws("", lit(salt), keyCol))
    val idx = pmod(conv(substring(md5hex, 1, 15), 16, 10).cast("long"), lit(m))
    val v32 = conv(substring(md5hex, 17, 8), 16, 10).cast("long")
    val rank = when(col("v") === 0, lit(33))
      .otherwise(lit(33) - length(bin(col("v"))))
    df.where(keyCol.isNotNull)
      .select(groupCol.as("grp"), idx.as("idx"), v32.as("v"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(rank).as("mj"))
  }

  /** Finalize (grp, idx, mj) registers into (grp, est) — see
    * [[hllDistinct]] for the determinism contract. */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    // numerator alpha * m^2 * 2^33 as ONE driver-computed literal: the
    // whole estimate is then literal / exact-integer — a single
    // float division, bit-identical in any IEEE-754 engine
    val numer = hllAlpha(m) * m * m * 8589934592.0d
    registers
      .groupBy(col("grp"))
      .agg(
        // present registers: 2^(33 - mj) each, exact longs (the DSL
        // shiftleft only takes a literal shift, so SQL form)
        sum(expr("shiftleft(1L, 33 - mj)")).as("z_present"),
        count(lit(1)).as("n_regs"))
      .select(col("grp"),
        // empty registers contribute 2^33 (rank 0) each
        (col("z_present") + (lit(m.toLong) - col("n_regs")) * lit(8589934592L)).as("z"),
        (lit(m.toLong) - col("n_regs")).as("v_zero"))
      .select(col("grp"),
        round(
          when(lit(numer) / col("z") <= lit(2.5 * m) && col("v_zero") > 0,
            // small-range (linear counting) correction: m * ln(m / V)
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(lit(numer) / col("z")), 2).as("est"))
  }

  // ---- deterministic count-min frequency sketch -----------------------

  /** The counter stage of the count-min sketch: `depth` md5-derived hash
    * rows × `width` columns of integer counts — (r, c, cnt), at most
    * depth × width rows however large the input. Counters are a
    * SUM-monoid (mergeable across partitions/batches, map-side
    * combined), and every value is an integer count, so estimates are
    * exactly cross-checkable — frequency's counterpart to the HLL/KMV
    * cardinality and histogram rank sketches above. */
  def cmCounters(df: DataFrame, keyCol: Column, depth: Int, width: Int,
                 salt: String = "cm"): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth >= 1, width >= 2")
    df.where(keyCol.isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), keyCol.as("k"))
      .select(col("r"),
        pmod(Dedup.hash60(concat_ws("", lit(salt), col("r"), col("k"))),
          lit(width)).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Count-min frequency estimates for `probes` (a small frame with a
    * `key` column, broadcast): est(k) = min over rows r of
    * counter[r][h_r(k)] — an overestimate by at most the collision mass,
    * never an underestimate. Output: (key, est). */
  def cmEstimate(counters: DataFrame, probes: DataFrame,
                 depth: Int, width: Int, salt: String = "cm"): DataFrame = {
    val merged = counters.groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))
    val cells = broadcast(probes
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("key"), col("r"),
        pmod(Dedup.hash60(concat_ws("", lit(salt), col("r"), col("key"))),
          lit(width)).as("c")))
    cells.join(merged, Seq("r", "c"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** One-shot count-min: build + probe. */
  def cmFrequency(df: DataFrame, keyCol: Column, probes: DataFrame,
                  depth: Int, width: Int, salt: String = "cm"): DataFrame =
    cmEstimate(cmCounters(df, keyCol, depth, width, salt),
      probes, depth, width, salt)

  // ---- deterministic Bloom membership filter --------------------------

  /** The bit stage of a Bloom filter, as a SPARSE (word, bits) bitmap
    * table: each key sets `numHashes` md5-derived bit positions in a
    * `widthBits`-wide bitmap packed 62 bits
    * per 64-bit word (shifts past 61 overflow checked engines) — at
    * most ceil(widthBits/62) rows however large the input, and words merge by
    * BIT_OR (an idempotent monoid: re-adding a key, a partition or a
    * replayed micro-batch changes nothing). Deterministic md5 positions
    * + integer bit arithmetic → exactly cross-checkable, like the rest
    * of the sketch family. */
  /** Kirsch-Mitzenmacher double hashing: ONE md5 per key yields two
    * independent 60-bit slices h1/h2, and position j is
    * (h1 + j*h2) mod width — 5 positions for the price of one hash,
    * with the same false-positive guarantees. numHashes ≤ 8 keeps
    * h1 + j*h2 < 2^63 (no overflow in checked engines). */
  private def bloomSlices(keyCol: Column, salt: String): (Column, Column) = {
    val md5hex = md5(concat_ws("", lit(salt), keyCol))
    (conv(substring(md5hex, 1, 15), 16, 10).cast("long"),
      conv(substring(md5hex, 17, 15), 16, 10).cast("long"))
  }

  def bloomBits(df: DataFrame, keyCol: Column, widthBits: Int,
                numHashes: Int, salt: String = "bloom"): DataFrame = {
    require(widthBits >= 62, "widthBits must be >= 62")
    require(numHashes >= 1 && numHashes <= 8,
      "numHashes must be in [1, 8] (overflow-free double hashing)")
    val (h1, h2) = bloomSlices(keyCol, salt)
    df.where(keyCol.isNotNull)
      .select(h1.as("h1"), h2.as("h2"))
      .select(explode(sequence(lit(0), lit(numHashes - 1))).as("j"),
        col("h1"), col("h2"))
      .select(pmod(col("h1") + col("j") * col("h2"), lit(widthBits)).as("p"))
      // 62 bits per word: shift 62/63 overflows engines with CHECKED
      // shifts (DuckDB), and 62 keeps every word positive everywhere
      .select(expr("p div 62").as("word"),
        expr("shiftleft(1L, cast(p % 62 as int))").as("m"))
      .groupBy(col("word")).agg(expr("bit_or(m)").as("bits"))
  }

  /** Membership test for `probes` (small frame with a `key` column,
    * broadcast) against a [[bloomBits]] bitmap: `present` is true iff
    * ALL of the key's bits are set — no false negatives ever; false
    * positives bounded by the standard (1 - e^(-kn/m))^k. Bitmap
    * partials for the same word are OR-merged first, so unioned /
    * streamed stores feed in directly. Output: (key, present). */
  def bloomContains(bits: DataFrame, probes: DataFrame, widthBits: Int,
                    numHashes: Int, salt: String = "bloom"): DataFrame = {
    val merged = bits.groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))
    val (h1, h2) = bloomSlices(col("key"), salt)
    val cells = broadcast(probes
      .select(col("key"), h1.as("h1"), h2.as("h2"))
      .select(col("key"), explode(sequence(lit(0), lit(numHashes - 1))).as("j"),
        col("h1"), col("h2"))
      .select(col("key"),
        pmod(col("h1") + col("j") * col("h2"), lit(widthBits)).as("p"))
      .select(col("key"), expr("p div 62").as("word"),
        expr("shiftleft(1L, cast(p % 62 as int))").as("m")))
    cells.join(merged, Seq("word"), "left")
      .groupBy(col("key"))
      .agg(expr("bool_and((coalesce(bits, 0L) & m) != 0)").as("present"))
  }

  /** One-shot Bloom: build + probe. */
  def bloomMembership(df: DataFrame, keyCol: Column, probes: DataFrame,
                      widthBits: Int, numHashes: Int,
                      salt: String = "bloom"): DataFrame =
    bloomContains(bloomBits(df, keyCol, widthBits, numHashes, salt),
      probes, widthBits, numHashes, salt)

  // ---- deterministic histogram quantiles ------------------------------

  /** Per-group approximate quantiles from a fixed-width histogram — the
    * deterministic, cross-checkable alternative to Spark's
    * `percentile_approx` (GK sketch, implementation-private layout).
    * Error is bounded by the bin width; histograms are mergeable by
    * addition, so the shuffle carries at most `nBins` counts per group
    * per partition (map-side combined) — the same partial-merge property
    * the KMV/HLL sketches above exploit, here for ranks.
    *
    * Estimate: inverse CDF over cumulative bin counts with linear
    * interpolation inside the selected bin (`lo + width * (bin + (q*n -
    * below) / cnt)`). Every step is count arithmetic + IEEE-exact
    * +,-,*,/ — when `(hi-lo)/nBins` is a power of two the bin assignment
    * itself is exact — so the oracle matches bit-for-bit after
    * round(_, 6). Values outside [lo, hi) clamp into the edge bins.
    * Quantiles must lie in (0, 1]. Output: (grp, q, est), one row per
    * group × quantile. */
  def histQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
                    lo: Double, hi: Double, nBins: Int,
                    qs: Seq[Double]): DataFrame =
    histQuantilesFromCounts(
      histCounts(df, groupCol, valueCol, lo, hi, nBins), nBins, lo, hi, qs)

  /** The count stage of [[histQuantiles]]: per-(group, bin) counts —
    * (grp, bin, cnt). Histograms are a SUM-monoid: counts from any
    * split of the data (partitions, micro-batches, shards) add into
    * exactly the union's histogram, which is what makes the sketch
    * map-side combinable and streamable
    * ([[graft.streaming.StreamIngest.histCountStream]]). */
  def histCounts(df: DataFrame, groupCol: Column, valueCol: Column,
                 lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, "need nBins >= 2 and hi > lo")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((valueCol - lit(lo)) / lit(width)), lit(0)),
      lit(nBins - 1))
    df.where(valueCol.isNotNull)
      .select(groupCol.as("grp"), bin.cast("long").as("bin"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Finalize (grp, bin, cnt) count partials into (grp, q, est) — see
    * [[histQuantiles]] for the estimator and determinism contract.
    * Partial rows for the same (grp, bin) are summed first, so merged
    * stores feed in directly. */
  def histQuantilesFromCounts(countsIn: DataFrame, nBins: Int,
                              lo: Double, hi: Double,
                              qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val width = (hi - lo) / nBins
    val counts = countsIn.groupBy(col("grp"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
    val qlits = array(qs.map(lit): _*)
    val target = col("q") * col("n")
    // cum is strictly increasing over a group's (cnt > 0) bins, so
    // exactly one bin satisfies below < target <= cum
    cum.select(col("grp"), col("bin"), col("cnt"), col("cum"), col("n"),
        explode(qlits).as("q"))
      .where(col("cum") >= target && (col("cum") - col("cnt")) < target)
      .select(col("grp"), col("q"),
        round(lit(lo) + lit(width) * (col("bin") +
          (target - (col("cum") - col("cnt"))) / col("cnt")), 6).as("est"))
  }

  /** EXACT per-group top-k frequent keys with BOUNDED shuffle — the
    * two-pass heavy-hitters shape for key spaces too large to groupBy
    * whole (token vocabularies, URLs, user ids at 100 TB):
    *
    *  1. each partition runs a Misra-Gries summary of size `m` per
    *     group (bounded memory, amortized O(1) per row) and nominates
    *     its surviving keys — by the MG retention bound the union of
    *     nominations contains EVERY key with global frequency > N/m;
    *  2. an exact recount over the candidate semi-join (broadcast —
    *     ≤ partitions × groups × m keys) ranks them and keeps k.
    *
    * The result equals the true top-k whenever the k-th frequency
    * exceeds N/m — size `m` to the heaviness you care about (the
    * documented contract; at m=4096 a key must carry >0.024% of the
    * stream to be rankable). Ties break lexicographically, so the
    * output is deterministic however the input is partitioned — which
    * is what lets an approximate-candidate pass carry an exact oracle.
    * Output: (grp, key, cnt, rnk ≤ k). */
  def heavyHitters(df: DataFrame, groupCol: Column, keyCol: Column,
                   k: Int, m: Int = 4096): DataFrame = {
    val pairs = df
      .select(groupCol.cast("string").as("grp"), keyCol.cast("string").as("key"))
      .where(col("key").isNotNull)
    recountTopK(pairs, mgCandidates(df, groupCol, keyCol, m), k)
  }

  /** The nomination half of [[heavyHitters]]: per-partition Misra-Gries
    * summaries of capacity `m`, emitted as the distinct (grp, key)
    * candidate set. The MG guarantee — any key whose frequency in the
    * scanned rows exceeds rows/m survives the summary — makes this set a
    * SUPERSET of every key heavier than rows/m. Exposed separately
    * because the set is union-mergeable across splits of the data (a key
    * heavier than N/m over a union of batches must, by pigeonhole,
    * exceed its batch's threshold in at least one batch), which is what
    * the streaming form builds on. */
  def mgCandidates(df: DataFrame, groupCol: Column, keyCol: Column,
                   m: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df
      .select(groupCol.cast("string").as("grp"), keyCol.cast("string").as("key"))
      .where(col("key").isNotNull)
    pairs.as[(String, String)].mapPartitions { it =>
      val perGroup = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.HashMap[String, Long]]
      it.foreach { case (g, key) =>
        val mg = perGroup.getOrElseUpdate(g,
          scala.collection.mutable.HashMap.empty[String, Long])
        mg.get(key) match {
          case Some(c) => mg.update(key, c + 1)
          case None if mg.size < m => mg.update(key, 1L)
          case None => // Misra-Gries step: decrement all, drop zeros
            val dead = List.newBuilder[String]
            mg.foreachEntry((kk, c) =>
              if (c == 1L) dead += kk else mg.update(kk, c - 1))
            dead.result().foreach(mg.remove)
        }
      }
      perGroup.iterator.flatMap { case (g, mg) => mg.keysIterator.map((g, _)) }
    }.toDF("grp", "key").distinct()
  }

  /** The exact half of [[heavyHitters]]: recount the candidate semi-join
    * over the full `(grp, key)` pair stream and keep the top k per group
    * (deterministic lexicographic tie-break). Any candidate SUPERSET of
    * the true heavies yields the identical result, so batch and
    * streaming candidate generation interchange freely. */
  private[graft] def recountTopK(pairs: DataFrame, candidates: DataFrame,
                                 k: Int): DataFrame =
    pairs.join(broadcast(candidates), Seq("grp", "key"), "left_semi")
      .groupBy(col("grp"), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("grp"))
          .orderBy(col("cnt").desc, col("key"))))
      .where(col("rnk") <= k)

  // ---- deterministic bottom-k sample quantile sketch ------------------

  /** The sample stage of the quantile sketch: per group, the `s` rows
    * whose 60-bit md5 row hash is smallest — (grp, h, v). Hashing a
    * unique row id gives a uniform-without-replacement sample that is a
    * PURE FUNCTION of the data (bottom-k sampling, Cohen & Kaplan 2007),
    * so unlike `percentile_approx` (GK, accumulation-order-dependent)
    * the sketch and everything derived from it is bit-reproducible by
    * any engine with md5 — the rank-query counterpart of the KMV/HLL
    * cardinality sketches above, with the SAME merge law: bottom-k sets
    * are a monoid (the s smallest of a union are among the union of
    * each part's s smallest), so partials from partitions, shards or
    * micro-batches merge by re-taking bottom-s
    * ([[graft.streaming.StreamIngest.qsampleStream]]).
    *
    * Scale shape: one shuffle keyed on the group, bounded by
    * CONSTRUCTION — the bottom-s heap is a custom
    * TypedImperativeAggregate
    * ([[graft.functions.SampleAggregates.BottomKSampleAgg]]) whose
    * partial mode folds each partition into a ≤ s-entry heap before the
    * exchange, so at most one serialized heap per (group × partition)
    * crosses the wire however large the input. (A `row_number <= s`
    * window only gets its partial WindowGroupLimit pass when s is under
    * Spark's 1000-row rule threshold — useless at real sketch sizes.)
    *
    * Rank guarantee (DKW over a simple random sample): every sample
    * quantile is within ε = sqrt(ln(2/δ)/(2s)) of the true rank with
    * probability 1-δ — s=4096 gives ±2.1% rank error at δ=1e-6,
    * independent of group size. NULL ids/values excluded (quantile
    * semantics ignore NULLs; the hash of a NULL id would be the bare
    * salt and collide across rows). */
  def qsampleBottomK(df: DataFrame, groupCol: Column, uidCol: Column,
                     valueCol: Column, s: Int,
                     salt: String = "qsk"): DataFrame = {
    require(s >= 2, "s must be >= 2")
    val h = Dedup.hash60(concat_ws("", lit(salt), uidCol))
    df.where(uidCol.isNotNull && valueCol.isNotNull)
      .select(groupCol.as("grp"), h.as("h"),
        valueCol.cast("double").as("v"))
      .groupBy(col("grp"))
      .agg(graft.functions.SampleAggregates
        .bottom_k_sample(col("h"), col("v"), s).as("smp"))
      .select(col("grp"), explode(col("smp")).as("e"))
      .select(col("grp"), col("e.h").as("h"), col("e.v").as("v"))
  }

  /** Finalize (grp, h, v) sample partials into per-(grp, q) quantile
    * estimates. Re-takes bottom-s first (a union of bottom-s partials
    * can hold more than s rows — this is the merge), then serves each
    * requested quantile as the sample value at rank
    * `max(1, ceil(q·n))` — the type-1 (lower, discontinuous) empirical
    * quantile, chosen over interpolation because the estimate is then
    * an ACTUAL data value, reproduced bit-for-bit by the oracle with no
    * float arithmetic. Ties on v break by h, so the output is
    * deterministic however the input was partitioned. Exact (equals the
    * true type-1 quantile) whenever a group has at most s rows. Output:
    * (grp, q, est). */
  def qsampleQuantiles(sample: DataFrame, s: Int,
                       qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must lie in (0, 1]")
    val kept = sample
      .withColumn("hr", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("v"))))
      .where(col("hr") <= s)
    kept
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("h"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .select(col("grp"), col("r"), col("n"), col("v"),
        explode(array(qs.map(lit): _*)).as("q"))
      .where(col("r") === greatest(lit(1L), ceil(col("q") * col("n"))))
      .select(col("grp"), col("q"), col("v").as("est"))
  }

  /** One-shot per-group quantile sketch: sample + serve. */
  def qsampleQuantile(df: DataFrame, groupCol: Column, uidCol: Column,
                      valueCol: Column, s: Int, qs: Seq[Double],
                      salt: String = "qsk"): DataFrame =
    qsampleQuantiles(qsampleBottomK(df, groupCol, uidCol, valueCol, s, salt),
      s, qs)
}
