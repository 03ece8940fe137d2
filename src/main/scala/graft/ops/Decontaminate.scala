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

  /** Fuzzy decontamination for when the benchmark itself is corpus-sized
    * (multi-benchmark suites, paraphrased eval sets) and cannot be
    * broadcast: cross-corpus MinHash-LSH. Both sides get the fused
    * single-pass signatures; candidate (corpus, benchmark) pairs form
    * only inside shared (band, band_key) buckets — an equi-join, never
    * corpus × benchmark — and candidates verify by exact BENCHMARK
    * containment |C ∩ B| / |B| over the shingle-hash sets (containment,
    * not Jaccard, with the BENCHMARK set as the denominator: a short
    * benchmark item embedded in a long training doc scores ~1.0, where
    * Jaccard or corpus-side containment would score ~|B|/|C| and miss
    * it). Returns per flagged corpus doc its best-matching benchmark doc
    * (max containment, ties → smallest id) and the number of matching
    * benchmark docs.
    *
    * Recall caveat: MinHash banding is Jaccard-shaped, so very
    * asymmetric true pairs (tiny benchmark item inside a huge doc) have
    * low Jaccard and may never form a band candidate even though their
    * containment is high — banding bounds recall here. When the
    * benchmark fits in a broadcast, [[flag]] is exact and has no such
    * limit; when it doesn't, raising `bands` (narrower bands → more
    * candidates) or banding benchmark-sized shingle windows of the
    * corpus docs recovers recall at extra candidate cost.
    *
    * Scale: signatures are map-side on both sides; the band join and the
    * two hash-set joins shuffle only ids, band keys and the (small)
    * candidate set — the same bucket-local shape as [[Dedup.minhashLsh]],
    * with no broadcast requirement on either input. */
  def flagFuzzy(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                textCol: String, numHashes: Int = 16, bands: Int = 4,
                shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val cs = Dedup.sharedPersist(
      Dedup.minhashSignatures(corpus, idCol, textCol, numHashes, shingleSize, bands))
    val bs = Dedup.sharedPersist(
      Dedup.minhashSignatures(benchmark, idCol, textCol, numHashes, shingleSize, bands))
    val cb = Dedup.lshBuckets(cs, bands)
      .select(col("band"), col("band_key"), col("id").as("cid"))
    val bb = Dedup.lshBuckets(bs, bands)
      .select(col("band"), col("band_key"), col("id").as("bid"))
    val cands = cb.join(bb.hint("merge"), Seq("band", "band_key"))
      .select(col("cid"), col("bid")).distinct()
    cands
      .join(cs.select(col("id").as("cid"), col("hs").as("chs")), "cid")
      .join(bs.select(col("id").as("bid"), col("hs").as("bhs")), "bid")
      .withColumn("containment", round(
        size(array_intersect(col("chs"), col("bhs"))).cast("double") /
          size(col("bhs")), 6))
      .where(col("containment") >= threshold)
      .groupBy(col("cid"))
      .agg(max(struct(col("containment").as("c"), (-col("bid")).as("nbid"))).as("best"),
        count(lit(1)).as("n_matches"))
      .select(col("cid").as("id"), col("best.c").as("containment"),
        (-col("best.nbid")).cast("long").as("benchmark_id"), col("n_matches"))
  }

  /** Corpus-side rare-shingle inverted index consumed by
    * [[flagFuzzyRare]]. A function of (corpus, shingleSize, dfCap)
    * ONLY — at 100 TB this is a materialized artifact refreshed with the
    * corpus (a parquet table keyed by shingle hash), never per-query
    * work; many decontamination runs against different benchmark suites
    * read the same index.
    *
    *  - `shingles`: per-doc distinct shingle-hash set (`cid`, `chs`) —
    *    the exact-containment verify side;
    *  - `rarePostings`: the (`h`, `cid`) posting list restricted to
    *    shingles with corpus document frequency ≤ dfCap — the candidate
    *    side, bounded at ≤ dfCap docs per shingle by construction. */
  final case class RareShingleIndex(shingles: DataFrame, rarePostings: DataFrame) {
    /** A pinned COPY of this index (the in-session analog of writing it
      * to storage) — the receiver is left untouched; use the RETURNED
      * index (`val idx = raw.persisted()`), not the receiver, or the
      * probe joins run against unpersisted, unpartitioned postings. The
      * postings pin PRE-PARTITIONED on the shingle hash — the cached
      * relation keeps that partitioning in its plan, so every later
      * probe join streams the (big) postings side with no exchange and
      * no per-run sort; only the (small) probe side shuffles. The
      * storage analog is a table bucketed by `h`. Caller owns the
      * lifecycle — see PipelineQueries' fixture cache. */
    def persisted(): RareShingleIndex = {
      shingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val parted = rarePostings.repartition(col("h"))
      parted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      RareShingleIndex(shingles, parted)
    }
    def unpersist(): Unit = {
      shingles.unpersist(); rarePostings.unpersist(); ()
    }
  }

  /** Build the [[RareShingleIndex]]: one linear shingle pass over the
    * corpus + one df aggregation (map-side combined on the shingle
    * hash). */
  def rareShingleIndex(corpus: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, dfCap: Int = 100): RareShingleIndex = {
    val cs = corpus.select(col(idCol).as("cid"),
        Dedup.shingleHashes(col(textCol), shingleSize).as("chs"))
      .where(size(col("chs")) > 0)
    val cex = cs.select(col("cid"), explode(col("chs")).as("h"))
    val rare = cex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap).select(col("h"))
    RareShingleIndex(cs, cex.join(rare, "h"))
  }

  /** Exact cross-corpus decontamination WITHOUT broadcast and WITHOUT
    * banding's Jaccard-shaped recall limit: candidate (corpus,
    * benchmark) pairs come from the RARE-shingle inverted index — pairs
    * sharing at least one shingle whose corpus document frequency is
    * ≤ dfCap — then verify by exact benchmark containment |C∩B|/|B|
    * like [[flagFuzzy]]. A benchmark item embedded verbatim in an
    * arbitrarily long training doc shares ALL its shingles with it, so
    * it is found whenever ANY of its shingles is rare; the only misses
    * are benchmark docs composed entirely of >dfCap boilerplate
    * shingles, which the threshold would likely reject anyway.
    *
    * Scale: the corpus-side index is amortized across runs (build it
    * once with [[rareShingleIndex]]); per run only the benchmark
    * explodes, and the candidate join output is bounded by
    * dfCap × |benchmark shingles| — no broadcast, no n², no MinHash
    * recall cliff. Use [[flagFuzzy]] when near-duplicate (paraphrase)
    * matching is wanted; use this when the contract is exact
    * containment at any size asymmetry. */
  def flagFuzzyRare(index: RareShingleIndex, benchmark: DataFrame,
                    idCol: String, textCol: String, shingleSize: Int,
                    threshold: Double): DataFrame = {
    // pinned: both the candidate pass (exploded below) and the
    // containment verify read the benchmark's shingle sets — without the
    // persist the benchmark is shingled once per consumer
    val bs = Dedup.sharedPersist(benchmark.select(col(idCol).as("bid"),
        Dedup.shingleHashes(col(textCol), shingleSize).as("bhs"))
      .where(size(col("bhs")) > 0))
    val bex = bs.select(col("bid"), explode(col("bhs")).as("h"))
    // shuffled-hash with the SMALL (benchmark-postings) side as build:
    // the cached index side streams through its own partitioning with
    // no exchange and no sort; merge would re-sort the big side per run
    val cands = index.rarePostings.join(bex.hint("shuffle_hash"), "h")
      .select(col("cid"), col("bid")).distinct()
    cands
      .join(index.shingles, "cid")
      .join(bs, "bid")
      .withColumn("containment", round(
        size(array_intersect(col("chs"), col("bhs"))).cast("double") /
          size(col("bhs")), 6))
      .where(col("containment") >= threshold)
      .groupBy(col("cid"))
      .agg(max(struct(col("containment").as("c"), (-col("bid")).as("nbid"))).as("best"),
        count(lit(1)).as("n_matches"))
      .select(col("cid").as("id"), col("best.c").as("containment"),
        (-col("best.nbid")).cast("long").as("benchmark_id"), col("n_matches"))
  }

  /** One-shot form: builds the index inline, pinning its shingle frame
    * through [[Dedup.sharedPersist]] — `rarePostings` derives from the
    * same subtree, so the candidate pass and the containment verify
    * join both read the one persisted copy instead of re-shingling the
    * corpus (CacheManager substitutes the cached subplan). */
  def flagFuzzyRare(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, shingleSize: Int = 3,
                    threshold: Double = 0.5, dfCap: Int = 100): DataFrame = {
    val idx = rareShingleIndex(corpus, idCol, textCol, shingleSize, dfCap)
    flagFuzzyRare(idx.copy(shingles = Dedup.sharedPersist(idx.shingles)),
      benchmark, idCol, textCol, shingleSize, threshold)
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

  /** Fuzzy complement: corpus minus [[flagFuzzy]]-flagged docs. */
  def cleanFuzzy(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                 textCol: String, numHashes: Int = 16, bands: Int = 4,
                 shingleSize: Int = 3, threshold: Double = 0.5): DataFrame =
    corpus.join(
      flagFuzzy(corpus, benchmark, idCol, textCol, numHashes, bands,
        shingleSize, threshold).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
}
