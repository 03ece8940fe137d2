package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Everything is composed from codegen'd built-ins (no UDFs) so it stays
  * inside whole-stage codegen and scales linearly with the scan. */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= "")).cast("long")

  /** BPE-ish subword token estimate: word tokens are further split on
    * letter/digit boundaries and long words count ceil(len/4) pieces —
    * a deterministic stand-in for a real tokenizer's token count. */
  def tokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast("double") / 4.0d).cast("long"))

  /** Quality-scoring feature struct: lengths, ratios, diversity. */
  def qualityFeatures(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val nAlnum = length(regexp_replace(text, "[^\\p{L}\\p{N}]", ""))
    val nPunct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val nUpper = length(regexp_replace(text, "[^A-Z]", ""))
    struct(
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      round(size(array_distinct(toks)).cast("double") /
        greatest(nTokens, lit(1)), 6).as("distinct_ratio"),
      round(nAlnum.cast("double") / greatest(nChars, lit(1)), 6).as("alnum_ratio"),
      round(nPunct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
      round(nUpper.cast("double") / greatest(nChars, lit(1)), 6).as("upper_ratio"),
      round(nChars.cast("double") / greatest(nTokens, lit(1)), 6).as("mean_word_len"))
  }

  /** Scalar quality score in [0,1]: penalizes extreme lengths, low
    * alphanumeric content, low token diversity. Deterministic, portable. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenOk = when(f.getField("n_tokens").between(10, 100000), 1.0d).otherwise(0.5d)
    round(least(
      lenOk * f.getField("alnum_ratio") * (lit(0.5d) + lit(0.5d) * f.getField("distinct_ratio")),
      lit(1.0d)), 6)
  }

  /** C4 cleanup battery (Raffel et al. 2020 §2.2, public): the line and
    * page heuristics C4 applied to Common Crawl, as one doc-local struct.
    * Line level — keep lines that end in terminal punctuation, carry ≥ 5
    * whitespace words, and do not mention "javascript". Page level — at
    * least 3 retained lines, no "lorem ipsum", no curly brace. The kept
    * text's md5 digest is included so the TRANSFORM (not just the
    * decision) is oracle-checked. All codegen'd built-ins; one pass. */
  def c4Filters(text: Column): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
        !lower(l).rlike("javascript"))
    val hasLorem = lower(text).rlike("lorem ipsum")
    val hasBrace = text.rlike("\\{")
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (size(kept) >= 3 && !hasLorem && !hasBrace).as("keep"),
      md5(concat_ws("\n", kept)).as("kept_digest"))
  }

  /** Gopher quality-rule battery (Rae et al. 2021 §A1.1, public): the
    * per-document filters MassiveWeb applied, as one doc-local struct —
    * word count in [50, 100k], mean word length in [3, 10],
    * symbol-to-word ratio (# and ellipsis) ≤ 0.1, ≤ 90% of lines
    * starting with a bullet, ≤ 30% ending in an ellipsis, ≥ 80% of
    * words with an alphabetic character, and ≥ 2 hits from the Gopher
    * stop-word list. Ratios round to 6 places and the keep decision is
    * computed FROM the rounded values, so the decision is
    * engine-portable. */
  def gopherRules(text: Column): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(words)
    val meanLen = round(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(nWords, lit(1)), 6)
    val nEllipsis = ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3) +
      (length(text) - length(regexp_replace(text, "…", "")))
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val symRatio = round((nHash + nEllipsis).cast("double") /
      greatest(nWords, lit(1)), 6)
    val lines = split(text, "\n")
    val bulletFrac = round(
      size(filter(lines, l => l.rlike("^\\s*[•\\-\\*]"))).cast("double") /
        greatest(size(lines), lit(1)), 6)
    val ellipsisFrac = round(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") /
        greatest(size(lines), lit(1)), 6)
    val alphaFrac = round(
      size(filter(words, w => w.rlike("\\p{L}"))).cast("double") /
        greatest(nWords, lit(1)), 6)
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(array_intersect(array_distinct(tokens(text)),
      array(gopherStops.map(lit): _*)))
    struct(
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.cast("long").as("n_stop_hits"),
      (nWords.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        symRatio <= 0.1 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && stopHits >= 2).as("keep"))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the mechanism (broadcast profile match +
    * argmax) is what scales, the wordlists are swappable. */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "para", "que"))

  /** Stopword-hit ratio against one profile. */
  def stopwordRatio(toks: Column, profile: Seq[String]): Column =
    round(size(array_intersect(toks, array(profile.map(lit): _*))).cast("double") /
      greatest(size(array_distinct(toks)), lit(1)), 6)

  /** Language-ID: argmax of stopword-ratio over the profiles; 'und' when
    * every score is zero. Ties break lexicographically (deterministic). */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scored = stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordRatio(toks, words).as("score"), lit(lang).as("lang"))
    }
    // argmax by (score, lang): ties pick the lexicographically larger code
    // — any fixed rule works, it just must be deterministic and mirrored
    // in the oracle.
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** PII patterns written to the common RE2/Java-regex subset (no
    * lookaround, explicit ASCII classes) so an engine swap — or the
    * DuckDB oracle — matches byte-identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9]{9,}"

  /** PII scrubbing for training corpora: replace emails and long digit
    * runs (phone/account/id numbers) with type tags. Pure map-side
    * `regexp_replace` — codegen'd, no UDF, order fixed (emails first so
    * an address's digits aren't half-eaten by the number rule). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongNumRe, "<NUM>")

  /** Polynomial rolling-hash fingerprint of the token stream (order
    * sensitive, whitespace/case insensitive):
    * h = (h*31 + tokenHash) mod (2^31-1), h0 = 7. The modulus is small
    * enough that no int64 overflow occurs (2^31·31 + 2^60 < 2^63), so the
    * fold is portable to engines with checked arithmetic. Token hash =
    * first 15 md5 hex chars as a 60-bit int. */
  def fingerprint(text: Column): Column = {
    val mod = lit(2147483647L) // 2^31-1
    aggregate(tokens(text), lit(7L),
      (acc, t) => pmod(acc * 31L + conv(substring(md5(t), 1, 15), 16, 10).cast("long"), mod))
  }

  /** Canonical text normalization — the ftfy-lite cleanup pass every
    * curation pipeline runs before hashing or training: typographic
    * quotes/dashes/ellipsis mapped to ASCII, non-breaking spaces and
    * carriage returns removed, horizontal whitespace runs collapsed,
    * ends trimmed. A deterministic chain of literal replaces plus one
    * global regexp, so an external engine reproduces the normalized
    * digest exactly — [[NormalizeReps]] is public so the oracle SQL is
    * GENERATED from the same replacement table. Map-side only. */
  val NormalizeReps: Seq[(String, String)] = Seq(
      " " -> " ",   // non-breaking space
      "‘" -> "'", "’" -> "'",       // curly single quotes
      "“" -> "\"", "”" -> "\"",     // curly double quotes
      "–" -> "-", "—" -> "-",       // en/em dash
      "…" -> "...",                      // ellipsis
      "\r" -> "")

  def normalizeText(text: Column): Column = {
    val replaced = NormalizeReps.foldLeft(text) { case (c, (a, b)) =>
      replace(c, lit(a), lit(b))
    }
    trim(regexp_replace(replaced, "[ \\t]+", " "))
  }

  /** Corpus word-bigram language-model count table — the KenLM-prep
    * shape every n-gram LM build starts from: positional adjacent-pair
    * counts with a count cutoff, joined to their unigram prefix counts
    * for the conditional MLE `p(w2|w1) = c(w1 w2) / c(w1)`.
    *
    * Scale shape: pair explode is map-side (cost ∝ corpus tokens, no
    * shuffle); both counts are map-side-combined aggregations whose
    * exchanges carry one row per distinct gram; the prefix join runs
    * over the two aggregated tables (one row per word each side), so
    * nothing corpus-sized crosses the wire after the two count
    * shuffles. The cutoff prunes the long tail BEFORE the join. */
  def bigramLm(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val pairs = toks.select(explode(element_at(transform(
        array(struct(col("t").as("ts"))), s =>
          transform(
            filter(sequence(lit(0), greatest(size(s.getField("ts")) - 2, lit(0))),
              i => i + 2 <= size(s.getField("ts"))),
            i => struct(element_at(s.getField("ts"), i + 1).as("w1"),
              element_at(s.getField("ts"), i + 2).as("w2")))), 1)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
      .join(uni, "w1")
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        round(col("c12").cast("double") / col("c1"), 6).as("p"))
  }

  /** Character-level Shannon entropy in bits — a classic quality /
    * gibberish signal (natural language sits ~4–4.5 bits/char; base64
    * blobs and keyboard mash score high, repeated-char padding scores
    * near 0). Doc-local column expression (no shuffle): the distinct
    * characters are SORTED before the Σ −p·log₂p fold so the floating
    * sum order is deterministic and an external engine reproduces it
    * bit-for-bit at 6-digit rounding. Empty text ⇒ 0. */
  /** Deflate compression ratio of the text (deflated/raw bytes, level 6
    * raw-deflate) — the Gopher/RedPajama-family long-range repetition
    * signal: templated/duplicated content compresses far below prose.
    * Doc-local, codegen'd, no token model; see
    * [[graft.functions.DeflateRatioExpr]]. No SQL oracle can exist
    * (DuckDB has no deflate) — spec-gated against reference byte counts
    * and ordering properties in `OpsSpec`. */
  def compressionRatio(text: Column): Column =
    graft.functions.DeflateRatioExpr.deflate_ratio(text)

  def charEntropy(text: Column): Column =
    // the char array binds ONCE via the single-element transform trick
    // (a bare reference inside the fold would re-run split per char)
    element_at(transform(
      array(struct(filter(split(text, ""), c => c =!= "").as("cs"))), s => {
        val cs = s.getField("cs")
        val n = size(cs).cast("double")
        when(size(cs) > 0,
          -aggregate(array_sort(array_distinct(cs)), lit(0.0d), (acc, ch) => {
            val p = size(filter(cs, c => c === ch)).cast("double") / n
            acc + p * log2(p)
          })).otherwise(lit(0.0d))
      }), 1)

  /** Repetition metrics (Gopher-style quality rules, public): per
    * document, the fraction of DISTINCT word bigrams and the fraction of
    * occurrences claimed by the single most frequent bigram — low
    * distinct-frac / high top-frac flags boilerplate and degenerate
    * repetition. One shuffle on (doc, bigram); documents shorter than
    * two tokens drop out (no bigrams). */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NON-distinct bigrams (occurrence counts matter here), tokens bound
    // once via the single-element transform trick
    val bigrams = element_at(transform(array(graft.functions.tokens(col(textCol))), ts =>
      transform(
        filter(sequence(lit(0), greatest(size(ts) - 2, lit(0))), i => i + 2 <= size(ts)),
        i => concat_ws(" ", slice(ts, i + 1, lit(2))))), 1)
    // Both metrics are DOC-LOCAL, so they fuse into one codegen'd pass
    // with ZERO shuffles: the former explode → groupBy(doc, bigram) →
    // groupBy(doc) pipeline exchanged every bigram occurrence twice to
    // compute per-array facts. distinct count = array_distinct; the top
    // occurrence count = longest run in the sorted array (an aggregate
    // HOF over (prev, run, best)). Docs with <2 tokens keep dropping
    // out (no bigrams → no row), as the explode form did.
    val top = aggregate(
      array_sort(col("_bg")),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") <=> x,
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(col(idCol).as("doc_id"), bigrams.as("_bg"))
      .where(size(col("_bg")) >= 1)
      .select(col("doc_id"),
        size(col("_bg")).cast("long").as("n_bigrams"),
        round(size(array_distinct(col("_bg"))) / size(col("_bg")), 6)
          .as("distinct_frac"),
        round(top / size(col("_bg")), 6).as("top_frac"))
  }

  /** TF-IDF keyword extraction: top-`k` terms per document by
    * tf × ln(N / df), the standard curation signal for topic balance /
    * keyword indexing over a training corpus.
    *
    * Scale shape: explode → one shuffle on (doc, word) for tf; one
    * shuffle on word for document frequency; tf⋈df joins on word
    * (Catalyst broadcasts a small vocabulary, sort-merge-joins a huge
    * one — no hint pinned); N arrives as a broadcast 1-row cross join,
    * never a driver collect. Ranking happens on the ROUNDED score so
    * mathematically-tied terms (2·ln4 ≡ 4·ln2) break on the word, not
    * on last-ulp noise. */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    val words = df
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // document frequency rides the tf frame as a WINDOW count over the
    // word partition — tf has exactly one row per (doc, word), so
    // count(*) over (partition by word) IS df_docs. The former
    // tf.groupBy(word) + tf⋈dfc self-join evaluated the whole
    // explode + (doc,word) aggregation subtree TWICE (round-12 measured
    // that persisting tf costs more than the re-evaluation; the window
    // needs neither — one tf evaluation, one word exchange)
    val wWord = org.apache.spark.sql.expressions.Window.partitionBy(col("word"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.withColumn("df_docs", count(lit(1)).over(wWord))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df_docs")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("word"), col("tf"),
        col("df_docs"), col("tfidf"))
  }

  /** Okapi BM25 ranked retrieval (Robertson & Walker, TREC-3; the
    * Lucene-default non-negative IDF `ln(1 + (N − df + ½)/(df + ½))`):
    * for each literal query, the top-`k` documents by
    * `Σ_terms idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`,
    * ranked on the 6-rounded score with doc-id tie-break. Repeated
    * query terms count once (set-of-terms form). The retrieval every
    * curation pipeline runs against its own corpus: decontamination
    * probes, eval-set mining, dedup candidate triage.
    *
    * 100 TB shape: ZERO corpus shuffle. The fused
    * [[graft.functions.TermCountsExpr]] counts document length and each
    * query term's occurrences in one codegen'd doc-local pass (the
    * explode-then-join formulation materialized every corpus token
    * first); corpus statistics (N, avgdl, per-term df) fold into ONE
    * map-side-combined aggregation returning a terms-sized row; scoring
    * is then a pure map-side expression over `(dl, tf)` with the idf
    * constants baked in, so only score-positive candidates ever reach
    * the per-query top-k exchange. Driver-side state: |terms| + 2
    * scalars. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    val perQuery = queries.map { case (qid, qtext) =>
      qid -> qtext.split(" ").filter(_.nonEmpty).distinct.toSeq
    }
    val terms: Array[String] = perQuery.flatMap(_._2).distinct.toArray
    require(terms.nonEmpty, "queries carry no terms")
    val tc = graft.functions.MinhashExpressions.term_counts(col(textCol), terms)
    val base = df.select(col(idCol).as("doc_id"), tc.as("tc"))
      .select(col("doc_id"), col("tc.dl").as("dl"), col("tc.tf").as("tf"))
    // one pass: N, Σdl, and every term's document frequency
    val dfAggs = terms.indices.map(j =>
      sum(when(col("tf").getItem(j) > 0L, 1L).otherwise(0L)))
    val head = base.agg(count(lit(1)), (sum(col("dl")) +: dfAggs): _*).head()
    val nDocs = head.getLong(0)
    val avgdl = head.getLong(1).toDouble / nDocs
    val idf: Array[Double] = terms.indices.map { j =>
      val dfc = head.getLong(2 + j).toDouble
      math.log(1.0 + (nDocs - dfc + 0.5) / (dfc + 0.5))
    }.toArray
    val norm = (lit(1 - b) + col("dl") * (b / avgdl)) * k1
    def contrib(j: Int) = {
      val tf = col("tf").getItem(j)
      lit(idf(j)) * tf * (k1 + 1) / (tf + norm)
    }
    val qStructs = perQuery.map { case (qid, qts) =>
      val js = qts.map(t => terms.indexOf(t))
      // match on tf (not on the rounded score): a doc with only
      // ultra-common terms may round to 0.0 but still ranks, exactly
      // as in the join formulation and the SQL oracle
      val matched = js.map(j => col("tf").getItem(j)).reduce(_ + _) > 0L
      val score = round(js.map(contrib).reduce(_ + _), 6)
      struct(lit(qid).as("query_id"), when(matched, score).as("score"))
    }
    val scored = base
      .select(col("doc_id"), explode(array(qStructs: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"), col("q.score").as("score"))
      .where(col("score").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("score"))
  }

  /** CCNet-style language-model quality scoring: per-document mean
    * negative log-likelihood under an add-one-smoothed unigram model
    * fitted on the corpus itself (low = looks like the corpus, high =
    * outlier/noise — the standard LM-filter signal, deterministic here
    * so an auditor recomputes it exactly).
    *
    * Scale: one token-keyed aggregation builds the model, one token-keyed
    * join scores against it — the model table shuffles alongside the
    * token stream, so it may exceed any single executor's memory (no
    * broadcast needed; Catalyst broadcasts it anyway when small). The
    * two scalar totals (token count, vocabulary size) are the only
    * driver-side values. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Examined for the round-12 optimization pass and deliberately left
    // in the re-tokenize form: the tempting "tokenize once, aggregate
    // to (doc, token, multiplicity), persist" rewrite was measured at
    // 8× the process-CPU of this shape — the model-build exchange here
    // is already tiny (partial aggregation collapses each partition to
    // its distinct tokens before the shuffle), the scoring join
    // broadcasts the model, and the per-doc aggregation ships one row
    // per doc; a (doc, token) hash aggregation + columnar persist costs
    // far more than tokenizing the corpus twice more.
    val toks = df.select(col(idCol).as("id"),
      explode(graft.functions.tokens(col(textCol))).as("tok"))
    val lm = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val t = lm.agg(sum(col("c")), count(lit(1))).head()
    val denom = t.getLong(0) + t.getLong(1) // N + V (add-one smoothing)
    toks.join(lm, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log((col("c") + 1) / lit(denom.toDouble))), 6).as("nll"))
  }

  /** CCNet-style perplexity bucketing: within each `groupCol` group
    * (typically language), rank documents by their unigram-LM mean NLL
    * ([[unigramLogProb]], already 6-decimal rounded) and split into
    * equal-depth head/middle/tail thirds — head = most fluent, the
    * slice CCNet keeps for high-quality corpora. Standard NTILE
    * distribution (earlier buckets absorb the remainder rows), ties
    * broken by doc id: integer-rank based, so any SQL engine reproduces
    * the assignment exactly.
    *
    * Scale note: the per-group window serializes each group through one
    * reducer. That is the exact, oracle-reproducible form; at 100 TB
    * with few huge language groups, switch to threshold bucketing
    * (approxQuantile cut points per group, broadcast, map-side filter)
    * at the documented cost of tie/remainder drift around the cuts. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String): DataFrame = {
    val scored = unigramLogProb(df, idCol, textCol)
      .join(df.select(col(idCol).as("id"), col(groupCol)), "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("nll"), col("id"))
    scored.withColumn("bucket",
      element_at(array(lit("head"), lit("middle"), lit("tail")),
        ntile(3).over(w)))
  }

  /** Convenience: annotate a documents DataFrame with all analyses. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("features", qualityFeatures(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("n_words", wordCount(col(textCol)))
      .withColumn("n_tokens_est", tokenEstimate(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
}
