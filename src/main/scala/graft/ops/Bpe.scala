package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Byte-pair encoding in-engine (Sennrich et al. 2016, the tokenizer
  * family GPT/Llama vocabularies build on): both APPLICATION of a merge
  * table and TRAINING rounds (learning the merges from the corpus), as
  * pure column expressions an external oracle replays exactly.
  *
  * Representation: a word is a char-spaced string with sentinel spaces
  * (`" h e l l o "`), so applying merge `(a, b)` is the literal
  * replacement `" a b " → " ab "` — and literal `replace` has identical
  * leftmost non-overlapping semantics in Spark and DuckDB, which makes
  * the whole encode chain (and therefore the learned merges) engine-
  * portable without any custom runtime. Greedy leftmost application per
  * merge in priority order is exactly the reference BPE algorithm.
  *
  * 100 TB shape: encoding is map-side only (a per-word replace chain
  * inside whole-stage codegen — no shuffle, no UDF); one training round
  * is a map-side-combined pair-count aggregation (distinct adjacent
  * symbol pairs survive the combine, bounded by the growing vocab²,
  * in practice tiny) plus a TakeOrdered(1) argmax; `rounds` rounds are
  * `rounds` such jobs. The driver holds one (pair, count) row per
  * round — the merge table itself, which is the training OUTPUT. */
object Bpe {

  /** A small priority-ordered English merge table for the application
    * path (a real deployment loads its tokenizer's table; the mechanism
    * is what scales). */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "s" -> "t", "in" -> "g", "a" -> "l",
    "o" -> "u", "e" -> "s")

  /** `" h e l l o "` — char-spaced with sentinel spaces, so a merge
    * match can never span a symbol boundary. */
  def spaced(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Apply the merge table in priority order (greedy leftmost per
    * merge — literal replace). */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spaced(word)) { case (s, (a, b)) =>
      replace(s, lit(s" $a $b "), lit(s" $a$b "))
    }

  /** Per-word encoded forms of a document (tokens → spaced+merged). */
  def encodedWords(text: Column, merges: Seq[(String, String)]): Column =
    transform(tokens(text), w => encodeWord(w, merges))

  /** Per-document BPE token count: symbols per encoded word, summed.
    * An encoded word with n symbols carries n+1 spaces. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(encodedWords(text, merges), lit(0L), (acc, e) =>
      acc + (length(e) - length(replace(e, lit(" "), lit("")))) - 1L)

  /** Adjacent symbol-pair rows `(a, b)` of a corpus under the current
    * merge table — one row per occurrence, map-side only. */
  def pairOccurrences(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame =
    df.select(explode(encodedWords(col(textCol), merges)).as("e"))
      .select(split(trim(col("e")), " ").as("syms"))
      .select(explode(element_at(transform(array(col("syms")), ss =>
        transform(
          filter(sequence(lit(0), greatest(size(ss) - 2, lit(0))),
            i => i + 2 <= size(ss)),
          i => struct(element_at(ss, i + 1).as("a"),
            element_at(ss, i + 2).as("b")))), 1)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))

  /** One training round: the most frequent adjacent pair under the
    * current merges (count desc, then lexicographic — deterministic in
    * both engines). Returns (a, b, cnt); None on an empty corpus. */
  def topPair(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): Option[(String, String, Long)] = {
    val top = pairOccurrences(df, textCol, merges)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1).collect()
    top.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Frequency-weighted argmax pair over a DISTINCT-WORD table — same
    * count as [[topPair]] over the raw corpus (an occurrence count is a
    * word-frequency-weighted count over distinct words), but each round
    * only re-encodes the vocabulary, not the corpus. */
  private def topPairWeighted(words: DataFrame,
                              merges: Seq[(String, String)]): Option[(String, String, Long)] = {
    val top = words
      .select(split(trim(encodeWord(col("w"), merges)), " ").as("syms"),
        col("freq"))
      .select(explode(element_at(transform(array(struct(col("syms").as("ss"),
          col("freq").as("f"))), s =>
        transform(
          filter(sequence(lit(0), greatest(size(s.getField("ss")) - 2, lit(0))),
            i => i + 2 <= size(s.getField("ss"))),
          i => struct(element_at(s.getField("ss"), i + 1).as("a"),
            element_at(s.getField("ss"), i + 2).as("b"),
            s.getField("f").as("f")))), 1)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("p.f")).as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
      .limit(1).collect()
    top.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Learn `rounds` merges from the corpus — the BPE training loop.
    * Each round's winner merges into the representation before the
    * next count. Returns one row per round: (round, a, b, cnt).
    *
    * The corpus-sized work happens ONCE: the corpus collapses to a
    * distinct-word frequency table (one tokenize + one shuffle on the
    * word — the standard BPE-trainer representation, Sennrich's
    * learn_bpe vocab dict), persisted across rounds. Every round then
    * re-encodes only the VOCABULARY under the current merges and takes
    * a frequency-weighted pair argmax — vocab-sized jobs, identical
    * counts. At 100 TB the vocab table is millions of rows regardless
    * of corpus size, so round cost is flat in the corpus. */
  def trainRounds(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var merges = Seq.empty[(String, String)]
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var continue = true
    while (r <= rounds && continue) {
      topPairWeighted(words, merges) match {
        case Some((a, b, cnt)) =>
          out += ((r, a, b, cnt))
          merges = merges :+ (a -> b)
        case None => continue = false
      }
      r += 1
    }
    words.unpersist()
    out.result().toDF("round", "a", "b", "cnt")
      .select(col("round").cast("long").as("round"), col("a"), col("b"), col("cnt"))
  }
}
