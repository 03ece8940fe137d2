package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass tokenize → shingle → md5 → MinHash (+ LSH band
  * keys) expression.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.ops.Dedup.shingleHashes]]/`minhashSignatures` (and to the
  * DuckDB oracle): lowercase via UTF8String (Spark's own `lower`), split
  * on `[^\p{L}\p{N}]+`, word n-gram shingles joined with a single space,
  * 60-bit md5-prefix hash mod 2^31-1, first-occurrence-distinct hash
  * set, per-slot affine-permutation minima, and (when `numBands` > 0)
  * the per-band md5 bucket keys `md5(sig-slice joined with "|")` — so
  * the whole LSH prep is ONE map-side pass per document with no
  * re-evaluation anywhere downstream (the posexplode that follows fans
  * out over a concrete array column).
  *
  * Why a native expression (extension ladder step (b)): the HOF chain is
  * CodegenFallback and interprets ~6 lambda layers per document, boxing
  * every token, shingle and hash; this is one pass with primitive arrays
  * and a thread-local MessageDigest, and `doGenCode` keeps it inside
  * whole-stage codegen (no fallback stage break, no per-row boxing of
  * the input).
  *
  * Returns `struct(hs: array<long>, sig: array<long>, bands:
  * array<string>)`; `hs` is empty when the document has fewer than
  * `shingleSize` tokens, `sig` is empty when `numHashes` is 0
  * (hash-set-only mode for the n-gram Jaccard path), `bands` is empty
  * when `numBands` is 0.
  */
case class MinhashPackedExpr(child: Expression, shingleSize: Int, numHashes: Int,
                             numBands: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bands", ArrayType(StringType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash_packed"

  /** One-pass compute; called from both interpreted eval and generated
    * code. Public because the generated Java invokes it via a plan
    * reference object. */
  def compute(input: UTF8String): InternalRow = {
    import graft.ops.Dedup.{minhashA, minhashB, MinhashP}
    val md5 = MinhashExpressions.threadMd5.get()
    val text = input.toLowerCase.toString
    val rawToks = MinhashExpressions.splitter.split(text, -1)
    // drop empties (leading separator yields one)
    var nTok = 0
    val toks = new Array[String](rawToks.length)
    var i = 0
    while (i < rawToks.length) {
      if (rawToks(i).nonEmpty) { toks(nTok) = rawToks(i); nTok += 1 }
      i += 1
    }
    val nSh = nTok - shingleSize + 1
    if (nSh <= 0)
      return InternalRow(
        new GenericArrayData(Array.empty[Long]), new GenericArrayData(Array.empty[Long]),
        new GenericArrayData(Array.empty[Any]))
    // first-occurrence-distinct shingle hashes (mod P), one md5 per
    // DISTINCT shingle string like the HOF form (array_distinct after
    // hashing distinct strings ≡ distinct after mod — dedupe on the mod)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md5.reset()
      val digest = md5.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = high 60 bits of the first 8 bytes
      var h60 = 0L
      var k = 0
      while (k < 8) { h60 = (h60 << 8) | (digest(k) & 0xffL); k += 1 }
      h60 = h60 >>> 4 // 64 - 60
      seen.add(h60 % MinhashP)
      i += 1
    }
    val hs = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { hs(i) = it.next(); i += 1 }
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var m = Long.MaxValue
      val a = minhashA(j); val b = minhashB(j)
      var k = 0
      while (k < hs.length) {
        val p = (hs(k) * a + b) % MinhashP
        if (p < m) m = p
        k += 1
      }
      sig(j) = m
      j += 1
    }
    // LSH band keys: md5 hex of the band's sig slice joined with "|"
    // (bit-identical to the HOF lshBuckets form and the DuckDB oracle)
    val bands = new Array[Any](numBands)
    if (numBands > 0) {
      val perBand = numHashes / numBands
      var b = 0
      while (b < numBands) {
        sb.setLength(0)
        var k = 0
        while (k < perBand) {
          if (k > 0) sb.append('|')
          sb.append(sig(b * perBand + k))
          k += 1
        }
        md5.reset()
        val digest = md5.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new java.lang.StringBuilder(32)
        var d = 0
        while (d < 16) {
          hex.append(Character.forDigit((digest(d) >> 4) & 0xf, 16))
          hex.append(Character.forDigit(digest(d) & 0xf, 16))
          d += 1
        }
        bands(b) = UTF8String.fromString(hex.toString)
        b += 1
      }
    }
    InternalRow(new GenericArrayData(hs), new GenericArrayData(sig),
      new GenericArrayData(bands))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashPacked", this, classOf[MinhashPackedExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 64-bit (60 used) SimHash over word tokens — the native form of
  * [[graft.ops.Dedup.simhash64Hof]]: every token occurrence votes ±1 per
  * bit of its 60-bit md5-prefix hash; a bit is set iff its vote sum is
  * positive. One pass per document; the HOF form folds a 60-counter
  * array through two lambda layers per token. `doGenCode` keeps the call
  * inside whole-stage codegen. */
case class SimhashExpr(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  /** One-pass compute; shared by interpreted eval and generated code. */
  def compute(input: UTF8String): Long = {
    val md5 = MinhashExpressions.threadMd5.get()
    val text = input.toLowerCase.toString
    val toks = MinhashExpressions.splitter.split(text, -1)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        md5.reset()
        val digest = md5.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h60 = 0L
        var k = 0
        while (k < 8) { h60 = (h60 << 8) | (digest(k) & 0xffL); k += 1 }
        h60 = h60 >>> 4
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h60 >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimhashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deflate compression ratio of the UTF-8 text — the
  * Gopher/RedPajama-family repetition signal computed the way
  * production pipelines actually compute it: `deflated_bytes /
  * raw_bytes` at level 6, raw-deflate (no zlib wrapper, so the ratio
  * measures content, not header constants). Repetitive or templated
  * documents compress far below natural prose (boilerplate ≈ 0.05–0.2,
  * prose ≈ 0.4–0.7, already-compressed noise ≈ 1+); unlike n-gram
  * repetition scores this catches LONG-range duplication in one pass
  * with no token model. Thread-local Deflater, reset per row — no
  * per-row allocation on the hot path. Empty text → 1.0. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  def compute(input: UTF8String): Double = {
    val raw = input.getBytes
    if (raw.isEmpty) return 1.0
    val d = DeflateRatioExpr.threadDeflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = DeflateRatioExpr.threadBuf.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / raw.length
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateRatio", this,
      classOf[DeflateRatioExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateRatioExpr {
  private val threadDeflater =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, /*nowrap=*/ true)
    }
  private val threadBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16 * 1024)
  }

  /** Column wrapper: codegen'd deflate compression ratio. */
  def deflate_ratio(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      DeflateRatioExpr(org.apache.spark.sql.GraftSqlBridge.expression(text)))
}

/** Fused linear scorer over hashed unigram+bigram features — the hot
  * path of [[graft.ops.Classifier]] (and the same feature space as
  * [[graft.ops.Dsir]]): tokenize → unigram+bigram (WITH multiplicity,
  * the count-mass convention) → 60-bit md5 bucket → dense
  * weight-array lookup, ONE doc-local pass. Semantically identical to
  * `Dsir.features(df).join(weights).groupBy(id).agg(count, sum)` with
  * unseen buckets taking the default weight — the array arrives dense
  * (one slot per bucket, pre-filled with the default), so scoring a
  * document never explodes 2n−1 gram rows through a join: the ≤4096-
  * double table rides into codegen as a plan reference. Returns
  * `struct(n_grams: long, gram_sum: double)`; an empty document scores
  * (0, 0.0). */
case class NbScoreExpr(child: Expression, weights: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = NbScoreExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "nb_score"

  private val buckets = weights.length

  def compute(input: UTF8String): InternalRow = {
    val md5 = MinhashExpressions.threadMd5.get()
    val text = input.toLowerCase.toString
    val raw = MinhashExpressions.splitter.split(text, -1)
    var nTok = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(nTok) = raw(i); nTok += 1 }
      i += 1
    }
    def weightOf(s: String): Double = {
      md5.reset()
      val d = md5.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      weights(((h >>> 4) % buckets).toInt) // first 15 md5 hex = high 60 bits
    }
    var sum = 0.0d
    i = 0
    while (i < nTok) { sum += weightOf(toks(i)); i += 1 }
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i + 1 < nTok) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      sum += weightOf(sb.toString)
      i += 1
    }
    InternalRow(nTok.toLong + math.max(nTok - 1, 0).toLong, sum)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nbScore", this, classOf[NbScoreExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbScoreExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("gram_sum", DoubleType, nullable = false)))
}

/** Fused BM25 term-frequency pass: split on the SINGLE SPACE character
  * (`string_split(text, ' ')` parity with the SQL oracle and
  * [[graft.ops.TextAnalysis.tfIdfTopK]]'s tokenization), then in ONE
  * doc-local scan count the total token count and each query term's
  * occurrences. Returns `struct(dl: long, tf: array<long>)` with `tf`
  * aligned to the constructor's term order.
  *
  * Why a native expression (extension ladder step (b)): the
  * explode-then-broadcast-semi-join formulation materializes every
  * corpus token (≈30× the document count) before the filter; this scans
  * each document once with a terms-sized hash lookup and shuffles
  * NOTHING — scoring becomes a pure map-side expression over `(dl,
  * tf)`, so only score-positive candidates ever reach the top-k
  * exchange. */
case class TermCountsExpr(child: Expression, terms: Array[String])
  extends UnaryExpression {

  override def dataType: DataType = TermCountsExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "bm25_term_counts"

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < terms.length) { m.put(terms(i), Integer.valueOf(i)); i += 1 }
    m
  }

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val counts = new Array[Long](terms.length)
    var dl = 0L
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) { // empty splits (consecutive spaces) don't count
          dl += 1
          val idx = index.get(s.substring(start, i))
          if (idx != null) counts(idx.intValue()) += 1
        }
        start = i + 1
      }
      i += 1
    }
    InternalRow(dl, new GenericArrayData(counts))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("termCounts", this, classOf[TermCountsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCountsExpr {
  val schema: StructType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tf", ArrayType(LongType, containsNull = false), nullable = false)))
}

object MinhashExpressions {
  private[functions] val splitter = Pattern.compile("[^\\p{L}\\p{N}]+")
  /** MessageDigest is stateful and NOT thread-safe; expression instances
    * can be shared across tasks via codegen reference arrays, so the
    * digest is per-thread. */
  private[functions] val threadMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Native fused SimHash (see [[SimhashExpr]]). */
  def simhash_native(text: Column): Column =
    GraftSqlBridge.column(SimhashExpr(
      GraftSqlBridge.expression(text.cast("string"))))

  /** struct(hs, sig, bands) in one fused pass. */
  def minhash_packed(text: Column, shingleSize: Int, numHashes: Int,
                     numBands: Int = 0): Column =
    GraftSqlBridge.column(MinhashPackedExpr(
      GraftSqlBridge.expression(text.cast("string")), shingleSize, numHashes, numBands))

  /** Distinct shingle-hash set only (n-gram Jaccard path). */
  def shingle_hashes_native(text: Column, shingleSize: Int): Column =
    minhash_packed(text, shingleSize, 0).getField("hs")

  /** struct(n_grams, gram_sum) in one fused pass (see [[NbScoreExpr]]). */
  def nb_score(text: Column, denseWeights: Array[Double]): Column =
    GraftSqlBridge.column(NbScoreExpr(
      GraftSqlBridge.expression(text.cast("string")), denseWeights))

  /** struct(dl, tf) in one fused pass (see [[TermCountsExpr]]). */
  def term_counts(text: Column, terms: Array[String]): Column =
    GraftSqlBridge.column(TermCountsExpr(
      GraftSqlBridge.expression(text.cast("string")), terms))
}
