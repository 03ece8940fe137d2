package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass tokenize → shingle → md5 → MinHash expression.
  *
  * Semantically identical to the HOF formulation in
  * [[graft.ops.Dedup.shingleHashes]]/`minhashSignatures` (and to the
  * DuckDB oracle): lowercase via UTF8String (Spark's own `lower`), split
  * on `[^\p{L}\p{N}]+`, word n-gram shingles joined with a single space,
  * 60-bit md5-prefix hash mod 2^31-1, first-occurrence-distinct hash
  * set, and per-slot affine-permutation minima.
  *
  * Why a native expression (extension ladder step (b)): the HOF chain is
  * CodegenFallback and interprets ~6 lambda layers per document, boxing
  * every token, shingle and hash; this eval is one pass with primitive
  * arrays and a reused MessageDigest. `CodegenFallback` here only means
  * the expression itself is invoked virtually — everything inside is a
  * tight loop.
  *
  * Returns `struct(hs: array<long>, sig: array<long>)`; `hs` is empty
  * when the document has fewer than `shingleSize` tokens, `sig` is empty
  * when `numHashes` is 0 (hash-set-only mode for the n-gram Jaccard
  * path).
  */
case class MinhashPackedExpr(child: Expression, shingleSize: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  import graft.ops.Dedup.{minhashA, minhashB, MinhashP}

  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "minhash_packed"

  @transient private lazy val splitter = Pattern.compile("[^\\p{L}\\p{N}]+")
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")
  @transient private lazy val aParams = (0 until numHashes).map(minhashA).toArray
  @transient private lazy val bParams = (0 until numHashes).map(minhashB).toArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val rawToks = splitter.split(text, -1)
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
      return org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(Array.empty[Long]), new GenericArrayData(Array.empty[Long]))
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
      val a = aParams(j); val b = bParams(j)
      var k = 0
      while (k < hs.length) {
        val p = (hs(k) * a + b) % MinhashP
        if (p < m) m = p
        k += 1
      }
      sig(j) = m
      j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(hs), new GenericArrayData(sig))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 64-bit (60 used) SimHash over word tokens — the native form of
  * [[graft.ops.Dedup.simhash64Hof]]: every token occurrence votes ±1 per
  * bit of its 60-bit md5-prefix hash; a bit is set iff its vote sum is
  * positive. One pass per document; the HOF form folds a 60-counter
  * array through two lambda layers per token. */
case class SimhashExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  @transient private lazy val splitter = Pattern.compile("[^\\p{L}\\p{N}]+")
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val toks = splitter.split(text, -1)
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashExpressions {
  /** Native fused SimHash (see [[SimhashExpr]]). */
  def simhash_native(text: Column): Column =
    GraftSqlBridge.column(SimhashExpr(
      GraftSqlBridge.expression(text.cast("string"))))

  /** struct(hs, sig) in one fused pass. */
  def minhash_packed(text: Column, shingleSize: Int, numHashes: Int): Column =
    GraftSqlBridge.column(MinhashPackedExpr(
      GraftSqlBridge.expression(text.cast("string")), shingleSize, numHashes))

  /** Distinct shingle-hash set only (n-gram Jaccard path). */
  def shingle_hashes_native(text: Column, shingleSize: Int): Column =
    minhash_packed(text, shingleSize, 0).getField("hs")
}
