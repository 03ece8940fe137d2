package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `ARRAY<DOUBLE>` columns, with whole-stage codegen (`doGenCode`).
  *
  * Why a native expression (extension ladder step (b), builder brief):
  * the lambda-HOF formulation (`aggregate ∘ zip_with`) is CodegenFallback
  * — interpreted, boxing every element — and sits on the hot path of
  * brute-force ANN and embedding near-dup, where it runs once per
  * (query, corpus) PAIR. The generated code is a fused primitive loop:
  * one pass computing dot, |a|² and |b|² together, no allocation.
  * Returns 0.0 when either norm is zero (matches graft.functions
  * .cosine_similarity); same left-to-right accumulation order, so results
  * are bit-identical to the HOF version and the DuckDB oracle. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are guaranteed array<double> by the cosine_native wrapper cast
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper: codegen'd cosine similarity (casts inputs to
    * array<double> so float embeddings work directly). */
  def cosine_native(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarityExpr(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Column wrapper: codegen'd product-quantization encode. */
  def pq_encode_native(v: Column, codebook: Array[Double],
                       m: Int, k: Int, subDim: Int): Column =
    GraftSqlBridge.column(PqEncodeExpr(
      GraftSqlBridge.expression(v.cast("array<double>")), codebook, m, k, subDim))
}

/** Product-quantization encoder: assigns each subvector of an
  * `ARRAY<DOUBLE>` to its nearest codebook centroid (L2, ties to the
  * lowest index — the deterministic choice an external engine can
  * replicate). The flat codebook rides along as a referenced object;
  * `compute` is a primitive triple loop (m × k × subDim) and
  * `doGenCode` keeps the single call inside whole-stage codegen — the
  * HOF formulation would interpret ~m·k·subDim lambda frames per row. */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
                        m: Int, k: Int, subDim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType,
      containsNull = false)
  override def prettyName: String = "pq_encode"

  def compute(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue; var bc = 0
      var c = 0
      while (c < k) {
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = v.getDouble(j * subDim + i) - codebook(j * k * subDim + c * subDim + i)
          d += x * x; i += 1
        }
        if (d < best) { best = d; bc = c }
        c += 1
      }
      codes(j) = bc; j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = compute(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
