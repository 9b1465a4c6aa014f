package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product — the
  * tier-(b) extension path (SURVEY.md §7.6): the declarative forms
  * (`aggregate`/`zip_with` lambdas) run interpreted per element, and a
  * statically-unrolled sum compiles into JIT-hostile kilomethods. This
  * compiles to a tight primitive loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to `VectorFunctions.dot` (and the DuckDB
  * oracle's fold): left-to-right double accumulation from 0.0; NULL when
  * either array is NULL, any element is NULL, or lengths differ (the
  * `zip_with` null-padding → null-product → null-sum behavior).
  */
case class FloatVectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs must be array<float> (the embedding column type); this is an
  // internal expression, wired only through VectorExpressions/vec_dot
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** [[FloatVectorDot]] against a BUILD-TIME weight vector (an LSH
  * hyperplane): the weights ride along as a codegen reference object
  * (`double[]`), not as a literal-array child, so the generated code is
  * one tight loop — not the 8 × dims-term unrolled tree that a
  * per-element literal expansion produces (JIT-hostile, and measured
  * 3× SLOWER than even the interpreted fold on the q38 scan).
  *
  * Null semantics mirror `VectorFunctions.dotLiteral`'s zip_with shape
  * exactly: NULL when the vector is NULL, any element is NULL, or the
  * length differs from the weight count (zip_with null-padding).
  */
case class FloatVectorDotLiteral(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_literal"

  private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != w.length) return null
    var s = 0.0
    var i = 0
    while (i < w.length) {
      if (x.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * w(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("planeWeights", w, "double[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $wRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $wRef.length; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * $wRef[$i];
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatVectorDotLiteral =
    copy(child = newChild)
}

/** Column-API front for the native expressions. */
object VectorExpressions {
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine with the same null/zero-norm guard as `VectorFunctions.cosine`. */
  def vecCosine(a: Column, b: Column): Column = {
    val na = vecNorm(a)
    val nb = vecNorm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(vecDot(a, b) / (na * nb))
  }

  def vecDotLiteral(vec: Column, weights: Seq[Double]): Column =
    GraftBridge.column(FloatVectorDotLiteral(
      GraftBridge.expression(vec), weights))

  /** Codegen'd twin of `VectorFunctions.lshBucket` — identical bit
    * construction (`when(dot >= 0.0, 2ᵇ).otherwise(0)` summed LSB-first,
    * so a NULL projection contributes bit 0, never a NULL bucket), with
    * each plane projection a [[FloatVectorDotLiteral]] tight loop. The
    * hot-scan form: LSH bucketing touches every corpus row, and the
    * interpreted `aggregate`/`zip_with` fold dominated the whole q38/q66
    * scan. ExpressionSpec pins bucket-for-bucket equality with the
    * declarative reference on real embeddings.
    */
  def lshBucket(vec: Column, nBits: Int, dims: Int): Column =
    (0 until nBits).map { b =>
      when(vecDotLiteral(vec,
        graft.functions.VectorFunctions.planeWeights(b, dims)) >= 0.0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
}
