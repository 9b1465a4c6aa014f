package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression for |A ∩ B| over two SORTED-DISTINCT
  * string arrays — the candidate-verify hot path (q31/q113/q147 and
  * the q107/q127 weighted-edge build). `size(array_intersect(a, b))`
  * rebuilds a hash set of one side and re-hashes every element of the
  * other PER CANDIDATE PAIR — and a doc's shingle array is re-hashed
  * once per pair it appears in. With both sides sorted, the size is a
  * single allocation-free two-pointer merge walk inside whole-stage
  * codegen: O(|A|+|B|) comparisons, zero hashing, zero set
  * materialization (the r17 A/B measured the swap; BASELINE.md
  * "sorted-intersect A/B").
  *
  * CALLER CONTRACT (holds for the shingle arrays by construction —
  * `shingleSet` sorts DISTINCT shingles): both arrays are duplicate-
  * free, contain no NULL elements, and are ascending under UTF8String
  * binary order — which equals CODE-POINT order (UTF-8 unsigned byte
  * comparison), NOT Java's UTF-16 `String.compareTo` (they diverge on
  * supplementary-plane characters vs U+E000..U+FFFF; the build side
  * sorts with `DedupFunctions.codePointCompare` to match exactly, and
  * ExpressionSpec pins equality with `size(array_intersect)` on
  * adversarial inputs spanning that divergence). NULL input array →
  * NULL, matching `size(array_intersect)` under the non-legacy
  * `size(NULL) = NULL` default.
  */
case class SortedStringIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedStringIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Column-API front for the set expressions. */
object SetExpressions {
  /** |A ∩ B| for sorted-distinct string arrays — see
    * [[SortedStringIntersectSize]] for the caller contract.
    */
  def intersectSizeSorted(a: Column, b: Column): Column =
    GraftBridge.column(SortedStringIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
