package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| for two SORTED long arrays with
  * distinct non-null elements, via a single merge loop.
  *
  * Why not `size(array_intersect(a, b))`: array_intersect builds a hash
  * set per invocation — in a blocked near-dup join it runs once per
  * CANDIDATE PAIR, so the allocation dominates the O(pairs) inner loop
  * (the hot path of Jaccard dedup at 100 TB). The merge loop is
  * allocation-free, branch-predictable, and fuses into whole-stage
  * codegen.
  *
  * Contract: both inputs ascending-sorted and duplicate-free
  * (`sort_array(array_distinct(...))` — which places NULLs FIRST). On
  * unsorted input the result is undefined — callers own the sort. A NULL
  * element yields NULL, never a silent phantom match; under the sorted
  * contract any NULL sits at index 0, so one leading check per side
  * upholds this without per-element null tests in the merge loop.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // NULL can arise from non-null inputs (a null element), so nullability
  // must not be inferred from the children alone — also keeps codegen's
  // isNull a real variable rather than a folded literal.
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects array<bigint>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if ((n > 0 && x.isNullAt(0)) || (m > 0 && y.isNullAt(0))) return null
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |if (($n > 0 && $a.isNullAt(0)) || ($m > 0 && $b.isNullAt(0))) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0; int $c = 0;
         |  while ($i < $n && $j < $m) {
         |    long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |    if ($xv < $yv) { $i++; }
         |    else if ($xv > $yv) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-level API: `sorted_intersect_size(a, b)`. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectSize(GraftBridge.expression(a), GraftBridge.expression(b)))
}
