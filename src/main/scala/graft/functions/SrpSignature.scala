package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the packed random-hyperplane (SRP)
  * signature — bit p of the result long is set iff `vec · plane_p ≥ 0`
  * — in ONE pass per plane over the vector.
  *
  * Why not per-plane `aggregate(zip_with(vec, plane, …))`: higher-order
  * functions run interpreted, so the column form walks the embedding
  * (and allocates a zipped array) once PER PLANE — 8–16 interpreted
  * traversals per vector on the ANN/near-dup signing path (e2/e3/e9/
  * e11). This expression runs the (dims × planes) arithmetic in a fused
  * primitive loop and participates in whole-stage codegen.
  *
  * EXACT parity with the column form (asserted in FunctionsSpec): the
  * projection accumulates left-to-right in double with float elements
  * cast up, exactly like the `aggregate` fold; positions where either
  * side is missing (vector shorter than the plane, plane shorter than
  * the vector, null element) contribute 0.0 — the zip_with/coalesce
  * semantics; an all-missing or EMPTY vector projects to 0.0, whose
  * `≥ 0` sets the bit (the column form's behavior); a NULL vector yields
  * signature 0L (every `when(null ≥ 0, bit)` falls to `otherwise(0)`). */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    s"planes (${planes.length}) must be in [1,64] — one bit per plane")

  private def k: Int = planes.length

  override def dataType: DataType = LongType

  // a NULL vector signs to 0L, never to null (when/otherwise semantics)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_signature expects array<float>, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < k) {
      val plane = planes(p)
      val m = math.min(n, plane.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) acc += arr.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    val sig = ctx.freshName("sig")
    val p = ctx.freshName("p")
    val plane = ctx.freshName("plane")
    val m = ctx.freshName("m")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val resultCode =
      code"""
        ${childGen.code}
        long $sig = 0L;
        if (!${childGen.isNull}) {
          int $n = ${childGen.value}.numElements();
          for (int $p = 0; $p < $k; $p++) {
            double[] $plane = $planesRef[$p];
            int $m = $n < $plane.length ? $n : $plane.length;
            double $acc = 0.0;
            for (int $i = 0; $i < $m; $i++) {
              if (!${childGen.value}.isNullAt($i)) {
                $acc += ((double) ${childGen.value}.getFloat($i)) * $plane[$i];
              }
            }
            if ($acc >= 0) { $sig |= (1L << $p); }
          }
        }
        long ${ev.value} = $sig;
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SrpSignature = copy(child = newChild)
}

object SrpSignature {
  /** Column-level API: the packed SRP bucket signature of a float
    * embedding under the given hyperplanes. */
  def srp_signature(vec: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(SrpSignature(GraftBridge.expression(vec), planes))
}
