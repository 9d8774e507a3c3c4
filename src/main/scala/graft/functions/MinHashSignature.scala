package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the full MinHash signature —
  * `sig[s] = min over base hashes h of (a_s·h + b_s) mod p` — in ONE
  * pass over the base-hash array.
  *
  * Why not `array(array_min(transform(base, …)) × numHashes)`: `transform`
  * is a higher-order function — interpreted, never codegen'd — so the
  * column form walks (and allocates) the base array once PER SIGNATURE
  * SLOT: 32 interpreted traversals + 32 transient arrays per document on
  * the d3/d11/d12 signature path, the dominant cost of LSH dedup at
  * corpus scale. This expression runs the (elements × slots) arithmetic
  * in a fused primitive loop with one output allocation and participates
  * in whole-stage codegen.
  *
  * EXACT parity with the column form (asserted element-wise in
  * FunctionsSpec): same `(a·h + b) % p` long arithmetic (inputs are
  * pmod'ed into [0, p); p ≈ 2³⁰ keeps `a·h + b` < 2⁶³ — no overflow,
  * ANSI-safe), and the same degenerate-input semantics — a null or
  * empty base array (or one with only null elements) yields an ARRAY OF
  * NULL SLOTS, never a null array, exactly as `array_min(transform(…))`
  * null-propagates per slot. Null elements are skipped like `array_min`
  * skips them. */
case class MinHashSignature(child: Expression,
    seedsA: Array[Long], seedsB: Array[Long], p: Long)
    extends UnaryExpression {

  require(seedsA.length == seedsB.length && seedsA.nonEmpty,
    "seedsA/seedsB must be equal-length and non-empty")

  private def k: Int = seedsA.length

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  // degenerate inputs produce an array of null SLOTS, never a null array
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](k))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = arr.getLong(i)
        var s = 0
        while (s < k) {
          val x = (seedsA(s) * h + seedsB(s)) % p
          if (x < mins(s)) mins(s) = x
          s += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val aRef = ctx.addReferenceObj("minhashSeedsA", seedsA, "long[]")
    val bRef = ctx.addReferenceObj("minhashSeedsB", seedsB, "long[]")
    val mins = ctx.freshName("mins")
    val any = ctx.freshName("any")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val x = ctx.freshName("x")
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    val resultCode =
      code"""
        ${childGen.code}
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $any = false;
        if (!${childGen.isNull}) {
          int $n = ${childGen.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (!${childGen.value}.isNullAt($i)) {
              $any = true;
              long $h = ${childGen.value}.getLong($i);
              for (int $s = 0; $s < $k; $s++) {
                long $x = ($aRef[$s] * $h + $bRef[$s]) % ${p}L;
                if ($x < $mins[$s]) { $mins[$s] = $x; }
              }
            }
          }
        }
        $ad ${ev.value} = $any
          ? new $gad($mins)
          : new $gad(new Object[$k]);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  /** Column-level API: the k-slot MinHash signature of a base-hash
    * array under the (a, b) universal hash family mod p. */
  def minhash_signature(base: Column, seedsA: Array[Long],
      seedsB: Array[Long], p: Long): Column =
    GraftBridge.column(
      MinHashSignature(GraftBridge.expression(base), seedsA, seedsB, p))
}
