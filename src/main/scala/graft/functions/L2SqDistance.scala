package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native fused squared-L2 distance over two `array<double>` columns —
  * the k-means/IVF hot inner loop ([[CosineSimilarity]]'s sibling; same
  * justification: the composable `aggregate(zip_with(a, b, (x,y) =>
  * (x-y)*(x-y)), 0d, _+_)` allocates a difference array per row-pair and
  * evaluates two interpreted lambdas per element, while a centroid
  * assignment evaluates this once per (vector, centroid) pair — the
  * billions-of-pairs shape at training-corpus scale). One loop, zero
  * allocations, whole-stage codegen via [[doGenCode]].
  *
  * Floating-point contract: accumulates left-to-right in double from 0.0
  * — bit-identical to the sequential-fold form it replaces AND to the
  * DuckDB oracle's `list_reduce` (the e4b/e17 fixed-IVF oracles hash-pin
  * this equivalence board-wide).
  *
  * Semantics mirror the composable form exactly so the swap is invisible:
  * NULL if either side is NULL, lengths differ (zip_with pads the
  * shorter side with nulls, poisoning the fold), or ANY element is null
  * (the fold's `(x-y)*(x-y)` is null-poisoned per element); two EMPTY
  * arrays fold to the seed 0.0, not NULL.
  */
case class L2SqDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"l2_sq expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      // A null slot must poison the whole fold — ArrayData.getDouble on a
      // null slot silently reads 0.0, which the composable form would
      // never do (r15 ADVICE).
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDistance =
    copy(left = newLeft, right = newRight)
}
