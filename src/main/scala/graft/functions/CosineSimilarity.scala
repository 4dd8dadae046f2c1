package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native fused cosine similarity over two `array<double>` columns
  * (float arrays are implicitly cast up).
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_) /
  * (sqrt(...) * sqrt(...))` — allocates an intermediate product array and
  * two squared arrays per row and walks the vectors five times. This
  * expression is one loop, zero allocations, and stays inside whole-stage
  * codegen ([[doGenCode]]), which is why a custom `Expression` (option (b)
  * in the build plan's preference order) is justified here: the built-ins
  * express the semantics but not the memory profile that a
  * billions-of-pairs similarity join needs.
  *
  * Floating-point contract: accumulates left-to-right in double, starting
  * at 0.0 — bit-identical to the sequential-fold form and to external
  * engines that fold lists sequentially (the DuckDB oracle validates this).
  *
  * NULL if either side is NULL, lengths differ, either norm is zero, the
  * arrays are empty, or ANY element is null (ArrayData.getDouble on a
  * null slot would silently read 0.0 — the composable form null-poisons
  * the fold instead, and this expression matches it).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // (ImplicitCastInputTypes would be the idiomatic coercion hook, but its
  // signature exposes the private[sql] AbstractDataType — external
  // expressions validate here instead; the registration builder inserts
  // the float→double Cast.)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements() || $n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |    if ($denom == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
