package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{CosineSimilarity, L2SqDistance, NfcNormalize}

/** Session extensions registering graft's native expressions.
  *
  * Install with either
  *   `SparkSession.builder.withExtensions(new GraftExtensions)` or
  *   `--conf spark.sql.extensions=graft.GraftExtensions`,
  * then call as SQL `cosine_sim(a, b)` or
  * `call_function("cosine_sim", colA, colB)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"cosine_sim expects 2 arguments, got ${children.length}")
        // Coerce array<float> (and friends) up to array<double> here — the
        // expression itself demands exact types.
        val coerced = children.map(c => Cast(c, ArrayType(DoubleType)))
        CosineSimilarity(coerced.head, coerced(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2SqDistance].getName, "l2_sq"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"l2_sq expects 2 arguments, got ${children.length}")
        val coerced = children.map(c => Cast(c, ArrayType(DoubleType)))
        L2SqDistance(coerced.head, coerced(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize expects 1 argument, got ${children.length}")
        NfcNormalize(children.head)
      }))
  }
}
