package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression
  * (SQL `nfc_normalize`, registered by [[graft.GraftExtensions]]).
  *
  * Canonical composition is table-stakes corpus hygiene: the same visible
  * text arrives both precomposed ("é" U+00E9) and decomposed ("e" +
  * U+0301) depending on the source (macOS filenames, OCR, some crawls),
  * and every downstream hash — exact dedup fingerprints, minhash
  * shingles, contamination n-grams — treats the two as DIFFERENT
  * documents unless ingestion canonicalizes. No Spark built-in expresses
  * it (preference order (b): a native `Expression` beats a UDF), while
  * `java.text.Normalizer` is core JDK — the same ICU-derived tables
  * DuckDB's `nfc_normalize` uses, which is what makes the oracle exact.
  *
  * The common case (already-NFC ASCII/Latin text) takes an
  * `isNormalized` fast path that returns the input buffer unchanged —
  * no string materialization unless composition actually rewrites. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string argument, got $other")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("nfcStr")
      s"""
         |java.lang.String $tmp = $c.toString();
         |if (java.text.Normalizer.isNormalized($tmp, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($tmp, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
