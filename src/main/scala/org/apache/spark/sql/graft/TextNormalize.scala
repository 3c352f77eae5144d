package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression. Training-data
  * ingestion sees the same text in composed and decomposed encodings
  * (copy-paste provenance, OCR, macOS filenames); exact and shingle
  * dedup treat `e` + U+0301 and `é` as different documents unless the
  * corpus is normalized first. Spark has no built-in normalizer, and a
  * Scala UDF would force serialization out of Tungsten rows for every
  * value. The kernel stays inside whole-stage codegen: the generated
  * code calls `java.text.Normalizer` (JDK-resident, zero deps) and
  * fast-paths the overwhelmingly common already-NFC case with
  * `isNormalized` (no allocation when the text is already composed —
  * `Normalizer.normalize` always re-builds the string).
  *
  * DuckDB twin: `nfc_normalize(text)`. Both sides implement Unicode
  * canonical composition; the compositions exercised by the entries
  * (Latin letter + combining mark) have been stable across Unicode
  * versions since 3.0, so JDK vs utf8proc version skew cannot split
  * the oracle.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val jstr = ctx.freshName("jstr")
      s"""
         |java.lang.String $jstr = $a.toString();
         |if (java.text.Normalizer.isNormalized($jstr, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $a;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($jstr, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
