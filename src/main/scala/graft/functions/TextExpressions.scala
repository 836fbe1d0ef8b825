// Lives under org.apache.spark.sql.* for the same reason as
// VectorExpressions: the expression-authoring surface is private[sql].
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY "built-in vs custom" preference (b)):
  * Spark has no normalization built-in, and a Scala UDF would pay
  * serialization + closure dispatch per row on what is a corpus-wide
  * cleaning pass — the FIRST pass of web-corpus curation, touching every
  * byte of the 100 TB input. The kernel stays inside WholeStageCodegen
  * and fast-paths the dominant case: a pure-ASCII string (`numBytes ==
  * numChars`) is definitionally normalized under every form, so it is
  * returned as-is with NO decode and NO allocation. Non-ASCII strings
  * check `Normalizer.isNormalized` (one scan, no allocation for
  * already-normal text — nearly all real UTF-8) before paying for the
  * rewrite.
  *
  * The JDK normalizer implements the Unicode-standard canonical/
  * compatibility (de)composition — the same algorithm DuckDB's
  * `nfc_normalize` (utf8proc) implements, which is what makes the NFC
  * path oracle-checkable cross-engine. */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression with ExpectsInputTypes {

  private val form: Normalizer.Form = Normalizer.Form.valueOf(formName)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (u.numBytes() == u.numChars()) u
    else {
      val s = u.toString
      if (Normalizer.isNormalized(s, form)) u
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      s"""
         |if ($in.numBytes() == $in.numChars()) {
         |  ${ev.value} = $in;
         |} else {
         |  java.lang.String $s = $in.toString();
         |  if (java.text.Normalizer.isNormalized($s,
         |      java.text.Normalizer.Form.$formName)) {
         |    ${ev.value} = $in;
         |  } else {
         |    ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s,
         |        java.text.Normalizer.Form.$formName));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object TextExpressions {
  private val Forms = Set("NFC", "NFD", "NFKC", "NFKD")

  def unicodeNormalize(text: Column, form: String): Column = {
    require(Forms.contains(form),
      s"unicodeNormalize: form must be one of ${Forms.mkString("/")}, got '$form'")
    ExpressionUtils.column(
      UnicodeNormalize(ExpressionUtils.expression(text), form))
  }
}
