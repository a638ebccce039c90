package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization of a
  * string column — the canonical-composition step of text cleaning
  * (é as e+◌́ and é as U+00E9 must hash, dedup, and tokenize
  * identically).
  *
  * Spark ships no normalization function, and the alternatives pay
  * real costs at scan width: a Scala UDF serializes every row out of
  * Tungsten, and mapPartitions drops the whole projection out of
  * codegen. `doGenCode` emits a direct `java.text.Normalizer` call
  * into the generated stage — one virtual call per row, the string
  * never leaves the operator.
  *
  * Semantics: `Normalizer.normalize(s, NFC)`; null → null. Already
  * NFC-normalized text (all of ASCII) round-trips bit-identically —
  * DuckDB's `nfc_normalize` computes the same transform, which is the
  * q84 oracle contract.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires a string argument, got " +
              other.simpleString)
    }

  // preserve the input's collation under Spark 4 collated strings
  override def dataType: DataType = child.dataType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  java.text.Normalizer.normalize($c.toString(),
       |    java.text.Normalizer.Form.NFC));
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
