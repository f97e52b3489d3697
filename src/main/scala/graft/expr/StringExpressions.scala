package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization expression (north-star text cleaning: a
  * multilingual 100 TB corpus mixes NFC and NFD encodings of the SAME
  * visible text, so exact dedup / hashing / equality silently miss
  * matches unless ingest canonicalizes). Wraps `java.text.Normalizer`
  * (the JDK's implementation of Unicode NFC) — DuckDB's
  * `nfc_normalize` implements the identical Unicode algorithm, which
  * is what makes the t10 oracle pairing possible.
  *
  * Kept OUT of whole-stage-codegen hot-path concerns: the generated
  * code calls the same static method (string normalization is
  * table-driven; there is nothing to inline), so the expression still
  * composes inside codegen spans without breaking them. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Static helper shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC is idempotent and most text is already NFC
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
