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

/** Duplicate-n-gram fraction of a token array in ONE traversal (the
  * Gopher/MassiveText repetition filters, t09): equivalent to
  * `(size(g) - size(array_distinct(g))) / size(g)` over
  * `g = shingles(toks, n)`, but without materializing the n-gram
  * array — Spark's higher-order functions are CodegenFallback, so the
  * compositional form re-allocates per row; this expression streams
  * the n-grams through one hash set inside codegen. `n` is baked in
  * (a literal in every call site), like [[graft.expr.Md5Long]]'s
  * nHex. */
case class DupFraction(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n-gram size must be >= 1, got $n")
  override def inputTypes = Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // a null token array is an EMPTY document, not an unknown one: the
  // replaced when/otherwise relational form returned 0.0 there, and a
  // null-text doc must not silently vanish from t09's threshold filter
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dup_frac"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0.0
    else DupFraction.dupFrac(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      double ${ev.value} = ${childGen.isNull} ? 0.0
        : graft.expr.DupFraction.dupFrac(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DupFraction {
  /** (n-gram count - distinct n-gram count) / n-gram count; 0.0 when
    * the array is shorter than n. N-grams compare as their
    * space-joined text — identical to `array_join(slice(toks,i,n)," ")`
    * in the relational form (null elements skipped WITH their
    * separator, exactly as array_join skips them), so results are
    * bit-identical on null-bearing token arrays too. */
  def dupFrac(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): Double = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder
    var dups = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var appended = 0
      var j = 0
      while (j < n) {
        val u = arr.getUTF8String(i + j)
        if (u != null) {
          if (appended > 0) sb.append(' ')
          sb.append(u.toString)
          appended += 1
        }
        j += 1
      }
      if (!seen.add(sb.toString)) dups += 1
      i += 1
    }
    dups.toDouble / total
  }
}
