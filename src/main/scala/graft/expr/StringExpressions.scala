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

/** One-pass repetition statistics of a token array (the t13 Gopher-
  * style gates): struct(top_uni = multiplicity of the most frequent
  * unigram — null tokens counting as one group, exactly like a groupBy
  * null group; top_bi / dup_bi = multiplicity of the most frequent
  * bigram and total bigram mass in bigrams occurring more than once).
  * Bigrams compare as their space-joined text with array_join's
  * null-skipping, identical to [[graft.functions.TextOps.shingles]] —
  * so the numbers are bit-identical to the relational explode→groupBy
  * form (RepetitionGatesSpec pins all three paths row-for-row).
  *
  * Scale rationale: these are per-document signals of in-row data.
  * The relational form shuffles the tokenized corpus twice; Spark's
  * `aggregate` higher-order fold is exchange-free but CodegenFallback
  * (per-element interpreted eval). This expression streams both n-gram
  * tallies through two open hash maps in ONE traversal inside codegen. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("top_uni", LongType, nullable = false),
    StructField("top_bi", LongType, nullable = false),
    StructField("dup_bi", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rep_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.stats(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.RepetitionStats.stats($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RepetitionStats {
  /** Tally keys are UTF8String (valid HashMap keys — value equality /
    * hashCode over the bytes): unigram keys are views into the row's
    * array data, bigram keys are built by the SAME
    * `UTF8String.concatWs` null-skip join as [[Shingles.shingle]], so
    * the two expressions cannot drift apart on null semantics. Both
    * maps live only within one `stats` call, so the views never
    * outlast the row they point into. */
  def stats(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val uni = new java.util.HashMap[UTF8String, Array[Long]](n * 2)
    var nulls = 0L
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u == null) nulls += 1
      else {
        val c = uni.get(u)
        if (c == null) uni.put(u, Array(1L)) else c(0) += 1
      }
      i += 1
    }
    var topUni = nulls
    val uit = uni.values().iterator()
    while (uit.hasNext) topUni = math.max(topUni, uit.next()(0))

    val nBi = n - 1
    var topBi = 0L
    var dupBi = 0L
    if (nBi > 0) {
      val bi = new java.util.HashMap[UTF8String, Array[Long]](nBi * 2)
      i = 0
      while (i < nBi) {
        val key = UTF8String.concatWs(Shingles.SEP,
          arr.getUTF8String(i), arr.getUTF8String(i + 1))
        val c = bi.get(key)
        if (c == null) bi.put(key, Array(1L)) else c(0) += 1
        i += 1
      }
      val bit = bi.values().iterator()
      while (bit.hasNext) {
        val c = bit.next()(0)
        if (c > topBi) topBi = c
        if (c > 1) dupBi += c
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](topUni, topBi, dupBi))
  }
}

/** Codegen n-gram shingling: the array of space-joined n-token
  * windows of a token array, bit-identical to the compositional form
  * `transform(sequence(1, size-n+1), i -> array_join(slice(toks,i,n),
  * " "))` with the `< n tokens -> empty array` guard (see
  * [[graft.functions.TextOps.shinglesHof]], the original). That form
  * is three nested CodegenFallback higher-order functions re-invoked
  * interpreted per row — measured 1.8 s of t04's 2.1 s at sf0.1. This
  * expression builds the window array in one pass with
  * `UTF8String.concatWs` (which skips null inputs exactly as
  * array_join skips null elements, with no separator for them).
  *
  * A null input array yields the EMPTY array, matching the original's
  * `when(size(toks) >= n, ...).otherwise(array())` — `size(null)` is
  * null, so the null-array case fell through to `otherwise` there. */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  import org.apache.spark.sql.types._
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Shingles.EMPTY
    else Shingles.shingle(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${childGen.isNull} ? graft.expr.Shingles.EMPTY()
          : graft.expr.Shingles.shingle(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Shingles {
  private val empty: org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])
  /** Method (not field) so generated Java can reference it. */
  def EMPTY(): org.apache.spark.sql.catalyst.util.ArrayData = empty

  private[expr] val SEP = UTF8String.fromString(" ")

  def shingle(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val total = arr.numElements() - n + 1
    if (total <= 0) return empty
    val out = new Array[Any](total)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) { win(j) = arr.getUTF8String(i + j); j += 1 }
      // concatWs skips null inputs without a separator — exactly
      // array_join's null-element behavior
      out(i) = UTF8String.concatWs(SEP, win: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
