package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic md5-prefix hash as ONE codegen expression —
  * bit-identical to the `conv(substring(md5(x), 1, nHex), 16, 10)`
  * composition the oracle queries were built on (the parity is pinned
  * in VectorExpressionsSpec), but without materializing the 32-char
  * hex string and re-parsing it per call: the digest's leading nibbles
  * fold straight into a long. Every dedup/text-analysis query hashes
  * |tokens| or |shingles| values through this, so the per-call
  * constant matters at corpus scale.
  *
  * nHex = 8 → the 32-bit variant, nHex = 15 → the 60-bit variant
  * (both < 2^63, always non-negative).
  */
case class Md5Long(child: Expression, nHex: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nHex > 0 && nHex <= 15, s"nHex must be in [1,15], got $nHex")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_long"

  override def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[UTF8String], nHex)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.Md5Long.hash($c, $nHex)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5Long {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nHex` hex nibbles of md5(bytes of s), as a long — exactly
    * `parseLong(md5hex.take(nHex), 16)`. */
  def hash(s: UTF8String, nHex: Int): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
