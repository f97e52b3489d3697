package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double↔long bit maps (the classic sortable-bits
  * transform used by index engines for numeric range keys): a double's
  * IEEE-754 bits with the 63 value bits flipped when the sign bit is
  * set. Signed-long comparison of the mapped values equals double
  * comparison (negatives before positives, magnitudes ordered within
  * each sign; -0.0 sorts immediately before +0.0, NaN above +Inf —
  * distances are non-negative and NaN-free, so neither edge arises on
  * the kNN path).
  *
  * Purpose: [[graft.functions.GroupedTopK]] keeps its bounded heaps in
  * flat long arrays. Mapping a double distance through
  * [[DoubleSortableLong]] lets the SAME exact long-keyed aggregate rank
  * double keys; [[SortableLongDouble]] (the identical xor — the map is
  * an involution on the bit pattern) restores the original double
  * bit-for-bit, so a ranked distance column round-trips exactly.
  */
abstract class SortableBitsExpression extends UnaryExpression
    with ImplicitCastInputTypes {
  override def nullIntolerant: Boolean = true
}

/** double → order-preserving long (`graft_sortable_bits`). */
case class DoubleSortableLong(child: Expression)
    extends SortableBitsExpression {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sortable_bits"

  override def nullSafeEval(a: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(a.asInstanceOf[Double])
    b ^ ((b >> 63) & Long.MaxValue)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
        long $b = java.lang.Double.doubleToLongBits($c);
        ${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Inverse of [[DoubleSortableLong]] (`graft_sortable_double`). */
case class SortableLongDouble(child: Expression)
    extends SortableBitsExpression {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sortable_double"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
        long $b = $c ^ (($c >> 63) & 0x7fffffffffffffffL);
        ${ev.value} = java.lang.Double.longBitsToDouble($b);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
