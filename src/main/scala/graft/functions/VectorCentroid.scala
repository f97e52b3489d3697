package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.13's reserved surface): the
  * element-wise mean of a vector column — the centroid update step of
  * IVF/k-means, as an `Aggregator[IN, BUF, OUT]` usable from both the
  * typed Dataset API and untyped `agg(...)` via `toColumn`.
  *
  * The buffer is (sum-per-dimension, count); merge is element-wise —
  * associative and commutative, so Spark runs it with map-side partial
  * aggregation like any built-in. Empty input yields an empty vector.
  */
object VectorCentroid
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double])
      : (Array[Double], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      val n = math.min(acc.length, v.length)
      while (i < n) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
      : (Array[Double], Long) = {
    // counts carry through empty-sum buffers (a partition of only empty
    // vectors still counted them); ragged inputs fold over the shared
    // prefix, mirroring reduce's math.min tolerance
    if (a._1.isEmpty) (b._1, a._2 + b._2)
    else if (b._1.isEmpty) (a._1, a._2 + b._2)
    else {
      val (longer, shorter) =
        if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
      var i = 0
      while (i < shorter.length) { longer(i) += shorter(i); i += 1 }
      (longer, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  private lazy val asUdaf = org.apache.spark.sql.functions.udaf(VectorCentroid)

  /** Untyped-API handle: df.groupBy(..).agg(VectorCentroid.column(col)). */
  def column(vec: Column): Column = asUdaf(vec)
}
