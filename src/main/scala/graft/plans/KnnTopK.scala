package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Descending, Expression, IntegerLiteral, InterpretedOrdering, Literal, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LogicalPlan, Project, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, Partitioning, SinglePartition, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

import graft.expr.{CosineSimilarity, DotProduct, L2Distance}

/** Whole-operator kNN top-k — the SURVEY.md §7.4 stretch surface:
  * a custom `LogicalPlan` + optimizer `Rule` + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.expr.GraftExtensions]]).
  *
  * WHAT it rewrites: the declarative similarity-search idiom
  * `df.withColumn("dist", l2(vec, lit(q))).orderBy("dist", "id").limit(k)`
  * (ref `generate_embeddings.py:418-452` — pgvector `ORDER BY
  * embedding <-> q LIMIT k`).
  *
  * WHY Spark's TakeOrderedAndProject isn't already optimal: it keeps a
  * bounded heap of ROWS and evaluates the sort expressions inside the
  * comparator — O(d·log k) distance evaluations per input row for a
  * d-dim vector key. [[KnnTopKExec]] evaluates the distance ONCE per
  * row (codegen'd upstream when the key is a projected column), caches
  * the double alongside the row, and heap-compares primitives:
  * O(d + log k) per row. Tiebreak keys are only evaluated on distance
  * ties.
  *
  * Scale shape is identical to TakeOrderedAndProject: per-partition
  * bounded heaps (map-side, no materialized sort), then an AllTuples
  * exchange carrying at most `partitions × k` rows into the final
  * k-merge. Nothing is ever globally sorted.
  *
  * Session flags: `spark.graft.knnTopK.enabled` (default true),
  * `spark.graft.knnTopK.maxK` (default 10000 — above that a heap per
  * partition stops being obviously right; fall through to Spark).
  */
case class KnnTopK(limit: Int, order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(limit)
  override protected def withNewChildInternal(c: LogicalPlan): KnnTopK =
    copy(child = c)
}

/** Matches Limit over a global Sort whose PRIMARY key is an expensive
  * double-valued vector expression (graft distance/similarity), either
  * inline in the Sort or aliased one Project below it. */
case class KnnTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.knnTopK.enabled", "true").toBoolean
  private def maxK: Int =
    conf.getConfString("spark.graft.knnTopK.maxK", "10000").toInt

  /** The head sort key, seen through one level of Project aliasing. */
  private def resolveHead(key: Expression, child: LogicalPlan): Expression =
    (key, child) match {
      case (a: Attribute, Project(projList, _)) =>
        projList.collectFirst {
          case al: Alias if al.toAttribute.semanticEquals(a) => al.child
        }.getOrElse(key)
      case _ => key
    }

  /** "Expensive vector key against a fixed query": one of the graft
    * vector expressions with a literal (the query vector) on one side. */
  private def isVectorKey(e: Expression): Boolean = e match {
    case L2Distance(_, _: Literal) | L2Distance(_: Literal, _) => true
    case CosineSimilarity(_, _: Literal) | CosineSimilarity(_: Literal, _) => true
    case DotProduct(_, _: Literal) | DotProduct(_: Literal, _) => true
    case _ => false
  }

  private def eligible(k: Int, order: Seq[SortOrder],
      sortChild: LogicalPlan): Boolean =
    k > 0 && k <= maxK && order.nonEmpty &&
      order.head.child.dataType == DoubleType &&
      isVectorKey(resolveHead(order.head.child, sortChild))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case Limit(IntegerLiteral(k), Sort(order, true, child, _))
          if eligible(k, order, child) =>
        KnnTopK(k, order, child)
      // the common `sort.limit.select` shape: Catalyst pushes the final
      // projection below the limit, landing it between Limit and Sort.
      // Deterministic row-wise projection commutes with top-k, so hoist
      // it above KnnTopK.
      case Limit(IntegerLiteral(k),
          p @ Project(projectList, Sort(order, true, child, _)))
          if eligible(k, order, child) && projectList.forall(_.deterministic) =>
        p.copy(child = KnnTopK(k, order, child))
    }
  }
}

/** Plans [[KnnTopK]] as a local/global [[KnnTopKExec]] pair; the global
  * side requires AllTuples, so EnsureRequirements inserts the standard
  * single-partition exchange between them. */
case class KnnTopKStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnTopK(k, order, child) =>
      val local = KnnTopKExec(k, order, global = false, planLater(child))
      KnnTopKExec(k, order, global = true, local) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k by a once-evaluated double key.
  *
  * Each instance streams its input through a size-k binary heap keyed
  * on the cached primary double (direction + null ordering honored);
  * rows are only copied when they enter the heap. Secondary sort keys
  * go through an [[InterpretedOrdering]] and are consulted ONLY on
  * primary-key ties. Output is emitted in final sorted order.
  */
case class KnnTopKExec(limit: Int, order: Seq[SortOrder], global: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] = child.output
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning =
    if (global) SinglePartition else child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (global) AllTuples :: Nil else UnspecifiedDistribution :: Nil
  override def nodeName: String =
    if (global) "KnnTopKGlobal" else "KnnTopKLocal"

  protected override def doExecute(): RDD[InternalRow] = {
    val k = limit
    val ord = order
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val head = ord.head
      val boundHead = BindReferences.bindReference(head.child, childOutput)
      // +1 on ascending-better, -1 on descending-better, applied to the
      // primitive compare; nulls placed per the SortOrder's null ordering
      val dir = head.direction match {
        case Ascending => 1
        case Descending => -1
      }
      val nullCmp = head.nullOrdering match {
        case NullsFirst => -1 // null ranks before any value
        case NullsLast => 1
      }
      val tieOrd: Ordering[InternalRow] =
        if (ord.tail.isEmpty) null
        else new InterpretedOrdering(ord.tail.map(so =>
          so.copy(child = BindReferences.bindReference(so.child, childOutput))))

      final class Entry(val isNull: Boolean, val key: Double,
          val row: InternalRow)

      // total output order over entries (negative = a ranks first)
      def cmp(a: Entry, b: Entry): Int = {
        val primary =
          if (a.isNull && b.isNull) 0
          else if (a.isNull) nullCmp
          else if (b.isNull) -nullCmp
          else dir * java.lang.Double.compare(a.key, b.key)
        if (primary != 0 || tieOrd == null) primary
        else tieOrd.compare(a.row, b.row)
      }

      // max-heap: peek() is the WORST kept entry
      val heap = new java.util.PriorityQueue[Entry](math.max(k, 1),
        (a: Entry, b: Entry) => cmp(b, a))
      while (iter.hasNext) {
        val row = iter.next()
        val v = boundHead.eval(row)
        val isNull = v == null
        val key = if (isNull) 0.0 else v.asInstanceOf[Double]
        if (heap.size < k) {
          heap.add(new Entry(isNull, key, row.copy()))
        } else {
          // primitive compare BEFORE any allocation or row copy — the
          // common case (candidate worse than the kept worst) touches
          // nothing on the heap path
          val worst = heap.peek()
          val keyCmp =
            if (isNull && worst.isNull) 0
            else if (isNull) nullCmp
            else if (worst.isNull) -nullCmp
            else dir * java.lang.Double.compare(key, worst.key)
          val better = keyCmp < 0 || (keyCmp == 0 && tieOrd != null &&
            tieOrd.compare(row, worst.row) < 0)
          if (better) {
            heap.poll()
            heap.add(new Entry(isNull, key, row.copy()))
          }
        }
      }
      val out = new Array[Entry](heap.size)
      var i = 0
      while (heap.size > 0) { out(i) = heap.poll(); i += 1 }
      // heap drains worst-first; reverse for ascending output order
      numOutputRows += out.length
      out.reverseIterator.map(_.row)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): KnnTopKExec =
    copy(child = c)
}
