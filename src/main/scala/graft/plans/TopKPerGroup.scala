package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (SURVEY.md §7.3 tier (c), the pattern the
  * reference's R28 running-minimum snapshot generalizes to): top-k rows
  * per group as a FIRST-CLASS operator — logical node, planner strategy,
  * and a two-phase physical exec — instead of the window-function form
  * (`row_number() OVER (...) <= k`) that q40 uses.
  *
  * Why an operator, not a window: the window form must shuffle and
  * fully SORT every row of every group; this exec keeps a bounded
  * k-heap per group, runs a PARTIAL pass before the shuffle (top-k is a
  * semigroup: topk(A ∪ B) = topk(topk(A) ∪ topk(B))), so only
  * ~k·groups·partitions rows ever reach the exchange, and never sorts
  * more than k rows per group. At 100 TB that's the difference between
  * shuffling the fact table and shuffling a sample.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner strategy: partial (pre-shuffle) + final (post-shuffle)
  * physical pair, mirroring how HashAggregate plans partial/final.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, ties) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child), ties),
        ties) :: Nil
    case _ => Nil
  }
}

/** Bounded per-group top-k heap pass. `partial = true` runs on whatever
  * partitioning the child has (map-side combine); `partial = false`
  * requires a clustered distribution on the group keys, which Catalyst
  * satisfies with an Exchange over the (already k-bounded) partial
  * output.
  */
/** `withTies = true` switches from the exact-k heap to rank()-with-ties
  * retention: a row is kept iff fewer than k rows of its group sort
  * STRICTLY before it (`rank() <= k` semantics — boundary ties all
  * survive). Retention is still a semigroup (a row with ≥k strict
  * predecessors in ANY subset has ≥k globally), so the same partial/
  * final pair applies; per-group state is ≤k sort-key buckets plus the
  * boundary tie group.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // ClusteredDistribution rejects an empty clustering; a global top-k
    // (no group exprs) needs all partial output on one partition
    else if (groupExprs.isEmpty)
      org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  /** The pass never moves rows between partitions, so the child's
    * partitioning survives — without this override (the UnaryExecNode
    * default is UnknownPartitioning) a downstream window/aggregate on
    * the same group keys would re-Exchange the already-clustered,
    * k-bounded output.
    */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val sortE = ordering
    val limit = k
    // k <= 0 keeps nothing — short-circuit BOTH retention paths (the
    // heap would NPE on peek(), the tie buffer on lastKey(); the
    // optimizer-rewrite entry already maps k<=0 to a LocalRelation but
    // the direct operator API must agree)
    if (limit <= 0)
      child.execute().mapPartitions(_ => Iterator.empty,
        preservesPartitioning = true)
    else if (withTies) doExecuteTies(childOutput, groupE, sortE, limit)
    else child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val cmp = GenerateOrdering.generate(sortE, childOutput)
      // max-heap by the sort order: head = worst retained row, evicted
      // when a better row arrives and the heap is full
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val reverse = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
      }
      // SparkPlan.execute() only guarantees InternalRow; non-codegen
      // children (RDD scans, future execs) can emit GenericInternalRow
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      while (iter.hasNext) {
        val row = iter.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // the queue grows dynamically; a k-sized eager allocation is
          // wasted for small groups and overflows for k near Int.MaxValue
          heap = new java.util.PriorityQueue[UnsafeRow](math.min(limit.toLong + 1, 16L).toInt, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  /** rank()-with-ties retention pass: per group a TreeMap of sort-key
    * buckets (comparator = the codegen'd sort ordering, so rows with
    * equal sort keys share a bucket); after each insert the trailing
    * bucket is dropped while ≥k rows sort strictly before it. Retained
    * state per group is at most k buckets (their ranks are distinct and
    * ≤k) plus the boundary tie group — the documented memory trade for
    * WITH TIES, vs the heap path's hard k.
    */
  private def doExecuteTies(childOutput: Seq[Attribute], groupE: Seq[Expression],
      sortE: Seq[SortOrder], limit: Int): RDD[InternalRow] = {
    // Safety bound, read driver-side at planning: unlike the heap path
    // (hard k rows/group) the tie buffer retains WHOLE tie buckets, so
    // its row count is unbounded on tie-skewed data and it cannot
    // spill. Past this many retained rows in one partition we fail
    // fast with an actionable message instead of slow-burning an
    // executor OOM — set spark.graft.topk.rewriteRank=false (or raise
    // the bound) to route such data onto the spillable window path.
    val maxRetained = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.maxRetainedRows", (8 << 20).toString).toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val cmp = GenerateOrdering.generate(sortE, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val cmpJ = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(a, b)
      }
      // partition-wide retained-row count across ALL groups' buffers
      var retained = 0L
      final class TieBuf {
        val tree = new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](cmpJ)
        var total = 0
        def add(row: UnsafeRow): Unit = {
          // fast reject: sorts strictly after every retained row while
          // ≥k are already retained ⇒ ≥k strict predecessors
          if (total >= limit && cmp.compare(row, tree.lastKey()) > 0) return
          val copied = row.copy()
          val bucket = tree.get(copied)
          if (bucket != null) bucket.add(copied)
          else {
            val l = new java.util.ArrayList[UnsafeRow](1)
            l.add(copied)
            tree.put(copied, l)
          }
          total += 1
          retained += 1
          var done = false
          while (!done && !tree.isEmpty) {
            val last = tree.lastEntry()
            if (total - last.getValue.size() >= limit) {
              tree.remove(last.getKey)
              total -= last.getValue.size()
              retained -= last.getValue.size()
            } else done = true
          }
          if (retained > maxRetained) throw new IllegalStateException(
            s"TopKPerGroup WITH-TIES retained > $maxRetained rows in one " +
              "partition (tie-skewed data); set spark.graft.topk.rewriteRank=false " +
              "to use the spillable window path, or raise spark.graft.topk.maxRetainedRows")
        }
      }
      val groups = new java.util.HashMap[UnsafeRow, TieBuf]()
      while (iter.hasNext) {
        val row = iter.next() match {
          case u: UnsafeRow => u
          case r => toUnsafe(r)
        }
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = new TieBuf
          groups.put(key.copy(), buf)
        }
        buf.add(row)
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap(
        _.tree.values().iterator().asScala.flatMap(_.iterator().asScala))
    }, preservesPartitioning = true)
  }
}

/** User-facing entry: `TopKPerGroup.of(df, groupCols, sortCols, k)`. */
object TopKPerGroupOps {
  /** Plans `df` through the custom operator. Registers the strategy on
    * the session's experimental methods (idempotent) — the
    * spark.sql.extensions path in [[graft.GraftExtensions]] does the
    * same for packaged deployments.
    */
  def topKPerGroup(spark: SparkSession, df: DataFrame,
                   groupCols: Seq[Column], sortCols: Seq[Column], k: Int,
                   withTies: Boolean = false): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = GraftBridge.analyzedPlan(df)
    val ordering = sortCols.map(c => GraftBridge.expr(spark, c)).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftBridge.ofRows(spark,
      TopKPerGroup(groupCols.map(c => GraftBridge.expr(spark, c)), ordering, k,
        plan, withTies))
  }
}
