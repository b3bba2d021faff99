package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the third `SparkSessionExtensions` injection type,
  * after the `sigmoid_ce` function and `TopKStrategy`): rewrites the
  * ubiquitous window-function top-k idiom
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY g ORDER BY o) rn FROM t) WHERE rn <= k
  *
  * into the engine's [[TopKPerGroup]] operator, which plans as a
  * partial/final bounded-heap pair — shuffling only k-bounded partial
  * output instead of the whole table, and never sorting a full group.
  * Spark's own InferWindowGroupLimit (3.5+) already inserts a
  * WindowGroupLimit below the Window to prune rows early but still
  * runs the full Window exec + filter above it; this rule replaces the
  * whole subtree. Fires only when:
  *   - the single window expression is row_number() (exact-k heap) or
  *     rank() (rewritten to the exec's WITH-TIES retention mode, which
  *     preserves the boundary-tie rows `rank() <= k` admits);
  *     dense_rank stays on the vanilla window path (its "k distinct
  *     key values" retention is a different operator),
  *   - the filter is `rn <= k` / `rn < k` / `rn = 1` on that alias,
  *   - the projection above drops the rn column (so output equals
  *     TopKPerGroup's child schema).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** Above this k the bounded heap stops being a win: the exec keeps
    * k rows per group per partition on-heap (it cannot spill, unlike
    * the sort-based window path), so a huge user-written k (or
    * Int.MaxValue as an "unbounded" idiom) must stay on the vanilla
    * window path.
    */
  private val MaxRewriteK = 1 << 20

  /** Extract (k) from a comparison on the row-number attribute. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** The Window child, looking through the WindowGroupLimit that
    * InferWindowGroupLimit may already have inserted.
    */
  private def windowChild(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  /** Split a conjunctive Filter condition into (k from the single rn
    * comparison, the remaining predicates). The remaining predicates
    * must not touch rn — `rn <= k AND rn >= 2` has pagination
    * semantics a k-heap can't express.
    */
  private def splitCondition(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (onRn, rest) = conjuncts.partition(_.references.exists(_.exprId == rn.exprId))
    onRn match {
      case Seq(single) => limitOf(single, rn).map(k => (k, rest))
      case _ => None
    }
  }

  private def splitConjunctivePredicates(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => other :: Nil
  }

  /** The automatic rank() rewrite (WITH-TIES retention) can be turned
    * off per session: its per-group state is bounded by k distinct sort
    * keys but NOT by row count (a heavily-tied bucket is kept whole,
    * on-heap and unspillable), so tie-skewed data that the vanilla
    * spillable window path handled may prefer the window. row_number()
    * (hard k rows per group) is always safe and stays on by default.
    * The explicit TopKPerGroupOps API is unaffected by this gate.
    */
  private def rankRewriteEnabled: Boolean =
    conf.getConfString("spark.graft.topk.rewriteRank", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(rankFn @ (_: RowNumber | _: Rank),
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _)))
        if part.nonEmpty // global top-k (no PARTITION BY) stays on the window path
          && (rankFn.isInstanceOf[RowNumber] || rankRewriteEnabled)
          && splitCondition(cond, alias.toAttribute).exists(_._1 <= MaxRewriteK)
          && projectList.forall(_.references.forall(_.exprId != alias.exprId)) =>
      val (k, rest) = splitCondition(cond, alias.toAttribute).get
      if (k <= 0) LocalRelation(p.output)
      else {
        // rn is computed over ALL rows before the original Filter ran,
        // so the extra predicates apply ABOVE the top-k, not below it.
        // rank() maps to WITH-TIES retention; row_number() to the exact
        // k-heap — both identical to the window-filter semantics.
        val topk = TopKPerGroup(part, order, k, windowChild(wchild),
          withTies = rankFn.isInstanceOf[Rank])
        Project(projectList, rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
      }
  }
}
