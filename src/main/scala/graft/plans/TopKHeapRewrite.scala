package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Optimizer rule: rewrite `row_number() OVER (PARTITION BY p ORDER BY o)
  * <= k` filters into a bounded-heap top-k aggregation.
  *
  * The window form sort-shuffles EVERY row of every partition; Spark's
  * own InferWindowGroupLimit (3.5+) prunes rows entering the sort but
  * still sorts each map partition and re-sorts after the exchange. The
  * heap form (CollectTopK + posexplode) keeps at most k rows per group
  * in the partial aggregation buffer and never sorts anything larger
  * than k — measured 19.5s -> 1.6s on the IVF argmax at sf0.1 when the
  * same rewrite was applied by hand (operators/Similarity.rankTopK).
  *
  * Fires only on the conservative shape where heap ordering provably
  * matches the window sort:
  *  - a single row_number window expression;
  *  - non-empty ORDER BY with UNIFORM direction (all ASC or all DESC)
  *    and default null ordering — a struct heap has one global
  *    direction, and per-field inversion tricks (negation) break on
  *    Long.MinValue / -0.0 / NaN;
  *  - a deterministic rank bound `rn <= k` / `rn < k` / `rn = k`
  *    (any side) with k a literal int, 1 <= k <= 1000;
  *  - every order key and child output type orderable (struct
  *    comparison), all deterministic.
  *
  * Under equal order keys the heap may pick different rows than the
  * window sort — exactly the nondeterminism row_number already has.
  * The original filter is kept above the rewrite (on the reconstructed
  * rank), so any extra conjuncts and exact/equality bounds stay
  * correct. */
object TopKHeapRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 1000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rankBound(conjuncts: Seq[Expression], rn: Attribute): Option[Int] = {
    def bound(e: Expression): Option[Int] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case _ => None
    }
    conjuncts.flatMap(bound).reduceOption(math.min)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    if (!cond.deterministic) return None
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)) =>
        val order = spec.orderSpec
        if (order.isEmpty) return None
        val uniformAsc = order.forall(o =>
          o.direction == Ascending && o.nullOrdering == NullsFirst)
        val uniformDesc = order.forall(o =>
          o.direction == Descending && o.nullOrdering == NullsLast)
        if (!uniformAsc && !uniformDesc) return None
        val keys = order.map(_.child)
        val payload = w.child.output
        if (!keys.forall(_.deterministic)) return None
        if (!(keys.map(_.dataType) ++ payload.map(_.dataType))
            .forall(RowOrdering.isOrderable)) return None

        val rn = alias.toAttribute
        val k = rankBound(splitConjunctivePredicates(cond), rn)
          .getOrElse(return None)
        if (k < 1 || k > MaxK) return None

        // when InferWindowGroupLimit already ran (extraOptimizations
        // path), drop its WindowGroupLimit: it per-partition SORTS to
        // prune to k rows — the heap subsumes the prune without sorting
        val input = w.child match {
          case WindowGroupLimit(part, ord, _: RowNumber, limit, grandchild)
            if part == spec.partitionSpec && ord == spec.orderSpec &&
              limit >= k => grandchild
          case c => c
        }

        // heap item: order keys first (decide the ordering), then the
        // full child row (rides along; ties fall through to it, which is
        // within row_number's tie nondeterminism)
        val item = CreateStruct(keys ++ payload)
        val heap = Alias(
          org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopKShim
            .collectTopK(item, k, reverse = uniformAsc)
            .toAggregateExpression(), "__graft_topk")()
        val agg = Aggregate(spec.partitionSpec, Seq(heap), input)

        val posAttr = AttributeReference("__graft_pos", IntegerType,
          nullable = false)()
        val itemAttr = AttributeReference("__graft_item",
          item.dataType.asInstanceOf[StructType], nullable = false)()
        val gen = Generate(PosExplode(heap.toAttribute),
          unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, itemAttr), agg)

        // reconstruct the window's output attributes (same exprIds, so
        // the untouched parent filter/projections still resolve)
        val restored = payload.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(itemAttr, keys.length + i), a.name)(
            exprId = a.exprId, qualifier = a.qualifier)
        }
        val rank = Alias(Add(posAttr, Literal(1)), rn.name)(
          exprId = rn.exprId, qualifier = rn.qualifier)
        Some(Filter(cond, Project(restored :+ rank, gen)))
      case _ => None
    }
  }
}
