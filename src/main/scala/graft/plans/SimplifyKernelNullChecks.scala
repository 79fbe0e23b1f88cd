package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DistinctTokenCountScan, LangGuessScan, MinHashSignature, RollingHash64, SeqDot, ShingleHashes, ShingleStrings, SimHashSignature, SortedIntersectCount, TokenCountScan, TokensScan}

/** Collapse `IsNotNull(<expensive kernel chain>)` to `IsNotNull(<inputs>)`.
  *
  * Catalyst's constraint propagation infers IsNotNull filters from join /
  * filter conditions and pushes them toward the scan. When the checked
  * column is an alias over one of graft's per-row kernels, the inferred
  * predicate re-evaluates the WHOLE kernel a second time — below the widen
  * repartition, i.e. serially on the raw scan's few partitions (measured:
  * q28-shaped candidate generation 3.4s vs 1.3s at sf0.1, and q81 at 15.6s
  * before its call-site fix). Disabling constraint propagation globally
  * would throw away useful inference everywhere else; instead this rule
  * rewrites exactly the pathological checks.
  *
  * Soundness: every graft kernel evaluates via nullSafeEval and never
  * returns null for non-null inputs, so `IsNotNull(k(x)) ⟺ IsNotNull(x)`
  * BOTH ways — the rewrite is exact, not a relaxation, and therefore safe
  * for user-written predicates too, not just inferred ones. The descent
  * only passes through a whitelist of wrappers with the same two-way
  * property (size/sort_array/array_distinct/transform/cast/string ops);
  * anything else — CaseWhen, try_*, element_at, hash functions (xxhash64
  * maps NULL to the seed!) — stops the rewrite, leaving the predicate
  * untouched. `graft.tools.PlanAudit` is the catch-all net for chains the
  * whitelist doesn't cover.
  *
  * Registered through `experimentalMethods.extraOptimizations`
  * ([[graft.core.GraftSession]]), which lands AFTER constraint inference
  * and predicate pushdown — the monster is simplified wherever it sits,
  * and the surviving cheap IsNotNull over the raw column is eligible for
  * parquet filter pushdown at physical planning.
  */
object SimplifyKernelNullChecks extends Rule[LogicalPlan] {

  private def isKernel(e: Expression): Boolean = e match {
    case _: ShingleHashes | _: ShingleStrings | _: TokensScan |
        _: TokenCountScan | _: DistinctTokenCountScan | _: LangGuessScan |
        _: MinHashSignature | _: SimHashSignature | _: RollingHash64 |
        _: SortedIntersectCount | _: SeqDot => true
    case _ => false
  }

  /** Children whose combined null-ness is EQUIVALENT to e's (both
    * directions), or None when e offers no such guarantee. The guards on
    * Size and Cast matter: size(null) = -1 under the legacy flag (the
    * check would then be constant-true, not equivalent), and only UP-casts
    * never produce null from non-null input — cast('abc' as int) and
    * overflowing decimal casts null out, so a general Cast would turn an
    * exact rewrite into a row-semantics change. */
  private def nullEquivChildren(e: Expression): Option[Seq[Expression]] = e match {
    case k if isKernel(k) => Some(k.children)
    case t: ArrayTransform => Some(Seq(t.argument)) // lambda never decides null
    case s: Size if !s.legacySizeOfNull => Some(Seq(s.child))
    case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) => Some(Seq(c.child))
    case _: SortArray | _: ArrayDistinct | _: Lower |
        _: Upper | _: Length | _: StringTrim | _: RegExpReplace |
        _: Alias => Some(e.children)
    case _ => None
  }

  /** The non-foldable leaves anchoring e's null-ness; None = can't prove. */
  private def anchors(e: Expression): Option[Seq[Expression]] = e match {
    case a: Attribute => Some(Seq(a))
    case l: Literal => if (l.value != null) Some(Seq.empty) else None
    case _ =>
      nullEquivChildren(e).flatMap { cs =>
        cs.foldLeft(Option(Seq.empty[Expression])) { (acc, c) =>
          for (a <- acc; r <- anchors(c)) yield a ++ r
        }
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transformUp {
        case inn @ IsNotNull(e) if e.exists(isKernel) =>
          anchors(e) match {
            case Some(as) if as.nonEmpty =>
              as.distinct.map(IsNotNull(_): Expression).reduce(And)
            case _ => inn
          }
      }
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }
}
