package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

import graft.functions.FusedMeasuresExpr

/** Pass-through expression whose ONLY purpose is its `deterministic =
  * false` flag: an optimizer fence. [[MaterializeFusedMeasures]] wraps the
  * one materialized copy of a shared [[FusedMeasuresExpr]] in it so that
  * no later rule moves or re-inlines the copy it just deduplicated —
  * CollapseProject will not inline a nondeterministic producer, and
  * PushPredicateThroughNonJoin will not substitute aliases through a
  * projection containing one. The wrapped expression IS functionally
  * deterministic (a pure function of the text); the flag pins evaluation
  * COUNT and PLACEMENT, not value semantics, so lineage/resume
  * invariants are unaffected. Unlike the pre-round-4 design (the flag on
  * FusedMeasuresExpr itself), the fence exists only where sharing was
  * actually detected — every other plan keeps full optimizer freedom,
  * including filter pushdown to the scan.
  */
case class EvalFence(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "eval_fence"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Optimizer rule: evaluate a shared [[FusedMeasuresExpr]] ONCE.
  *
  * With the expression deterministic (round 4 removed the old blanket
  * `deterministic = false`), two optimizer behaviors can duplicate it:
  *
  *  - CollapseProject is SAFE by itself: since SPARK-36718 it refuses to
  *    inline a non-cheap producer referenced more than once, so the
  *    DataFrame pipeline (one `__m` alias, five field extractions) keeps
  *    a single evaluation with no help;
  *  - PushPredicateThroughNonJoin is NOT: a later filter on a derived
  *    column (`.filter(col("keep"))` — the standard production call)
  *    substitutes the alias's full definition into the condition and
  *    pushes it below the projection, leaving one fused call per verdict
  *    reference (measured 19x on the default rule set);
  *  - pure-SQL users can also just write `fused_measures(text, true).a,
  *    fused_measures(text, true).b` — N syntactic copies in one SELECT.
  *
  * The repair: any Project / Filter / Project-over-Filter whose
  * expressions contain two or more semantically-equal FusedMeasuresExpr
  * calls gets them materialized as ONE [[EvalFence]]-wrapped alias in a
  * Project directly above the node's child, with every occurrence
  * rewritten to the attribute. The fence keeps every later batch (the
  * re-run of PushDownPredicates in "Pushdown Filters from
  * PartitionPruning", the final CollapseProject in "RewriteSubquery")
  * from undoing the rewrite, which also makes the rule safe inside a
  * fixed-point batch: rewritten shapes contain no duplicated fused call,
  * so the rule is idempotent and nothing ping-pongs.
  *
  * Registered twice: GraftExtensions injects it for
  * `--conf spark.sql.extensions` sessions (SQL surface), and
  * QualityFilter.run registers it on the session's
  * `experimental.extraOptimizations` so plain-session users of the Scala
  * API are covered without any configuration.
  */
object MaterializeFusedMeasures extends Rule[LogicalPlan] {

  /** Idempotently register this rule on a plain session's
    * `experimental.extraOptimizations` — the public per-session seam for
    * sessions built without `spark.sql.extensions=graft.GraftExtensions`.
    */
  def register(session: org.apache.spark.sql.SparkSession): Unit =
    if (!session.experimental.extraOptimizations.contains(this))
      session.experimental.extraOptimizations ++= Seq(this)

  private def fusedCalls(exprs: Seq[Expression]): Seq[FusedMeasuresExpr] =
    exprs.flatMap(_.collect { case f: FusedMeasuresExpr => f })

  /** canonicalized -> one representative, for calls appearing >= 2 times
    * whose inputs are available from `child` (within one Project/Filter
    * they always are, but guard anyway).
    */
  private def shared(exprs: Seq[Expression],
                     child: LogicalPlan): Map[Expression, FusedMeasuresExpr] =
    fusedCalls(exprs)
      .groupBy(_.canonicalized)
      .collect { case (canon, occ)
        if occ.sizeIs >= 2 && occ.head.references.subsetOf(child.outputSet) =>
        canon -> occ.head
      }

  private def rewrite(e: Expression,
                      attrs: Map[Expression, Attribute]): Expression =
    e.transform {
      case f: FusedMeasuresExpr if attrs.contains(f.canonicalized) =>
        attrs(f.canonicalized)
    }

  private def materialize(child: LogicalPlan,
                          reps: Map[Expression, FusedMeasuresExpr])
      : (LogicalPlan, Map[Expression, Attribute]) = {
    val aliases = reps.map { case (canon, f) =>
      canon -> Alias(EvalFence(f), "__fused_shared")()
    }
    val mat = Project(child.output ++ aliases.values, child)
    (mat, aliases.map { case (c, a) => c -> a.toAttribute })
  }

  /** Walk down a Project/Filter chain from `plan` looking for an
    * [[EvalFence]] alias whose fenced expression equals `expr` AFTER
    * inlining the chain's aliases into it (the pushed-down copy computes
    * fused over the SUBSTITUTED text expression, the upper copy over the
    * text attribute — same value, different tree). On a match, returns
    * the chain rebuilt to pass the fence attribute up, plus the
    * attribute. Depth-capped: these chains are a handful of projections.
    */
  private def shareThroughChain(plan: LogicalPlan, expr: Expression,
                                depth: Int = 8)
      : Option[(LogicalPlan, Attribute)] = plan match {
    case _ if depth <= 0 => None
    case p @ Project(list, child) =>
      list.collectFirst {
        case a @ Alias(EvalFence(e), _)
            if e.canonicalized == expr.canonicalized => a.toAttribute
      } match {
        case Some(attr) => Some((p, attr))
        case None =>
          val aliasMap = list.collect {
            case a: Alias => a.exprId -> a.child
          }.toMap
          val inlined = expr.transformUp {
            case at: Attribute if aliasMap.contains(at.exprId) =>
              aliasMap(at.exprId)
          }
          shareThroughChain(child, inlined, depth - 1).map {
            case (newChild, attr) =>
              val withAttr =
                if (list.exists(_.exprId == attr.exprId)) list
                else list :+ attr
              (Project(withAttr, newChild), attr)
          }
      }
    case f @ Filter(cond, child) =>
      shareThroughChain(child, expr, depth - 1).map { case (nc, attr) =>
        (Filter(cond, nc), attr)
      }
    case _ => None
  }

  /** Rewrite any fused call in `list` that an [[EvalFence]] below `child`
    * already computes (through the alias chain) to that fence's
    * attribute — the cross-Filter sharing step: the pushed-down condition
    * copy and the post-filter output copy become ONE evaluation.
    */
  private def reuseFences(list: Seq[NamedExpression], child: LogicalPlan)
      : Option[(Seq[NamedExpression], LogicalPlan)] = {
    var cur = child
    var changed = false
    val newList = list.map { ne =>
      ne.transform {
        case f: FusedMeasuresExpr =>
          shareThroughChain(cur, f) match {
            case Some((rebuilt, attr)) =>
              cur = rebuilt; changed = true; attr
            case None => f
          }
      }.asInstanceOf[NamedExpression]
    }
    if (changed) Some((newList, cur)) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // a filter whose condition shares fused calls with the projection
    // above it (the post-pushdown `.filter(col("keep"))` shape): one
    // materialization feeds both. Only groups the CONDITION's own calls
    // belong to are materialized below the filter — a group formed purely
    // of duplicates within the projection list (a distinct call in the
    // condition) must NOT be placed there, or it evaluates on pre-filter
    // rows; the plain Project case handles list-only sharing above the
    // filter on the fixed point's next pass.
    case p @ Project(list, f @ Filter(cond, child))
        if shared(list :+ cond, child).keySet
          .intersect(fusedCalls(Seq(cond)).map(_.canonicalized).toSet)
          .nonEmpty =>
      val condCanon = fusedCalls(Seq(cond)).map(_.canonicalized).toSet
      val reps = shared(list :+ cond, child)
        .filter { case (canon, _) => condCanon.contains(canon) }
      val (mat, attrs) = materialize(child, reps)
      val newList = list.map(rewrite(_, attrs).asInstanceOf[NamedExpression])
      Project(newList, Filter(rewrite(cond, attrs), mat))

    case p @ Project(list, child) if shared(list, child).nonEmpty =>
      val reps = shared(list, child)
      val (mat, attrs) = materialize(child, reps)
      Project(list.map(rewrite(_, attrs).asInstanceOf[NamedExpression]), mat)

    // a single fused call above a chain that already materialized the
    // same computation behind a fence (the post-filter output copy over
    // the pushed-down condition copy): reuse the fence attribute. Runs on
    // the fixed point's next pass, after the cases above created the
    // fence.
    case p @ Project(list, child) if fusedCalls(list).nonEmpty &&
        reuseFences(list, child).isDefined =>
      val (newList, newChild) = reuseFences(list, child).get
      Project(newList, newChild)

    case f @ Filter(cond, child) if shared(Seq(cond), child).nonEmpty =>
      val reps = shared(Seq(cond), child)
      val (mat, attrs) = materialize(child, reps)
      // restore the original schema above the filter: parents must not
      // see the materialization column
      Project(child.output, Filter(rewrite(cond, attrs), mat))
  }
}
