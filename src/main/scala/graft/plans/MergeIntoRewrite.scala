package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Max, Min}
import org.apache.spark.sql.catalyst.plans.FullOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BooleanType

/** `MERGE INTO` over plain relations (temp views, parquet frames) — the
  * SQL DML spelling of [[graft.merge.ScdMerge]]'s dataflow.
  *
  * Spark only executes MERGE against DSv2 tables implementing
  * SupportsRowLevelOperations; everything else fails analysis. But the
  * reference's merge (feeder_postgres.py:111-194) is a pure function
  * state × snapshot → state, and that is expressible as the SAME plan
  * ScdMerge builds by hand:
  *
  *   one FULL OUTER join on the merge condition
  *   + one projection (per-column CASE over the matched / not-matched /
  *     not-matched-by-source action cascades, first-match-wins)
  *   + one filter (drops DELETE rows and never-inserted source rows)
  *
  * This resolution rule rewrites an analyzed [[MergeIntoTable]] into that
  * plan, so `spark.sql("MERGE INTO state USING snap ON … WHEN …")`
  * RETURNS the merged state as a query result (the caller re-registers
  * the view / writes it out — same contract as ScdMerge.applySnapshot).
  * Cost at any scale: one shuffle (or zero with both sides bucketed on
  * the key), identical to the hand-built merge.
  *
  * Scope: UPDATE/DELETE/INSERT actions with explicit assignments (star
  * actions arrive already expanded by the analyzer); schema evolution is
  * out of scope and left for Spark to reject.
  *
  * Cardinality: standard SQL MERGE errors when one target row is matched
  * by more than one source row (Spark's DSv2 path raises
  * MERGE_CARDINALITY_VIOLATION). A naive full-outer rewrite would instead
  * silently emit one updated row per match — state corruption for the SCD
  * use case. When the merge condition is a pure equi-conjunction the
  * rewrite therefore tags each source row with a monotonic id and adds a
  * window over the joined output, partitioned by the source-side key
  * expressions, computing min/max source id: a MATCHED row whose key group
  * saw two distinct source ids means some target row matched ≥2 source
  * rows, and the keep-column raises an error at runtime. Duplicate
  * UNMATCHED source keys stay legal (SQL inserts both), as do duplicate
  * target keys matched by a single source row (each updated once). The
  * window costs one extra exchange of the joined output; disable via
  * `spark.graft.merge.cardinalityCheck=false` when source keys are known
  * unique. Non-equi conditions skip the guard (documented divergence).
  */
object MergeIntoRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case m: MergeIntoTable
        if m.childrenResolved && m.mergeCondition.resolved &&
          (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
            .forall(actionSupported) && !m.withSchemaEvolution =>
      rewrite(m)
  }

  private def actionSupported(a: MergeAction): Boolean = a match {
    case UpdateAction(c, as, _) => c.forall(_.resolved) && as.forall(_.resolved)
    case InsertAction(c, as) => c.forall(_.resolved) && as.forall(_.resolved)
    case DeleteAction(c)     => c.forall(_.resolved)
    case _                   => false // star actions not yet expanded
  }

  private val True = Literal(true)

  private def castTo(v: Expression, attr: Attribute): Expression =
    if (v.dataType == attr.dataType) v else Cast(v, attr.dataType)

  /** Value of target column `c` from an assignment list; `default` when
    * unassigned (old value for UPDATE, NULL for INSERT). Only top-level
    * column assignments are supported (the SCD surface). */
  private def assigned(as: Seq[Assignment], c: Attribute, default: Expression): Expression =
    as.collectFirst {
      case Assignment(k: Attribute, v) if k.semanticEquals(c) => castTo(v, c)
    }.getOrElse(default)

  /** First-match-wins cascade producing column `c`'s value. DELETE rows
    * keep `default` — the keep-predicate filters them out. */
  private def valueCascade(
      actions: Seq[MergeAction], c: Attribute, default: Expression): Expression =
    actions.foldRight(default) { (a, els) =>
      a match {
        case UpdateAction(cond, as, _) =>
          If(cond.getOrElse(True), assigned(as, c, default), els)
        case InsertAction(cond, as) =>
          If(cond.getOrElse(True), assigned(as, c, Literal(null, c.dataType)), els)
        case DeleteAction(cond) => If(cond.getOrElse(True), default, els)
        case _                  => els
      }
    }

  /** First-match-wins cascade deciding whether the output row survives.
    * `defaultKeep`: true for target-side rows (unmatched action list
    * leaves the row as-is), false for source-only rows (no INSERT fired
    * ⇒ no row). */
  private def keepCascade(actions: Seq[MergeAction], defaultKeep: Boolean): Expression =
    actions.foldRight(Literal(defaultKeep): Expression) { (a, els) =>
      a match {
        case UpdateAction(cond, _, _) => If(cond.getOrElse(True), True, els)
        case InsertAction(cond, _) => If(cond.getOrElse(True), True, els)
        case DeleteAction(cond)    => If(cond.getOrElse(True), Literal(false), els)
        case _                     => els
      }
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o         => Seq(o)
  }

  /** Source-side key expressions when the merge condition is a pure
    * conjunction of cross-side equalities; None disables the guard. */
  private def equiSourceKeys(m: MergeIntoTable): Option[Seq[Expression]] = {
    val tSet = AttributeSet(m.targetTable.output)
    val sSet = AttributeSet(m.sourceTable.output)
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r)
          if l.references.nonEmpty && l.references.subsetOf(sSet) &&
            r.references.nonEmpty && r.references.subsetOf(tSet) => Some(l)
      case EqualTo(l, r)
          if r.references.nonEmpty && r.references.subsetOf(sSet) &&
            l.references.nonEmpty && l.references.subsetOf(tSet) => Some(r)
      case _ => None
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  private def rewrite(m: MergeIntoTable): LogicalPlan = {
    // presence tags survive the outer join where key columns may be
    // legitimately NULL — IsNotNull(tag) is the only reliable side marker
    val tTag = Alias(True, "__graft_t")()
    val sTag = Alias(True, "__graft_s")()
    val sid = Alias(MonotonicallyIncreasingID(), "__graft_sid")()
    val target = Project(m.targetTable.output :+ tTag, m.targetTable)
    val source = Project(m.sourceTable.output :+ sTag :+ sid, m.sourceTable)

    val joined =
      Join(target, source, FullOuter, Some(m.mergeCondition), JoinHint.NONE)

    val inT = IsNotNull(tTag.toAttribute)
    val inS = IsNotNull(sTag.toAttribute)
    val matched = And(inT, inS)
    val sOnly = And(Not(inT), inS)

    // cardinality guard (scaladoc): min/max source id per source-key group;
    // a matched row in a group with two distinct source ids is a violation
    val checkEnabled =
      conf.getConfString("spark.graft.merge.cardinalityCheck", "true").toBoolean
    val (guarded, violation) = equiSourceKeys(m) match {
      case Some(srcKeys) if checkEnabled =>
        val spec = WindowSpecDefinition(srcKeys, Nil, UnspecifiedFrame)
        def winAgg(f: AggregateFunction, n: String): NamedExpression =
          Alias(WindowExpression(
            AggregateExpression(f, Complete, isDistinct = false), spec), n)()
        val minSid = winAgg(Min(sid.toAttribute), "__graft_sid_min")
        val maxSid = winAgg(Max(sid.toAttribute), "__graft_sid_max")
        (Window(Seq(minSid, maxSid), srcKeys, Nil, joined),
          And(matched, Not(EqualTo(minSid.toAttribute, maxSid.toAttribute))))
      case _ => (joined, Literal(false): Expression)
    }

    val outCols = m.targetTable.output.map { c =>
      Alias(
        CaseWhen(
          Seq(
            matched -> valueCascade(m.matchedActions, c, c),
            sOnly -> valueCascade(m.notMatchedActions, c, Literal(null, c.dataType))),
          // target-only rows: not-matched-by-source cascade, else carry
          valueCascade(m.notMatchedBySourceActions, c, c)),
        c.name)()
    }
    // the violation check lives inside the keep column (always evaluated,
    // never pruned) and fires even for rows an action would filter out —
    // SQL MERGE errors on the second match regardless of the action's fate
    val keepBase = CaseWhen(
      Seq(
        matched -> keepCascade(m.matchedActions, defaultKeep = true),
        sOnly -> keepCascade(m.notMatchedActions, defaultKeep = false)),
      keepCascade(m.notMatchedBySourceActions, defaultKeep = true))
    val raiseViolation = Cast(
      UnresolvedFunction(
        "raise_error",
        Seq(Literal("GRAFT_MERGE_CARDINALITY_VIOLATION: a target row was " +
          "matched by more than one source row; deduplicate the source on " +
          "the merge keys or set spark.graft.merge.cardinalityCheck=false")),
        isDistinct = false),
      BooleanType)
    val keep = Alias(If(violation, raiseViolation, keepBase), "__graft_keep")()

    val projected = Project(outCols :+ keep, guarded)
    val filtered = Filter(EqualTo(keep.toAttribute, True), projected)
    Project(outCols.map(_.toAttribute), filtered)
  }
}
