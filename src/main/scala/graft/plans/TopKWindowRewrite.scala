package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{RankTopKAgg, TopKAgg}

/** Optimizer rule: rewrite the grouped-top-k window idioms
  *
  *   filter(row_number() over (partition by g order by ord [, tie] desc) <= k)
  *   filter(rank()       over (...same...) <= k)
  *   filter(dense_rank() over (...same...) <= k)
  *
  * into the bounded-heap [[graft.functions.TopKAgg]] aggregate + posexplode
  * (row_number), or the ties-aware threshold aggregate
  * [[graft.functions.RankTopKAgg]] + explode (rank/dense_rank — NOT
  * heap-equivalent: ties at the k-th boundary legitimately emit more
  * than k rows per group, and the rank value skips on ties, so the
  * aggregate computes ranks itself and the rewrite restores the rank
  * attribute from the emitted struct, never from explode position).
  * The window formulation sorts every input partition and (even with
  * Spark's own WindowGroupLimit pruning) re-sorts groups after the
  * exchange; the aggregate form keeps k-element heaps, combines them
  * map-side, and never sorts more than the k survivors of each group.
  *
  * The rewrite fires only where it is provably row-for-row equivalent:
  *  - the single window expression is `row_number()` with the default
  *    running row frame, and the filter is a plain bound on it
  *    (`<= k`, `< k+1`, `= 1`);
  *  - 1–2 sort keys; the primary either
  *      (a) `DESC NULLS LAST` (the `desc` default) over a type that
  *          embeds losslessly in double (byte/short/int/float/double —
  *          null primaries rank lowest, matching NULLS LAST),
  *      (b) `DESC NULLS LAST` over a NON-NULLABLE long (the heap keys
  *          longs directly, exact above 2^53 where the double embedding
  *          collides; non-nullability is required because the heap's
  *          null key is Long.MinValue, which a real long value could
  *          collide with — `coalesce(x, lit)` is the standard proof), or
  *      (c) `ASC` over a NON-NULLABLE integral type — the "FIRST k rows
  *          per group" idiom (contribution capping, session heads,
  *          earliest-event dedup): the primary feeds the heap as
  *          `~cast(x as long)` (the same lossless bitwise-NOT reversal
  *          the ascending TIE uses), so the k SMALLEST rank first; with
  *          a non-nullable key the ASC-default NULLS FIRST ordering can
  *          never matter. Float/double ASC primaries are excluded — no
  *          expression-level reversal preserves NaN's position;
  *  - the tiebreaker a NON-NULLABLE integral type, descending OR
  *    ascending — `(score DESC, id ASC)` is the dominant idiom in
  *    practice, and an ascending tie is realized by feeding the heap
  *    the tie's bitwise NOT: `~x` reverses the total order on longs
  *    with NO overflow edge (negation would wrap at Long.MinValue);
  *  - grouping keys are plain attributes, and k is small enough that a
  *    per-group heap is obviously right (k ≤ 1024).
  *
  * Output attribute ids are preserved (group keys pass through; the other
  * columns are re-aliased out of the payload struct under their original
  * exprIds), so downstream operators are untouched. Registered via
  * [[graft.functions.GraftExtensions]]; `row_number` idioms that don't
  * match (float/double or nullable ascending primaries, NULLABLE long
  * primaries, extra window functions) keep their window plans.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxK = 1024

  private val ordTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, FloatType, DoubleType)
  private val tieTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def boundK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k == 1 => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  private def primaryOk(so: SortOrder): Boolean = so.direction match {
    case Descending =>
      so.nullOrdering == NullsLast &&
        (ordTypes.contains(so.child.dataType) ||
          // long primaries rank losslessly on the long-keyed heap, but
          // only when provably non-null (the heap's null sentinel is a
          // real long)
          (so.child.dataType == LongType && !so.child.nullable))
    case Ascending =>
      // "first k" idiom: lossless bitwise-NOT reversal exists only for
      // integrals, and only a non-nullable key makes the ASC-default
      // NULLS FIRST ordering irrelevant
      tieTypes.contains(so.child.dataType) && !so.child.nullable
  }

  private def eligible(part: Seq[Expression], order: Seq[SortOrder]): Boolean =
    order.nonEmpty && order.size <= 2 &&
      primaryOk(order.head) &&
      // tie: either direction (ASC realizes via bitwise NOT below); it is
      // non-nullable, so its null ordering can never matter
      order.drop(1).forall(so => tieTypes.contains(so.child.dataType) &&
        !so.child.nullable) &&
      part.forall(_.isInstanceOf[Attribute])

  /** The bound inside a CONJUNCTION: production filters are routinely
    * `rn <= k AND other-predicates` (the optimizer can't push a
    * non-partition-key predicate below a Window, so the conjunction
    * stays in one Filter). Returns the SMALLEST k among bound conjuncts
    * plus every other conjunct as a residual — safe to re-apply ON TOP
    * of the rewritten plan because the rank attribute is restored under
    * its original exprId (even residuals referencing it, e.g.
    * `rn % 2 = 0`, filter the same values the plan's own output
    * carries; redundant looser bounds just pass everything through). */
  private def boundKConj(cond: Expression, rn: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val ks = conjuncts.flatMap(c => boundK(c, rn))
    if (ks.isEmpty) None
    else {
      val k = ks.min
      // drop exactly ONE conjunct realizing the minimal bound; the rest
      // (including other bounds) stay as a cheap residual row filter
      val i = conjuncts.indexWhere(c => boundK(c, rn).contains(k))
      Some((k, conjuncts.take(i) ++ conjuncts.drop(i + 1)))
    }
  }

  private def withResidual(plan: LogicalPlan, residual: Seq[Expression]): LogicalPlan =
    if (residual.isEmpty) plan else Filter(residual.reduce(And), plan)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
        _, _, child, _)) =>
      val rnAttr = alias.toAttribute
      boundKConj(cond, rnAttr) match {
        case Some((k, rest)) if k > 0 && k <= MaxK && eligible(part, order) =>
          withResidual(rewrite(child, part, order, k, rnAttr), rest)
        case _ => f
      }
    // rank()/dense_rank() <= k — the ties-aware siblings. NOT
    // heap-equivalent to row_number: ties at the k-th boundary emit MORE
    // than k rows per group, so the aggregate is the threshold-tracking
    // RankTopKAgg (buffer O(k + group output)). The frame is
    // unconstrained here because rank-family values depend only on the
    // ORDER key, never the frame (RankLike pins its own frame anyway).
    // Extra eligibility beyond row_number: the key embedding must
    // preserve EQUALITY (ties), not just order — every embedding the
    // rule uses is injective, and null/NaN/−0.0 peer-grouping matches
    // Spark's window semantics (all map to one key each).
    case f @ Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(rk @ (_: Rank | _: DenseRank),
          WindowSpecDefinition(part, order, _)), _)),
        _, _, child, _)) =>
      val rkAttr = alias.toAttribute
      boundKConj(cond, rkAttr) match {
        case Some((k, rest)) if k > 0 && k <= MaxK && eligible(part, order) =>
          withResidual(rewriteRank(child, part, order, k, rkAttr,
            dense = rk.isInstanceOf[DenseRank]), rest)
        case _ => f
      }
  }

  /** Shared (ord, tie) long-embedding for the heap/threshold aggregates.
    * Injective on every admitted type+direction, so it preserves both
    * ORDER (row_number) and EQUALITY (rank ties). */
  private def embedKeys(order: Seq[SortOrder]): (Expression, Expression) = {
    // a long primary feeds the heap RAW (TopKAgg keys longs directly —
    // exact above 2^53); an ASCENDING integral primary feeds its bitwise
    // NOT (x < y ⟺ ~x > ~y on all longs — the "first k" reversal);
    // everything else casts to double
    val ord: Expression = order.head.direction match {
      case Ascending => BitwiseNot(Cast(order.head.child, LongType))
      case _ if order.head.child.dataType == LongType => order.head.child
      case _ => Cast(order.head.child, DoubleType)
    }
    val tie = order.drop(1).headOption
      .map { so =>
        val asLong: Expression = Cast(so.child, LongType)
        // heap order is (ord, tie) lexicographic DESC; an ascending tie
        // feeds the heap its bitwise NOT — x < y ⟺ ~x > ~y on all longs,
        // with none of negation's Long.MinValue wrap
        if (so.direction == Ascending) BitwiseNot(asLong) else asLong
      }
      .getOrElse(Literal(0L))
    (ord, tie)
  }

  private def rewrite(rawChild: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], k: Int, rnAttr: Attribute): LogicalPlan = {
    // InferWindowGroupLimit may already have inserted its rank-pruning
    // node (+ sort) below the window; the heap aggregate subsumes it, so
    // drop it when its limit keeps at least our k rows
    val child = rawChild match {
      case WindowGroupLimit(_, _, _: RowNumber, limit, c) if limit >= k => c
      case other => other
    }
    val cAttrs = child.output
    val (ord, tie) = embedKeys(order)
    val payload = CreateStruct(cAttrs)
    val aggAlias = Alias(
      TopKAgg(ord, tie, payload, k, nullAsLowest = true)
        .toAggregateExpression(), "__topk")()
    val grouping = part.map(_.asInstanceOf[Attribute])
    val aggregate = Aggregate(grouping, grouping :+ aggAlias, child)
    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val itemAttr = AttributeReference("__item", payload.dataType,
      nullable = false)()
    val gen = Generate(PosExplode(aggAlias.toAttribute),
      unrequiredChildIndex = Seq(grouping.size), outer = false,
      qualifier = None, generatorOutput = Seq(posAttr, itemAttr), aggregate)
    val restored: Seq[NamedExpression] = cAttrs.zipWithIndex.map {
      case (a, i) =>
        if (grouping.exists(_.semanticEquals(a))) a
        else Alias(GetStructField(itemAttr, i, Some(a.name)), a.name)(
          exprId = a.exprId)
    }
    val rn = Alias(Add(posAttr, Literal(1)), rnAttr.name)(exprId = rnAttr.exprId)
    Project(restored :+ rn, gen)
  }

  /** rank()/dense_rank() <= k → [[RankTopKAgg]] + explode. The aggregate
    * emits `array<struct<p: row-struct, r: rank>>`, so the rank VALUE
    * (which skips on ties for `rank`) is computed inside the aggregate,
    * not reconstructed from the explode position — a position+1 would be
    * wrong for every row after the first tie. */
  private def rewriteRank(rawChild: LogicalPlan, part: Seq[Expression],
      order: Seq[SortOrder], k: Int, rkAttr: Attribute,
      dense: Boolean): LogicalPlan = {
    // Spark's own rank-mode WindowGroupLimit keeps boundary ties, so it
    // prunes nothing the threshold aggregate wouldn't; drop it when its
    // limit keeps at least our k ranks
    val child = rawChild match {
      case WindowGroupLimit(_, _, _: Rank, limit, c)
        if !dense && limit >= k => c
      case WindowGroupLimit(_, _, _: DenseRank, limit, c)
        if dense && limit >= k => c
      case other => other
    }
    val cAttrs = child.output
    val (ord, tie) = embedKeys(order)
    val payload = CreateStruct(cAttrs)
    val aggAlias = Alias(
      RankTopKAgg(ord, tie, payload, k, dense, nullAsLowest = true)
        .toAggregateExpression(), "__ranktopk")()
    val grouping = part.map(_.asInstanceOf[Attribute])
    val aggregate = Aggregate(grouping, grouping :+ aggAlias, child)
    val itemType = StructType(Seq(
      StructField("p", payload.dataType, nullable = false),
      StructField("r", IntegerType, nullable = false)))
    val itemAttr = AttributeReference("__item", itemType, nullable = false)()
    val gen = Generate(Explode(aggAlias.toAttribute),
      unrequiredChildIndex = Seq(grouping.size), outer = false,
      qualifier = None, generatorOutput = Seq(itemAttr), aggregate)
    val payloadField = GetStructField(itemAttr, 0, Some("p"))
    val restored: Seq[NamedExpression] = cAttrs.zipWithIndex.map {
      case (a, i) =>
        if (grouping.exists(_.semanticEquals(a))) a
        else Alias(GetStructField(payloadField, i, Some(a.name)), a.name)(
          exprId = a.exprId)
    }
    val rk = Alias(GetStructField(itemAttr, 1, Some("r")), rkAttr.name)(
      exprId = rkAttr.exprId)
    Project(restored :+ rk, gen)
  }
}
