package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a KEYLESS trailing-window or BAND theta join
  * into the bucketed equi join [[graft.RelationalQueries.eventsIntervalJoin]]
  * builds by hand — the SparkSessionExtensions form of the same 100 TB
  * lever, so ANY inner join shaped `r >= l − K1 AND r <= l [+ K2]`
  * (trailing windows, symmetric bands `|a − b| ≤ K`, sequence-number
  * windows) escapes BroadcastNestedLoopJoin without the query author
  * knowing the trick. Bucket width = the window span K1 + K2; buckets are
  * exact FLOOR divisions (sign-safe), and the probe side explodes to the
  * (≤ 2, deduplicated) covering buckets.
  *
  * Match conditions (deliberately narrow — a rewrite rule must never fire
  * on a plan it cannot prove safe):
  *   - INNER join. A left-outer cannot ride the exploded probe side: both
  *     exploded rows of an unmatched probe would emit, and even a matched
  *     probe's OTHER bucket row would emit a spurious null row.
  *   - the condition contains `r ≥ l − K1` (or the strict form) and
  *     `r ≤ l` or `r ≤ l + K2` (or strict) on the SAME integral
  *     attributes, `l` from one side and `r` from the other, K1/K2
  *     positive integral literals (K2 absent = 0).
  *   - NO equi predicate between the sides already exists (if one does,
  *     Spark already plans a hash/sort-merge join and bucketing would only
  *     add work).
  *
  * Rewrite: with W = K1 + K2 and fd the exact floor division, the probe
  * side gains `explode(array_distinct(array(fd(l − K1), fd(l + K2))))` —
  * the interval `[l − K1, l + K2]` has width W, so it covers at most two
  * consecutive W-buckets, and array_distinct keeps a one-bucket interval
  * from emitting the same probe row twice. The match side gains `fd(r)`,
  * the join gains the manufactured equi key with the ORIGINAL condition
  * kept as residual, and a Project restores the original output. A pair
  * can only meet in the match row's own bucket, so the explode never
  * duplicates an inner match. The rule is idempotent: the rewritten join
  * HAS an equi predicate, so it can never match again (safe in a
  * fixed-point batch). */
object BucketedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def integralAttr(e: Expression): Option[Attribute] = e match {
    case a: AttributeReference if a.dataType == LongType || a.dataType == IntegerType =>
      Some(a)
    case _ => None
  }

  private def positiveLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) if v > 0 => Some(v)
    case Literal(v: Int, IntegerType) if v > 0 => Some(v.toLong)
    case _ => None
  }

  /** `r >= l - K` / `r > l - K` (either operand order) → (l, r, K). */
  private def lowerBound(e: Expression): Option[(Attribute, Attribute, Long)] = {
    def sub(x: Expression): Option[(Attribute, Long)] = x match {
      case Subtract(l, k, _) =>
        for (la <- integralAttr(l); kv <- positiveLit(k)) yield (la, kv)
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(r, x) =>
        for (ra <- integralAttr(r); (la, k) <- sub(x)) yield (la, ra, k)
      case GreaterThan(r, x) =>
        for (ra <- integralAttr(r); (la, k) <- sub(x)) yield (la, ra, k)
      case LessThanOrEqual(x, r) =>
        for (ra <- integralAttr(r); (la, k) <- sub(x)) yield (la, ra, k)
      case LessThan(x, r) =>
        for (ra <- integralAttr(r); (la, k) <- sub(x)) yield (la, ra, k)
      case _ => None
    }
  }

  /** `r <= l + K2` / `r < l + K2` (either operand order; the bare
    * `r <= l` form is K2 = 0) → (l, r, K2). Generalizes the trailing
    * window to the two-sided BAND join `l − K1 ≤ r ≤ l + K2`
    * (|a − b| ≤ K when K1 = K2). */
  private def upperBound(e: Expression): Option[(Attribute, Attribute, Long)] = {
    def shifted(x: Expression): Option[(Attribute, Long)] = x match {
      case Add(l, k, _) if positiveLit(k).nonEmpty =>
        for (la <- integralAttr(l); kv <- positiveLit(k)) yield (la, kv)
      case Add(k, l, _) if positiveLit(k).nonEmpty => // literal-first spelling
        for (la <- integralAttr(l); kv <- positiveLit(k)) yield (la, kv)
      case _ => integralAttr(x).map(la => (la, 0L))
    }
    e match {
      case LessThanOrEqual(r, x) =>
        for (ra <- integralAttr(r); (la, k2) <- shifted(x)) yield (la, ra, k2)
      case LessThan(r, x) =>
        for (ra <- integralAttr(r); (la, k2) <- shifted(x)) yield (la, ra, k2)
      case GreaterThanOrEqual(x, r) =>
        for (ra <- integralAttr(r); (la, k2) <- shifted(x)) yield (la, ra, k2)
      case GreaterThan(x, r) =>
        for (ra <- integralAttr(r); (la, k2) <- shifted(x)) yield (la, ra, k2)
      case _ => None
    }
  }

  private def sidesOf(a: Attribute, b: Attribute,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
      (left.outputSet.contains(b) && right.outputSet.contains(a))

  /** The single-conjunct band spelling `abs(l − r) <= K` / `abs(l − r) < K`
    * (either subtraction order; abs is symmetric) → (l, r, K, K). */
  private def absBand(e: Expression): Option[(Attribute, Attribute, Long, Long)] = {
    def diff(x: Expression): Option[(Attribute, Attribute)] = x match {
      case Abs(Subtract(a, b, _), _) =>
        for (aa <- integralAttr(a); bb <- integralAttr(b)) yield (aa, bb)
      case _ => None
    }
    e match {
      case LessThanOrEqual(x, k) =>
        for ((a, b) <- diff(x); kv <- positiveLit(k)) yield (a, b, kv, kv)
      case LessThan(x, k) =>
        for ((a, b) <- diff(x); kv <- positiveLit(k)) yield (a, b, kv, kv)
      case GreaterThanOrEqual(k, x) =>
        for ((a, b) <- diff(x); kv <- positiveLit(k)) yield (a, b, kv, kv)
      case GreaterThan(k, x) =>
        for ((a, b) <- diff(x); kv <- positiveLit(k)) yield (a, b, kv, kv)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // BATCH-ONLY: a stream-stream join derives its state watermark bounds
    // from the range predicate on the watermarked columns; replacing that
    // condition's role with a manufactured equi key + residual could
    // silently change state cleanup. The streaming form of this rewrite is
    // deliberate and explicit — [[graft.streaming.StreamingIntervalJoin]]
    // buckets + watermarks by hand with proven horizons.
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !left.isStreaming && !right.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      // Spark extracts EXPRESSION equi keys too (`a = b + 1` hash-joins on
      // (a, b+1)), so the guard must recognize any equality whose sides
      // reference opposite children — not just bare attribute pairs
      def oppositeSides(a: Expression, b: Expression): Boolean =
        a.references.nonEmpty && b.references.nonEmpty &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet)))
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => oppositeSides(a, b)
        case EqualNullSafe(a, b) => oppositeSides(a, b)
        case _ => false
      }
      val window = if (hasEqui) None else {
        val lowers = conjuncts.flatMap(lowerBound)
        val uppers = conjuncts.flatMap(upperBound)
        lowers.flatMap { case (l, r, k1) =>
          uppers.collect {
            case (lu, ru, k2) if lu.semanticEquals(l) && ru.semanticEquals(r) &&
                sidesOf(l, r, left, right) => (l, r, k1, k2)
          }
        }.headOption
          // the one-conjunct abs spelling of the symmetric band
          .orElse(conjuncts.flatMap(absBand).collectFirst {
            case (a, b, k1, k2) if sidesOf(a, b, left, right) => (a, b, k1, k2)
          })
      }
      window match {
        case Some((l, r, k1, k2)) =>
          // which side holds the probe (l)?
          val (probe, matchSide, lOnLeft) =
            if (left.outputSet.contains(l)) (left, right, true)
            else (right, left, false)
          // bucket width = the full window span K1 + K2, so the interval
          // [l − K1, l + K2] covers at most two consecutive buckets
          val wLit = Literal(k1 + k2, LongType)
          // exact FLOOR division for any sign (IntegralDivide truncates
          // toward zero, which under-covers when l − K1 goes negative):
          // fd(x) = (x − pmod(x, W)) div W
          def fd(x: Expression): Expression = {
            val cx = Cast(x, LongType)
            IntegralDivide(Subtract(cx, Pmod(cx, wLit)), wLit)
          }
          val bucketP = AttributeReference("graft_bucket_p", LongType)()
          // the two covering buckets coincide when the interval sits inside
          // one bucket — ArrayDistinct keeps the explode from emitting the
          // same bucket twice (which would duplicate inner matches)
          val gen = Generate(
            Explode(ArrayDistinct(CreateArray(Seq(
              fd(Subtract(Cast(l, LongType), Literal(k1, LongType))),
              fd(Add(Cast(l, LongType), Literal(k2, LongType))))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketP), child = probe)
          val bucketM = Alias(fd(r), "graft_bucket_m")()
          val proj = Project(matchSide.output :+ bucketM, matchSide)
          val newCond = And(EqualTo(bucketP, bucketM.toAttribute), cond)
          val newJoin =
            if (lOnLeft) Join(gen, proj, Inner, Some(newCond), hint)
            else Join(proj, gen, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
        case None => j
      }
  }
}
