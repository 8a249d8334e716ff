package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Custom optimizer rule (the third leg of the §2.13 Catalyst surface,
  * next to the scalar expressions and the BottomKByHash aggregate):
  * integerize hash-sampling compares.
  *
  * Every sampling operator in the engine filters on
  * `pseudoUniform(key, salt) < p`, whose plan shape is
  * `cast(mix AS double) / 1000003.0 < p` — a cast and an IEEE division
  * per row whose only purpose is to rescale an integer in
  * [0, 1000003) for comparison against a literal. The rule rewrites
  * the compare into pure long arithmetic on the mix itself:
  *
  *   mix / M < p   ⟺   mix < ⌈p·M⌉     (p·M not an integer)
  *   mix / M > p   ⟺   mix > ⌊p·M⌋     (p·M not an integer)
  *
  * Soundness: the only way the float form and the integer form can
  * disagree is when the true quotient mix/M lies within the division's
  * rounding error of p. With |p| ≤ 1 that requires |mix − p·M| to be
  * ≲ 10⁻¹⁰ (mix near p·M ≤ M keeps the quotient's ulp ~2⁻⁵³), and the
  * rule bails unless p·M sits at least 10⁻⁶ away from every integer —
  * four orders of magnitude of slack. Thresholds whose p·M is
  * (near-)integral keep the original float compare. The rewrite drops
  * a cast + divide from the per-row hot path of every sample/dropout/
  * split filter — small per row, but these filters run over the full
  * corpus at 100 TB, and the integer compare also stays inside
  * whole-stage codegen's cheapest path.
  */
object IntegerizeSampleFilter extends Rule[LogicalPlan] {
  private val M = 1000003.0

  private def rewritable(m: Double, e: Expression, p: Double): Boolean =
    m == M && e.dataType == LongType && math.abs(p) <= 1.0 &&
      math.abs(p * M - math.rint(p * M)) > 1e-6

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(
        Divide(Cast(e, DoubleType, _, _), Literal(m: Double, DoubleType), _),
        Literal(p: Double, DoubleType)) if rewritable(m, e, p) =>
      LessThan(e, Literal(math.ceil(p * M).toLong))
    case GreaterThan(
        Divide(Cast(e, DoubleType, _, _), Literal(m: Double, DoubleType), _),
        Literal(p: Double, DoubleType)) if rewritable(m, e, p) =>
      GreaterThan(e, Literal(math.floor(p * M).toLong))
  }
}
