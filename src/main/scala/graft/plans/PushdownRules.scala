package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule — the `Rule[LogicalPlan]` tier of the Catalyst
  * extension surface (Expression: functions.DotProduct; Strategy+Exec:
  * plans.BandJoin; Rule: here).
  *
  * `abs(x - c) <= d` cannot be pushed to a parquet scan (data-source
  * filters only understand comparisons on bare columns), so the band
  * predicate the engine favors for time-windowed scans reads every row
  * group. The rule rewrites it into the equivalent conjunction
  * `x >= c - d AND x <= c + d`, which the scan accepts as two pushed
  * filters — row-group pruning via min/max statistics kicks in. At
  * 100 TB this is the difference between scanning a day and scanning the
  * lake.
  *
  * Null semantics are identical: if x is null both forms are null; the
  * arithmetic is integer-only (LongType), and `safe()` guards that c ± d
  * does not overflow Long — otherwise the rule leaves the predicate alone.
  *
  * Documented edge-case divergence (x itself is unbounded, so it cannot be
  * guarded by inspecting literals): (1) under ANSI mode the original
  * `x - c` can throw ARITHMETIC_OVERFLOW where the rewrite evaluates to
  * false; (2) under non-ANSI wrapped arithmetic, when x - c wraps to
  * exactly Long.MinValue, abs() stays negative so the original predicate
  * is true while the rewrite is false. Both require |x - c| ≳ 2^63 —
  * impossible for the epoch-micros bands this rule targets (the engine
  * applies it to timestamps, |x| < 2^53) — and are accepted as the cost
  * of scan pruning; callers with adversarial Long domains should not
  * register the rule.
  */
object RewriteAbsBand extends Rule[LogicalPlan] {

  /** c ± d must not overflow Long (and d must be non-negative — a
    * negative band is always false and left for constant folding). */
  private def safe(c: Long, d: Long): Boolean =
    d >= 0 && c <= Long.MaxValue - d && c >= Long.MinValue + d

  private object AbsBand {
    def unapply(e: Expression): Option[(Expression, Long, Long)] = e match {
      case LessThanOrEqual(Abs(Subtract(x, Literal(c: Long, _), _), _), Literal(d: Long, _))
          if safe(c, d) =>
        Some((x, c, d))
      case LessThanOrEqual(Abs(Subtract(Literal(c: Long, _), x, _), _), Literal(d: Long, _))
          if safe(c, d) =>
        Some((x, c, d))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case AbsBand(x, c, d) =>
      And(
        GreaterThanOrEqual(x, Literal(c - d)),
        LessThanOrEqual(x, Literal(c + d)))
  }

  /** Idempotent registration on a live session (public experimental API —
    * no session rebuild; SparkSessionExtensions would be the boot-time
    * equivalent). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteAbsBand)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteAbsBand
    }
  }
}
