package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Boot-time registration of every custom Catalyst piece the engine
  * ships — the `SparkSessionExtensions` path (brief's registration tier),
  * enabling `--conf spark.sql.extensions=graft.GraftExtensions` on any
  * cluster without code changes:
  *
  *  - `graft_dot` / `graft_sorted_overlap` SQL functions (codegen
  *    expressions, usable from pure SQL);
  *  - `BandJoinStrategy` (equi+time-band joins plan as a sorted sweep);
  *  - `RewriteAbsBand` optimizer rule (abs-band predicates become
  *    pushable range filters).
  *
  * The operators also self-register through the runtime
  * `experimental.*` / function-registry APIs when called directly, so
  * library use works without this class; the extension exists for SQL
  * users and spark-submit deployments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.BandJoinStrategy)
    e.injectOptimizerRule(_ => plans.RewriteAbsBand)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(functions.VectorFunctions.DotName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.DotProduct].getCanonicalName, functions.VectorFunctions.DotName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(functions.SetFunctions.OverlapName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[functions.SortedOverlapCount].getCanonicalName, functions.SetFunctions.OverlapName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.SortedOverlapCount(exprs(0), exprs(1))))
  }
}
