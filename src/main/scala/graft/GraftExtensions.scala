package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._
import graft.plans.DedupWindowToAggregate

/** Build-time session extension wiring — the idiomatic deployment of
  * this library's Catalyst components:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects every native expression (cosine_milli, minhash_sig,
  * simhash_pack, dot_double, char_codes, rolling_hash, cdc_bounds) and
  * the DedupWindowToAggregate optimizer rule into each new session.
  * [[graft.functions.GraftFunctions.ensureRegistered]] remains the
  * runtime fallback for sessions built without extensions (tests, the
  * driver harness); both paths register the same builders. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // one registration table — GraftFunctions.natives — feeds both this
    // path and the runtime ensureRegistered fallback, so a kernel added
    // there can never resolve in tests but miss production
    GraftFunctions.natives.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    ext.injectOptimizerRule(_ => DedupWindowToAggregate)
    // whole-operator plans: BroadcastAsOfJoin -> BroadcastAsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
