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

  private def fn(name: String, cls: Class[_],
                 builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("cosine_milli", classOf[CosineMilli],
      es => CosineMilli(es.head, es(1))))
    ext.injectFunction(fn("minhash_sig", classOf[MinHashSig],
      es => MinHashSig(es.head, es(1))))
    ext.injectFunction(fn("simhash_pack", classOf[SimHashPack],
      es => SimHashPack(es.head)))
    ext.injectFunction(fn("dot_double", classOf[DotDouble],
      es => DotDouble(es.head, es(1))))
    ext.injectFunction(fn("char_codes", classOf[CharCodes],
      es => CharCodes(es.head)))
    ext.injectFunction(fn("rolling_hash", classOf[RollingHash],
      es => RollingHash(es.head)))
    ext.injectFunction(fn("cdc_bounds", classOf[CdcBounds],
      es => CdcBounds(es.head, es(1))))
    ext.injectOptimizerRule(_ => DedupWindowToAggregate)
  }
}
