package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd cosine similarity in floor-rounded milli-units over
  * two float vectors — the custom-Expression form of
  * [[graft.ops.Similarity.cosineMilli]] (SURVEY.md §7.5: built-ins
  * first, custom Expression only where the bench demands). The HOF
  * form (`aggregate(zip_with(...))`) is interpreted per element and
  * allocates a product array per pair; this expression is one fused
  * primitive loop inside whole-stage codegen.
  *
  * IEEE-identical to the HOF form and the DuckDB oracle: elements cast
  * to double BEFORE multiply, sequential accumulation in index order,
  * `floor(1000*dot/(sqrt(na)*sqrt(nb)) + 0.5)`.
  *
  * Null vector → null; a null ELEMENT in either input null-poisons the
  * result too (embeddings are dense, but the function is SQL-exposed,
  * so a sparse/nullable array must not silently read as 0.0f). */
case class CosineMilli(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  // no ExpectsInputTypes (AbstractDataType is private[sql]) — inputs
  // are validated via checkInputDataTypes instead
  override def dataType: DataType = LongType
  override def prettyName: String = "cosine_milli"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = KernelCheck.arrayOf(org.apache.spark.sql.types.FloatType,
      left, "cosine_milli left")
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess) l
    else KernelCheck.arrayOf(org.apache.spark.sql.types.FloatType,
      right, "cosine_milli right")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = x.getFloat(i).toDouble
      val q = y.getFloat(i).toDouble
      dot += p * q; na += p * p; nb += q * q; i += 1
    }
    math.floor(1000.0 * (dot / (math.sqrt(na) * math.sqrt(nb))) + 0.5)
      .toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $poisoned = true; break; }
         |  double p = (double) $a.getFloat($i);
         |  double q = (double) $b.getFloat($i);
         |  $dot += p * q; $na += p * p; $nb += q * q;
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (long) java.lang.Math.floor(
         |    1000.0 * ($dot / (java.lang.Math.sqrt($na)
         |                      * java.lang.Math.sqrt($nb))) + 0.5);
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineMilli =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native expressions — the runtime
  * equivalent of wiring them through SparkSessionExtensions'
  * injectFunction. */
object GraftFunctions {
  /** Single source of truth for every native expression — consumed by
    * both [[ensureRegistered]] (runtime fallback) and
    * [[graft.GraftExtensions]] (spark.sql.extensions deployment), so a
    * kernel added here is registered on BOTH paths. */
  val natives: Seq[(String, Class[_], Seq[Expression] => Expression)] =
    Seq(
      ("cosine_milli", classOf[CosineMilli],
        es => CosineMilli(es.head, es(1))),
      ("minhash_sig", classOf[MinHashSig],
        es => MinHashSig(es.head, es(1))),
      ("simhash_pack", classOf[SimHashPack],
        es => SimHashPack(es.head)),
      ("dot_double", classOf[DotDouble],
        es => DotDouble(es.head, es(1))),
      ("jaccard_milli", classOf[JaccardMilli],
        es => JaccardMilli(es.head, es(1))),
      ("sorted_intersect_longs", classOf[SortedIntersectLongs],
        es => SortedIntersectLongs(es.head, es(1))),
      ("containment_milli", classOf[ContainmentMilli],
        es => ContainmentMilli(es.head, es(1))),
      ("nearest_centroid_milli", classOf[NearestCentroidMilli],
        es => NearestCentroidMilli(es.head, es(1), es(2), es(3))),
      ("char_codes", classOf[CharCodes],
        es => CharCodes(es.head)),
      ("selenium_text", classOf[SeleniumText],
        es => SeleniumText(es.head)),
      ("rolling_hash", classOf[RollingHash],
        es => RollingHash(es.head)),
      ("cdc_bounds", classOf[CdcBounds],
        es => CdcBounds(es.head, es(1))),
      ("unicode_nfc", classOf[UnicodeNfc],
        es => UnicodeNfc(es.head)),
      ("subword_stats", classOf[SubwordStats],
        es => SubwordStats(es.head, es(1))),
      // aggregates: the analyzer wraps a bare AggregateFunction returned
      // by a registry builder into an AggregateExpression
      ("min_by_obj", classOf[MinByObj],
        es => MinByObj(es.head, es(1))),
      ("max_by_obj", classOf[MinByObj],
        es => MinByObj(es.head, es(1), asc = false)),
      ("bloom_agg", classOf[BloomAgg],
        es => BloomAgg(es.head, es(1), es(2))),
      ("bloom_might_contain", classOf[BloomMightContain],
        es => BloomMightContain(es.head, es(1))))

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    natives.foreach { case (name, cls, builder) =>
      val ident = FunctionIdentifier(name)
      if (!reg.functionExists(ident)) {
        reg.registerFunction(ident,
          new ExpressionInfo(cls.getName, name), builder)
      }
    }
  }

  /** Column forms; require [[ensureRegistered]] on the active session. */
  def cosineMilli(a: Column, b: Column): Column =
    call_function("cosine_milli", a, b)
  def minHashSig(hashes: Column, k: Int): Column =
    call_function("minhash_sig", hashes,
      org.apache.spark.sql.functions.lit(k))
  def simhashPack(hashes: Column): Column =
    call_function("simhash_pack", hashes)
  def dotDouble(a: Column, b: Column): Column =
    call_function("dot_double", a, b)
  def jaccardMilli(a: Column, b: Column): Column =
    call_function("jaccard_milli", a, b)
  def sortedIntersectLongs(a: Column, b: Column): Column =
    call_function("sorted_intersect_longs", a, b)
  def containmentMilli(a: Column, b: Column): Column =
    call_function("containment_milli", a, b)
  def nearestCentroidMilli(qv: Column, centsFlat: Array[Long],
                           cids: Array[Long], dim: Int): Column =
    call_function("nearest_centroid_milli", qv,
      org.apache.spark.sql.functions.lit(centsFlat),
      org.apache.spark.sql.functions.lit(cids),
      org.apache.spark.sql.functions.lit(dim))
  def charCodes(c: Column): Column =
    call_function("char_codes", c)
  def seleniumText(c: Column): Column =
    call_function("selenium_text", c)
  def rollingHash(codes: Column): Column =
    call_function("rolling_hash", codes)
  def cdcBounds(codes: Column, mask: Int = 64): Column =
    call_function("cdc_bounds", codes,
      org.apache.spark.sql.functions.lit(mask))
  def unicodeNfc(c: Column): Column =
    call_function("unicode_nfc", c)
  def subwordStats(text: Column, vocab: Seq[String]): Column =
    call_function("subword_stats", text,
      org.apache.spark.sql.functions.array(
        vocab.map(org.apache.spark.sql.functions.lit): _*))
}
