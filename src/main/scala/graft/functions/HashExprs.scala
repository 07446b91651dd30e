package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Analysis-time input checks shared by the native kernels: the
  * expressions are SQL-callable in extensions-deployed sessions, so
  * misuse must fail at analysis with a readable message, not mid-job
  * with a ClassCastException (or worse, read garbage off ArrayData).
  *
  * Null ELEMENTS can't be rejected at analysis (`transform(...)` always
  * types as containsNull=true even when the lambda never yields null),
  * so every array kernel null-poisons at runtime instead: any null
  * element makes the whole result null — the same semantics as the HOF
  * twins, whose `transform`/`aggregate` lambdas propagate null. */
private[functions] object KernelCheck {
  def arrayOf(elem: DataType, e: Expression,
              what: String): TypeCheckResult = e.dataType match {
    case ArrayType(t, _) if t == elem => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what must be array<${elem.simpleString}>, got ${other.simpleString}")
  }

  def isString(e: Expression, what: String): TypeCheckResult =
    e.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$what must be string, got ${other.simpleString}")
    }

  /** Foldable, integer-typed, NON-NULL, and > 0 — evaluated here so a
    * zero/negative/null parameter fails ANALYSIS, not per-row mid-job
    * (cdc_bounds(codes, 0) would otherwise divide by zero per row, and
    * a NULL k would yield an empty minhash signature silently). */
  def foldablePosInt(e: Expression, what: String): TypeCheckResult =
    if (!e.foldable ||
        !(e.dataType == IntegerType || e.dataType == LongType ||
          e.dataType == ShortType))
      TypeCheckResult.TypeCheckFailure(
        s"$what must be a foldable integer literal")
    else e.eval(null) match {
      case null => TypeCheckResult.TypeCheckFailure(
        s"$what must not be null")
      case v: java.lang.Number if v.longValue > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"$what must be > 0, got $v")
    }
}

/** Native codegen'd hash kernels for the similarity pipeline — the
  * §7.5 escalation applied to the round-2 bench tail. The HOF forms
  * ([[graft.ops.Similarity.minHashFromHashes]] / `simhash64` /
  * `dotDouble`) are evaluated interpreted, re-traverse the input array
  * once per seed/bit, and allocate an intermediate array per step;
  * these expressions do the same arithmetic in one fused primitive
  * loop inside whole-stage codegen.
  *
  * Bit-compatibility contract (pinned by NativeHashSpec): each kernel
  * reproduces its HOF twin EXACTLY —
  *  - `xxhash64(h, j)` with a long `h` and int literal `j` folds as
  *    `XXH64.hashInt(j, XXH64.hashLong(h, 42))` (Spark's seed-chain),
  *  - simhash majority/packing uses the same per-bit counts and
  *    MSB-first fold,
  *  - dot products cast each float to double BEFORE multiplying and
  *    accumulate sequentially in index order (IEEE-identical to the
  *    DuckDB oracle's list_sum mirror). */
object HashExprs // scaladoc anchor

/** `minhash_sig(hashes, k)`: the k-seed MinHash signature of a
  * pre-hashed shingle array — `array_min(transform(hashes, h =>
  * xxhash64(h, j)))` for j in [0, k), fused into one pass over the
  * input with a k-wide running-min array. `k` must be a foldable int
  * literal. Empty input yields Long.MaxValue sentinels (callers filter
  * empty shingle sets upstream — see Similarity.nearDupPairs). A null
  * element null-poisons the result, matching the HOF twin. */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private lazy val k: Int = right.eval(null) match {
    case i: java.lang.Integer => i.intValue
    case l: java.lang.Long    => l.intValue
    case other => throw new IllegalArgumentException(
      s"minhash_sig k must be a foldable int literal, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelCheck.arrayOf(LongType, left, "minhash_sig hashes")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else KernelCheck.foldablePosInt(right, "minhash_sig k")
  }

  override def nullSafeEval(h: Any, kk: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h1 = XXH64.hashLong(arr.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashInt(j, h1)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val h1 = ctx.freshName("h1"); val v = ctx.freshName("v")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, java.lang.Long.MAX_VALUE);
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $poisoned = true; break; }
         |  long $h1 = $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $xxh.hashInt($j, $h1);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $gad($mins);
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

/** `simhash_pack(hashes)`: 64-bit SimHash from pre-hashed token longs —
  * per-bit majority vote packed MSB-first (bit 0's vote lands in the
  * MSB), exactly [[graft.ops.Similarity.simhash64]]'s fold. One pass,
  * 64 local counters, no intermediate arrays. Empty input → 0L; a null
  * element null-poisons the result, matching the HOF twin. */
case class SimHashPack(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_pack"

  override def checkInputDataTypes(): TypeCheckResult =
    KernelCheck.arrayOf(LongType, child, "simhash_pack hashes")

  override def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += ((v >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      acc = (acc << 1) | (if (counts(b) * 2 > n) 1L else 0L)
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val v = ctx.freshName("v"); val acc = ctx.freshName("acc")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $poisoned = true; break; }
         |  long $v = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($v >>> $b) & 1L);
         |  }
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    $acc = ($acc << 1) | (($counts[$b] * 2 > $n) ? 1L : 0L);
         |  }
         |  ${ev.value} = $acc;
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashPack = copy(child = newChild)
}

/** `dot_double(a, b)`: sequential-order double dot product of two
  * float vectors — [[graft.ops.Similarity.dotDouble]] without the
  * per-pair product-array allocation. Truncates to the shorter length
  * (inputs here are fixed-width embeddings; the HOF twin null-poisons
  * on length mismatch instead, so equal-length inputs are the
  * contract). A null element in either input null-poisons the result,
  * matching the HOF twin. */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_double"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = KernelCheck.arrayOf(FloatType, left, "dot_double left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else KernelCheck.arrayOf(FloatType, right, "dot_double right")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val poisoned = ctx.freshName("poisoned")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |boolean $poisoned = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $poisoned = true; break; }
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($poisoned) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}
