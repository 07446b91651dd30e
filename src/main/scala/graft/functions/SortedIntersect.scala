package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd intersection of two SORTED-ASCENDING, DISTINCT,
  * non-null long arrays — the adjacency-list close of
  * [[graft.ops.Triangles]]. Equivalent to
  * `array_intersect(a, b)` under that precondition (distinct elements
  * of `a` present in `b`, in `a`'s order — ascending here), but a
  * single merge walk over the primitive values instead of the
  * built-in's per-row `OpenHashSet` build + probe + generic element
  * copy, which the round-16 profile put at the top of
  * q_triangle_count's executor samples.
  *
  * PRECONDITION (caller contract, not checked): both arrays sorted
  * ascending with distinct non-null elements — exactly what
  * `sort_array(collect_list(..))` over a distinct edge list yields.
  * On unsorted input the result is NOT array_intersect's.
  *
  * Null array → null. */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect_longs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = KernelCheck.arrayOf(LongType, left, "sorted_intersect_longs left")
    if (l != org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess) l
    else KernelCheck.arrayOf(LongType, right, "sorted_intersect_longs right")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements(); val yn = y.numElements()
    val buf = new Array[Long](math.min(xn, yn))
    var i = 0; var j = 0; var k = 0
    while (i < xn && j < yn) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { buf(k) = xv; k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn"); val buf = ctx.freshName("buf")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $xn = $a.numElements(); int $yn = $b.numElements();
         |long[] $buf = new long[java.lang.Math.min($xn, $yn)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $xn && $j < $yn) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $buf[$k++] = $xv; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(
         |    java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectLongs =
    copy(left = newLeft, right = newRight)
}
